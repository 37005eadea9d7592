package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER (dev-only; the driver never sets it) lets the
    // round's cluster smoke run this same main under
    // local-cluster[w,c,mem] — real executor JVMs, real serialization of
    // the native expressions and TVF plans. That mode needs the library
    // on the executors' classpath: pass the packaged jar via
    // SPARK_GRAFT_JARS (comma-separated, fed to spark.jars).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val builder = sys.env.get("SPARK_GRAFT_JARS") match {
      case Some(jars) => builder0.config("spark.jars", jars)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g"))
      case None => builder0
    }
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT_BYTES", "8m"))
      // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
      // rejects by default; read as long (ns since epoch) instead.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only filter: SPARK_GRAFT_ONLY=<prefix> limits the dump; the driver
    // doesn't set it, so round verifies always dump the full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // twin manifest (round 10): each no-oracle row → its oracled portable
    // twin, so the driver's correctness artifact self-documents that every
    // `no_oracle` row is adjudicated by a green exact twin (previously
    // COVERAGE.md prose). Written BOTH next to the dump and to the tracked
    // bench/TWINS.json (content is registry-derived and deterministic, so
    // driver re-runs never dirty git).
    val twinsJson = graft.queries.Registry.twins.toSeq.sorted
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/twins.json"), twinsJson)
    try Files.writeString(Paths.get("bench/TWINS.json"), twinsJson)
    catch { case e: Throwable =>
      System.err.println(s"[verify] could not write bench/TWINS.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
