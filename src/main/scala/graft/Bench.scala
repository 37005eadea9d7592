package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
 * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",
 * "queries":{...},"sf":...}. Failed queries are reported under "errors"
 * and excluded from "queries"/"value" so a broken query can never be
 * mistaken for a fast one.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def jsonEscape(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    // dev-only filter: SPARK_GRAFT_ONLY=<prefix> limits the run; the driver
    // doesn't set it, so round benches always run the full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(n.startsWith))
    val timed  = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        // noop sink evaluates the full physical plan (count() would let
        // Catalyst prune every projection and undercount the work).
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timed += name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
    }

    val qs = timed.map { case (k, v) => "\"" + jsonEscape(k) + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + jsonEscape(k) + "\":\"" + jsonEscape(v) + "\"" }
      .mkString("{", ",", "}")
    val total = if (timed.nonEmpty) timed.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"${jsonEscape(sfDir)}"}""")
    spark.stop()
  }
}
