package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/**
 * Concurrency-posture gate: run the FULL registry with N worker threads
 * sharing ONE SparkSession — the shape a real warehouse runs (many
 * sessions, one cluster), which the single-query Verify gate cannot see.
 * What it catches: session-conf mutation leaking across queries (the
 * hazard class nearDupClusters documents at Dedup.scala:453-459), temp-view
 * / catalog-name collisions, scratch-path collisions, non-thread-safe
 * driver state in operators, and scheduler starvation.
 *
 * Spark's contract here is public and explicit: a SparkSession is
 * thread-safe, and concurrent jobs from multiple threads are the
 * documented way to multiplex a cluster (job scheduling guide). FAIR
 * scheduler mode additionally round-robins tasks across the per-thread
 * pools so one heavy query can't convoy the rest.
 *
 * Usage: ConcurrentVerify <sfDir> <outDir> [threads=6] [fifo|fair]
 * Dumps the same outDir shape as graft.Verify (per-query parquet +
 * oracle_sql.json), so tools/local_check.py --json produces
 * CORRECTNESS_CONCURRENT.json through the identical DuckDB compare.
 * Prints one JSON summary line: per-query seconds + errors map.
 */
object ConcurrentVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val threads = if (args.length > 2) args(2).toInt else 6
    val fair = args.length > 3 && args(3).equalsIgnoreCase("fair")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT_BYTES", "8m"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val spark = (if (fair) builder.config("spark.scheduler.mode", "FAIR")
                 else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    // Deterministic heavy/light interleave: sort by name hash so adjacent
    // pickups mix families instead of draining one file's queries together.
    val work = graft.SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .sortBy { case (name, _) =>
        java.util.Objects.hashCode(name.reverse) }
    val queue = new ConcurrentLinkedQueue[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    work.foreach(queue.add)

    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val times = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val done = new AtomicInteger(0)
    val latch = new CountDownLatch(threads)
    val workers = (0 until threads).map { i =>
      val t = new Thread(() => {
        // each worker is its own scheduler pool under FAIR — queries in
        // flight share the cluster instead of FIFO-convoying
        if (fair) spark.sparkContext.setLocalProperty(
          "spark.scheduler.pool", s"graft-pool-$i")
        try {
          var next = queue.poll()
          while (next != null) {
            val (name, fn) = next
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$outDir/$name")
              times.put(name, (System.nanoTime() - t0) / 1e9)
            } catch { case e: Throwable =>
              errors.put(name, Option(e.getMessage).getOrElse(e.getClass.getName))
              System.err.println(s"[concurrent-verify] $name failed: ${e.getMessage}")
            }
            val n = done.incrementAndGet()
            if (n % 25 == 0) System.err.println(
              s"[concurrent-verify] $n/${work.size} done (worker $i)")
            next = queue.poll()
          }
        } finally latch.countDown()
      }, s"graft-verify-worker-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    latch.await()

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracleJson = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)

    val timesJson = times.entrySet().toArray.map(_.asInstanceOf[java.util.Map.Entry[String, Double]])
      .sortBy(_.getKey)
      .map(e => s"${q(e.getKey)}: ${f"${e.getValue}%.3f"}").mkString("{", ",", "}")
    val errJson = errors.entrySet().toArray.map(_.asInstanceOf[java.util.Map.Entry[String, String]])
      .sortBy(_.getKey)
      .map(e => s"${q(e.getKey)}: ${q(e.getValue)}").mkString("{", ",", "}")
    println(s"""{"mode":"${if (fair) "fair" else "fifo"}","threads":$threads,""" +
      s""""queries":${work.size},"failed":${errors.size()},""" +
      s""""times":$timesJson,"errors":$errJson}""")
    spark.stop()
    if (!errors.isEmpty) sys.exit(1)
  }
}
