package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Dev-only A/B prober for the round-15 re-adjudication of the l43/l82
 * `tdw` (scan-widen) decisions — the round-14 verdict flagged both as
 * suspect MID1 "winners" that regressed in the driver's run AND the
 * builder's close bench. Full-bench A/Bs proved ±10–20% ambient-noise
 * prone across separate JVM windows, so this times BOTH variants of each
 * query INTERLEAVED in ONE session (pass 1 of every variant, then pass 2,
 * …) with the exact Bench session config and noop-sink timing, and
 * reports per-variant medians. Usage:
 *
 *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AbWiden /root/testdata/sf0.1 [reps]"
 */
object AbWiden {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT_BYTES", "8m"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "1m"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.queries.Registry.{td, tdw}
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "l43_td"  -> (() => graft.llm.LangModel.bigramSurprisal(
        td(spark, sfDir, "documents"), "doc_id", "text")),
      "l43_tdw" -> (() => graft.llm.LangModel.bigramSurprisal(
        tdw(spark, sfDir, "documents"), "doc_id", "text")),
      "l82_td"  -> (() => graft.llm.LangModel.perplexityBuckets(
        td(spark, sfDir, "documents"), "doc_id", "text", "lang")),
      "l82_tdw" -> (() => graft.llm.LangModel.perplexityBuckets(
        tdw(spark, sfDir, "documents"), "doc_id", "text", "lang")))

    // warmup: one untimed pass of each variant (JIT/codegen priming)
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save()
    }
    val times = scala.collection.mutable.LinkedHashMap(
      variants.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    for (_ <- 1 to reps; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      times(n) :+= (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val js = times.map { case (n, v) =>
      "\"" + n + "\":{\"median\":" + f"${median(v)}%.3f" +
        ",\"reps\":" + v.map(x => f"$x%.3f").mkString("[", ",", "]") + "}"
    }.mkString("{", ",", "}")
    println(s"""{"tool":"AbWiden","sf":"$sfDir","cpus":$cpus,"reps":$reps,"variants":$js}""")
    spark.stop()
  }
}
