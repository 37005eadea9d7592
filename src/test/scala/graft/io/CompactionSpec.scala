package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction: contiguous bin semantics on a hand table, and a physical
  * many-small-files → few-big-files rewrite with row fidelity. */
class CompactionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("planBins cuts contiguous bins at the preceding-cumsum boundary") {
    val files = Seq(("a", 40L), ("b", 40L), ("c", 40L), ("d", 10L),
      ("e", 100L), ("f", 5L)).toDF("file", "bytes")
    val plan = Compaction.planBins(files, Seq("file"), "bytes", 100L)
      .orderBy("file").as[(String, Long, Long)].collect()
    // cum_before: a=0 b=40 c=80 d=120 e=130 f=230
    assert(plan.map(r => r._1 -> r._3).toSeq ===
      Seq("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 1L, "e" -> 1L, "f" -> 2L))
    // order preservation: bins are monotone in file order
    assert(plan.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("a row larger than the target gets a bin without stalling the cut") {
    val files = Seq(("a", 500L), ("b", 10L)).toDF("file", "bytes")
    val plan = Compaction.planBins(files, Seq("file"), "bytes", 100L)
      .orderBy("file").as[(String, Long, Long)].collect()
    assert(plan.map(_._3).toSeq === Seq(0L, 5L))
  }

  test("compactDir rewrites many small files into one file per bin, rows intact") {
    val dir = "/root/repo/target/compaction_spec/small"
    val out = "/root/repo/target/compaction_spec/compacted"
    val df = spark.range(0, 20000).select(col("id"),
      concat(lit("row-payload-"), col("id")).as("payload"))
    df.repartition(40).write.mode("overwrite").parquet(dir)
    val before = Compaction.listDataFiles(spark, dir)
    assert(before.count() === 40L)
    val totalBytes = before.agg(sum("bytes")).collect()(0).getLong(0)

    val plan = Compaction.compactDir(spark, dir, targetBytes = totalBytes / 4,
      outDir = out)
    val nBins = plan.agg(max("bin_id")).collect()(0).getLong(0) + 1
    assert(nBins >= 3 && nBins <= 6, s"expected ~4-5 bins, got $nBins")

    // one data file per bin directory
    import org.apache.hadoop.fs.Path
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L until nBins).foreach { b =>
      val files = fs.listStatus(new Path(s"$out/bin_id=$b"))
        .filter(s => s.getPath.getName.endsWith(".parquet"))
      assert(files.length === 1, s"bin $b has ${files.length} files")
    }
    // row fidelity: same ids, same payloads
    val back = spark.read.parquet(out)
    assert(back.count() === 20000L)
    assert(back.select("id", "payload").exceptAll(df).count() === 0L)
    assert(df.exceptAll(back.select("id", "payload")).count() === 0L)
  }
}
