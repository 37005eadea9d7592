package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-level INCREMENTAL ingestion (round 13) — the idempotent re-run
 * primitive a lake pipeline needs: a directory written over months by
 * appending jobs, a LEDGER of already-processed files, and each run
 * reads only the delta. The reference's builds re-run whole tables;
 * at 100 TB the delta read is the difference between a nightly job and
 * a nightly catastrophe.
 *
 * Scale shape: the directory listing is a driver METADATA operation
 * (bounded by file count, the same op every Spark scan performs to
 * plan splits); ledger membership is a DISTRIBUTED anti-join (the
 * ledger can be millions of rows — never a driver Set); only the NEW
 * paths — bounded by the increment, not the table — collect to the
 * driver to parameterize the parquet scan. Exactly-once is the
 * caller's ledger-append contract: read delta → process → append the
 * returned paths to the ledger in one transaction.
 */
object Incremental {

  /** Data files directly under `dir` (driver metadata listing). */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
  }

  /**
   * Rows of every file under `dir` NOT present in `ledger` (a one-column
   * DataFrame of processed path strings), plus the new paths themselves
   * (for the caller's ledger append). Empty delta → an empty DataFrame
   * with the directory's schema; a directory that is missing or holds
   * zero parquet files (the first run before any producer wrote) →
   * an empty zero-column DataFrame, never a schema-inference crash.
   */
  def readNewFiles(spark: SparkSession, dir: String,
                   ledger: DataFrame): (DataFrame, Seq[String]) = {
    import spark.implicits._
    val all = dataFiles(spark, dir)
    if (all.isEmpty) return (spark.emptyDataFrame, Seq.empty)
    val newPaths = all.toDF("path")
      .join(ledger.select(col(ledger.columns.head).as("path")),
        Seq("path"), "left_anti")
      .as[String].collect().toSeq.sorted
    val df =
      if (newPaths.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(newPaths: _*)
    (df, newPaths)
  }
}
