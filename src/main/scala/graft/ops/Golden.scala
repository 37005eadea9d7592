package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Golden-output regression harness (SURVEY §5.2): the reference's four
 * cross-table comparison modes (BQ_Table_Building/CDA/tests/
 * shared_test_functions.py) packaged as one report over an actual
 * DataFrame vs a stored expected parquet:
 *
 *  1. row counts (:78-116)
 *  2. key coverage via anti-joins (:33-75)
 *  3. full-row symmetric diff / per-column EXCEPT (:119-192)
 *  4. order-insensitive ';'-concat comparison (:195-335)
 */
object Golden {

  final case class Check(mode: String, passed: Boolean, detail: String)

  def compare(actual: DataFrame, expected: DataFrame, keys: Seq[String],
              concatCols: Seq[String] = Nil): Seq[Check] = {
    val checks = scala.collection.mutable.ArrayBuffer.empty[Check]

    val (na, ne) = (actual.count(), expected.count())
    checks += Check("row_count", na == ne, s"actual=$na expected=$ne")

    val missing = Diff.removedRows(expected, actual, keys).count()
    val extra = Diff.addedRows(expected, actual, keys).count()
    checks += Check("key_coverage", missing == 0 && extra == 0,
      s"missing_keys=$missing extra_keys=$extra")

    // concat columns compare as SETS; exact compare runs on the rest
    val exactA = concatCols.foldLeft(actual)((d, c) => d.drop(c))
    val exactE = concatCols.foldLeft(expected)((d, c) => d.drop(c))
    val diffRows = Diff.symmetricDiff(exactA, exactE).count()
    checks += Check("row_diff", diffRows == 0, s"symmetric_diff_rows=$diffRows")

    concatCols.foreach { c =>
      val bad = Diff.concatColumnDiff(expected, actual, keys, c).count()
      checks += Check(s"concat_set:$c", bad == 0, s"rows_with_set_diff=$bad")
    }
    checks.toSeq
  }

  /** Compare against a stored golden parquet; writes it first when absent
    * (bless-on-first-run, the standard golden-file workflow). */
  def compareToGolden(spark: SparkSession, actual: DataFrame, goldenPath: String,
                      keys: Seq[String], concatCols: Seq[String] = Nil): Seq[Check] = {
    if (!new java.io.File(goldenPath).exists()) {
      actual.write.mode("errorifexists").parquet(goldenPath)
      return Seq(Check("blessed", passed = true, s"golden written at $goldenPath"))
    }
    compare(actual, spark.read.parquet(goldenPath), keys, concatCols)
  }

  def assertAllPassed(checks: Seq[Check]): Unit = {
    val failed = checks.filterNot(_.passed)
    require(failed.isEmpty,
      "golden comparison failed:\n" + failed.map(c => s"  ${c.mode}: ${c.detail}").mkString("\n"))
  }
}
