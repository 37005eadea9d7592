package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * The two-level parallel cumulative (HistogramSelect.parCumSum, round 15)
 * must reproduce the single-window
 * `sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING..CURRENT)`
 * exactly — same longs on every row — on every shape that stresses the
 * bucketing: value skew (one bucket holds most distinct values), negative
 * values, single-distinct-value groups, null groups, null values, and
 * domains far wider than the bucket count.
 */
class ParCumSumSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Reference: the old single-task-per-group window form. */
  private def reference(hist: DataFrame): DataFrame = {
    val byVal = Window.partitionBy(col("g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("_cum_c", sum("_c").over(byVal))
      .withColumn("_tot_c", sum("_c").over(Window.partitionBy(col("g"))))
  }

  private def check(rows: Seq[(String, java.lang.Long, Long)]): Unit = {
    // one row per (g, _v): the histogram contract
    val hist = rows.toDF("g", "_v", "_c")
    val key = (r: org.apache.spark.sql.Row) =>
      (Option(r.get(0)).map(_.toString).orNull, Option(r.get(1)).map(_.toString).orNull)
    val got = HistogramSelect.parCumSum(hist, "g", "_v", Seq("_c"))
      .select("g", "_v", "_cum_c", "_tot_c")
      .collect().map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    val want = reference(hist)
      .select("g", "_v", "_cum_c", "_tot_c")
      .collect().map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === want.keySet)
    for (k <- want.keySet) assert(got(k) === want(k), s"row $k")
  }

  test("wide domain, many groups, counts > 1") {
    val rows = for (g <- Seq("a", "b", "c"); v <- 1 to 500)
      yield (g, java.lang.Long.valueOf(v.toLong * 977 % 100003), (v % 7 + 1).toLong)
    check(rows.distinct)
  }

  test("value skew: 90% of distinct values inside 1% of the range") {
    val rows = (1 to 900).map(v => ("s", java.lang.Long.valueOf(v.toLong), 2L)) ++
      (1 to 100).map(v => ("s", java.lang.Long.valueOf(v.toLong * 1000000), 3L))
    check(rows)
  }

  test("negative values and a negative-to-positive span") {
    val rows = (-200 to 200).map(v => ("n", java.lang.Long.valueOf(v.toLong), 1L))
    check(rows)
  }

  test("degenerate groups: single value, two values, empty-range guard") {
    check(Seq(
      ("one", java.lang.Long.valueOf(42L), 7L),
      ("two", java.lang.Long.valueOf(1L), 1L),
      ("two", java.lang.Long.valueOf(2L), 2L)))
  }

  test("null group and null value keep window semantics") {
    val rows = Seq(
      (null, java.lang.Long.valueOf(1L), 1L),
      (null, java.lang.Long.valueOf(5L), 2L),
      ("g", null, 4L),
      ("g", java.lang.Long.valueOf(3L), 1L),
      ("g", java.lang.Long.valueOf(9L), 5L))
    check(rows)
  }

  test("multi-column sums match per column") {
    val hist = (1 to 300).map(v => ("m", v.toLong * 31 % 9973, v.toLong, v.toLong * 2 + 1))
      .distinct.toDF("g", "_v", "_wv", "_c")
    val byVal = Window.partitionBy(col("g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = hist
      .withColumn("cw", sum("_wv").over(byVal))
      .withColumn("cc", sum("_c").over(byVal))
      .collect().map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5))).toMap
    val got = HistogramSelect.parCumSum(hist, "g", "_v", Seq("_wv", "_c"))
      .collect().map(r => r.getLong(1) -> (r.getAs[Long]("_cum_wv"), r.getAs[Long]("_cum_c"))).toMap
    assert(got === want)
  }
}
