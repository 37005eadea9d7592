package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Histogram-first exact selection: the scale-safe plan shape for exact
 * rank statistics on LOW-CARDINALITY group keys (round 13; the a24
 * Mann-Whitney trick promoted to a shared primitive).
 *
 * The problem it solves: `rank()/sum() OVER (PARTITION BY grp ORDER BY v)`
 * on a raw corpus sort-shuffles the WHOLE table onto |grp| tasks — with a
 * 3-value key that is three single-task corpus sorts, a straight
 * serialization wall at 100 TB. Likewise Spark's exact `percentile`
 * aggregate buffers every group value in its agg buffer (O(corpus/|grp|)
 * heap per task).
 *
 * The fix that keeps exactness: aggregate to a (group, value) → count
 * histogram FIRST — a hash aggregation on a high-cardinality composite
 * key, fully parallel, with map-side partials — and run the rank window
 * over the HISTOGRAM. Equal values are already merged, so a rows-frame
 * cumulative over distinct values is identical to a range-frame
 * cumulative over the raw rows, and every rank statistic below is a
 * closed form in (value, count, cumulative count). Window input is
 * domain-bounded (distinct values: quantities, money cents, lengths),
 * not corpus-bounded — at 100× the data the histogram stops growing.
 *
 * PERF rule (PERF.md): exact selection never sorts or buffers the corpus
 * keyed on a low-cardinality column.
 */
object HistogramSelect {

  /**
   * (group, value) → count histogram with cumulative annotations.
   * Output columns: groupCol, `_v` (the value, original type), `_c`
   * (rows at this value), `_cum` (rows at ≤ this value), `_prev`
   * (rows at < this value), `_n` (group total). Null values are
   * dropped (the `percentile`/rank-statistic convention).
   */
  def cumHistogram(df: DataFrame, groupCol: String, valCol: Column): DataFrame =
    annotate(
      df.select(col(groupCol), valCol.as("_v"))
        .filter(col("_v").isNotNull)
        .groupBy(col(groupCol), col("_v"))
        .agg(count(lit(1)).as("_c")),
      groupCol)

  /** Adds `_cum`/`_n`/`_prev` to an existing (groupCol, _v, _c) histogram
    * (one distinct value per row). Both windows share one exchange on the
    * group key; the sorted input is histogram-sized, not corpus-sized. */
  def annotate(hist0: DataFrame, groupCol: String): DataFrame = {
    val g = col(groupCol)
    val byVal = Window.partitionBy(g).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist0
      .withColumn("_cum", sum("_c").over(byVal))
      .withColumn("_n", sum("_c").over(Window.partitionBy(g)))
      .withColumn("_prev", col("_cum") - col("_c"))
  }

  /**
   * Exact interpolated percentiles per group, bit-identical to Spark's
   * `percentile(col, p)` aggregate but computed over the cumulative
   * histogram instead of buffering every value: position h = p·(n−1) in
   * double (the exact arithmetic Percentile.getPercentile uses), the
   * values at 1-based ranks ⌊h⌋+1 and min(⌊h⌋+2, n) picked by a
   * conditional aggregate over the histogram's (prev, cum] rank spans,
   * then v_lo + (h−⌊h⌋)·(v_hi−v_lo).
   *
   * Output: (groupCol, <name>…) one column per requested percentile,
   * double. Groups whose values are all null disappear (the histogram
   * drops them) — callers needing those groups must outer-join them back.
   */
  def percentilesByGroup(df: DataFrame, groupCol: String, valCol: Column,
                         ps: Seq[(String, Double)]): DataFrame = {
    val hist = cumHistogram(df, groupCol, valCol)
    percentilesFromHistogram(hist, groupCol, ps)
  }

  /** The selection half of [[percentilesByGroup]], reusable when the
    * caller already built (or derived) the annotated histogram. `extra`
    * aggregates (e.g. `first`/`max` of group-constant carry-through
    * columns) ride the SAME hash-agg and appear after the percentile
    * columns — so multi-stage selections (MAD) never join back to an
    * earlier branch and the histogram is consumed exactly once per stage. */
  def percentilesFromHistogram(hist: DataFrame, groupCol: String,
                               ps: Seq[(String, Double)],
                               extra: Seq[(String, Column)] = Nil): DataFrame = {
    val aggs = ps.flatMap { case (name, p) =>
      val h = lit(p) * (col("_n") - 1).cast("double")
      val loRank = floor(h).cast("long") + 1
      val hiRank = least(loRank + 1, col("_n"))
      Seq(
        max(when(col("_prev") < loRank && loRank <= col("_cum"), col("_v")))
          .as(s"_lo_$name"),
        max(when(col("_prev") < hiRank && hiRank <= col("_cum"), col("_v")))
          .as(s"_hi_$name"),
        // h and ⌊h⌋ are group constants; carry the fraction through the agg
        max(h - floor(h)).as(s"_f_$name"))
    }
    // Spark's Percentile interpolates two-sided: (higher−pos)·lo +
    // (pos−lower)·hi — NOT lo + f·(hi−lo), which differs by an ULP
    // (caught by RangeSelectSpec; the same arithmetic is used here so
    // "bit-identical to percentile()" holds literally)
    val sel = ps.map { case (name, _) =>
      ((lit(1.0) - col(s"_f_$name")) * col(s"_lo_$name").cast("double") +
        col(s"_f_$name") * col(s"_hi_$name").cast("double")).as(name)
    }
    val allAggs = aggs ++ extra.map { case (name, c) => c.as(name) }
    val extraNames = extra.map { case (name, _) => col(name) }
    hist.groupBy(col(groupCol))
      .agg(allAggs.head, allAggs.tail: _*)
      .select((col(groupCol) +: sel) ++ extraNames: _*)
  }

  /** Per-group non-null value count from the same scan shape (used by
    * callers that report n next to the selected statistic). */
  def countsByGroup(df: DataFrame, groupCol: String, valCol: Column): DataFrame =
    df.select(col(groupCol), valCol.as("_v")).filter(col("_v").isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).cast("long").as("n"))
}
