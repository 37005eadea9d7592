package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Range-partitioned EXACT selection — the unbounded-domain complement to
 * [[HistogramSelect]] (round 13): when the value domain grows with the
 * corpus (raw measurement doubles, arbitrary-precision amounts), a
 * (group, value) histogram is corpus-sized and buys nothing. This is the
 * classical distributed-selection plan instead:
 *
 *  1. ONE scan computes per-group row counts and ~nRanges APPROXIMATE
 *     range boundaries (`approx_percentile` — the sketch only ROUTES
 *     rows; its error moves work between ranges, never the answer);
 *  2. rows route to their range by boundary count (monotone in value);
 *     one parallel hash-agg counts each (group, range); a cumulative
 *     window over ≤ nRanges rows per group locates the ranges holding
 *     the target ranks ⌊h⌋+1 / ⌊h⌋+2 (h = p·(n−1), the exact
 *     `percentile` arithmetic);
 *  3. only THOSE ranges' rows — O(n/nRanges) per group, never the
 *     corpus — join back (broadcast range list) and take an in-range
 *     row_number; global rank = range prefix + local rank, and the
 *     interpolated selection is bit-identical to Spark's `percentile`.
 *
 * No task ever sorts or buffers more than max(nRanges, n/nRanges + cap)
 * rows per group; every stage is a parallel hash-agg or a bounded
 * window. Ties: equal values may get arbitrary local ranks, but the
 * VALUE at any rank inside a tie run is the same, so the selection is
 * deterministic.
 *
 * Output: (groupCol, <name>…) one double column per requested
 * percentile. All-null groups disappear (the `percentile` convention).
 */
object RangeSelect {

  def exactPercentilesByGroup(df: DataFrame, groupCol: String, valCol: Column,
                              ps: Seq[(String, Double)],
                              nRanges: Int = 32): DataFrame = {
    require(nRanges >= 2, s"nRanges must be >= 2, got $nRanges")
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      "percentiles must be in [0, 1]")
    val g = col(groupCol)
    val base = df.select(g, valCol.as("_v")).filter(col("_v").isNotNull)

    val probs = (1 until nRanges).map(i => i.toDouble / nRanges)
    // The sketch only ROUTES, so it runs on a ~1% value-hash sample: a
    // boundary off by a fraction of a percent of rank merely moves rows
    // between adjacent ranges — the exact selection below is unaffected,
    // and the full-corpus sketch insert was the dominant cost (measured
    // 2×90 task-seconds at sf1 before sampling). The COUNT stays exact
    // over all rows. A group too small to sample gets null bounds → every
    // row routes to range 0 → the selection runs over the whole (tiny)
    // group: the correct degenerate case.
    val sampled = when(pmod(xxhash64(col("_v")), lit(100)) === 0, col("_v"))
    val stats = base.withColumn("_sv", sampled).groupBy(g).agg(
      expr(s"approx_percentile(_sv, array(${probs.mkString(",")}), " +
        s"${math.max(4 * nRanges, 100)})").as("_bounds"),
      count(lit(1)).cast("long").as("_n"))

    // range index = number of boundaries strictly below the value —
    // monotone nondecreasing in _v, so range-major order IS value order.
    // Spelled as a codegen'd comparison chain: the equivalent
    // `aggregate(_bounds, …)` higher-order function is INTERPRETED
    // (per-row lambda allocation — measured 750 task-seconds at sf1)
    val idx = (0 until nRanges - 1)
      .map(i => when(col("_v") > col("_bounds")(i), 1).otherwise(0))
      .reduce(_ + _)
    val routed = base.join(broadcast(stats), Seq(groupCol))
      .withColumn("_idx", idx)

    val cumW = Window.partitionBy(g).orderBy(col("_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rc = routed.groupBy(g, col("_idx"))
      .agg(count(lit(1)).as("_c"), first("_n").as("_n"))
      .withColumn("_cum", sum("_c").over(cumW))
      .withColumn("_prev", col("_cum") - col("_c"))

    def rlo(p: Double): Column =
      floor(lit(p) * (col("_n") - 1).cast("double")).cast("long") + 1
    def rhi(p: Double): Column = least(rlo(p) + 1, col("_n"))

    // ranges whose rank span (prev, cum] contains any target rank
    val wanted = ps.map { case (_, p) =>
      (col("_prev") < rlo(p) && rlo(p) <= col("_cum")) ||
        (col("_prev") < rhi(p) && rhi(p) <= col("_cum"))
    }.reduce(_ || _)
    val kept = rc.filter(wanted).select(g, col("_idx"), col("_prev"))

    val localW = Window.partitionBy(g, col("_idx")).orderBy(col("_v"))
    val cand = routed.join(broadcast(kept), Seq(groupCol, "_idx"))
      .withColumn("_rank", row_number().over(localW) + col("_prev"))

    val aggs = ps.flatMap { case (name, p) =>
      val h = lit(p) * (col("_n") - 1).cast("double")
      Seq(
        max(when(col("_rank") === rlo(p), col("_v"))).as(s"_lo_$name"),
        max(when(col("_rank") === rhi(p), col("_v"))).as(s"_hi_$name"),
        max(h - floor(h)).as(s"_f_$name"))
    }
    // Spark's Percentile interpolates two-sided: (higher−pos)·lo +
    // (pos−lower)·hi — NOT lo + f·(hi−lo), which differs by an ULP
    // (caught by RangeSelectSpec: 2.8 vs 2.8000000000000003)
    val sel = ps.map { case (name, _) =>
      ((lit(1.0) - col(s"_f_$name")) * col(s"_lo_$name").cast("double") +
        col(s"_f_$name") * col(s"_hi_$name").cast("double")).as(name)
    }
    cand.groupBy(g)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: sel: _*)
  }
}
