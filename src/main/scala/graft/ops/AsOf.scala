package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (nearest-prior) join — a whole-operator semantic Spark lacks,
 * composed scale-safe from existing ops (SURVEY's preference order (a)):
 * for every left row, attach the right row with the greatest right-time ≤
 * left-time within the same key.
 *
 * Technique: union both sides into one stream tagged by origin, sort each
 * key's partition by (time, origin) with right rows first at equal times,
 * and carry the last non-null right payload forward with
 * `last(..., ignoreNulls).over(unbounded-preceding window)`. ONE shuffle on
 * the key — never a per-key loop, never a range cross-product. Right rows
 * must be unique per (key, time) for deterministic results (dedupe first).
 */
object AsOf {

  /**
   * @param left/right   inputs
   * @param leftKey/rightKey   equi-key columns
   * @param leftTime/rightTime numeric/orderable event-time columns
   * @param rightPayload right columns to attach (null when no prior row)
   */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTime: Column, rightTime: Column,
                   rightPayload: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)

    val l = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__src"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(right.select(payload).schema.fields(0).dataType).as("__rrow"))
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__src"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.fields(0).dataType).as("__lrow"),
      payload.as("__rrow"))

    // right rows sort BEFORE left rows at equal time → "<=" semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(c => col(s"__lrow.$c").as(c)) :+ col("__asof"): _*)
  }

  /**
   * FORWARD as-of join: each left row picks the EARLIEST right row with
   * right-time ≥ left-time per key — the "next scheduled event /
   * next price tick" direction. Implemented by TIME NEGATION over
   * [[asofBackward]] (order-reversal maps ≥-earliest onto ≤-latest
   * exactly, ties included), so the plan — one tagged union, one key
   * shuffle, one running carry — is the proven backward one; the only
   * new requirement is that the time columns are NUMERIC (negatable).
   *
   * Output: left columns + `__asof` (payload struct, null when no
   * following row exists).
   */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTime: Column, rightTime: Column,
                  rightPayload: Seq[(String, Column)]): DataFrame =
    asofBackward(left, right, leftKey, rightKey,
      lit(0) - leftTime, lit(0) - rightTime, rightPayload)

  /**
   * Nearest-event join — the BIDIRECTIONAL as-of (sensor alignment /
   * log-correlation shape): for every left row, attach the right row with
   * the smallest |right-time − left-time| within the same key, either
   * direction, ties broken toward the prior (≤) side. Same scale
   * technique as [[asofBackward]]: one tagged union, one shuffle on the
   * key, a backward `last(ignoreNulls)` carry and a forward
   * `first(ignoreNulls)` carry over the SAME sorted partition — never a
   * per-key loop or range cross-product. Right rows must be unique per
   * (key, time) for deterministic results (dedupe first).
   *
   * Output: left columns + `__near` (the chosen payload struct, null when
   * the key has no right rows at all) + `__dt` = right-time − left-time
   * (signed: ≤ 0 backward, > 0 forward, null when `__near` is null).
   */
  def nearestJoin(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTime: Column, rightTime: Column,
                  rightPayload: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((rightPayload :+ ("__rt" -> rightTime)).map { case (n, c) => c.as(n) }: _*)
    val payloadType = right.select(payload).schema.fields(0).dataType
    val lrowType = left.select(struct(leftCols.map(col): _*)).schema.fields(0).dataType

    val l = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__src"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(payloadType).as("__rrow"))
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__src"),
      lit(null).cast(lrowType).as("__lrow"),
      payload.as("__rrow"))

    // right rows sort BEFORE left at equal time: the backward frame
    // includes the Δt=0 row, the forward frame starts strictly after it
    val ord = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__src"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val dtB = col("__t") - col("__b.__rt")
    val dtF = col("__f.__rt") - col("__t")
    val chooseBack = col("__f").isNull || (col("__b").isNotNull && dtB <= dtF)
    val near = when(chooseBack, col("__b")).otherwise(col("__f"))

    l.unionByName(r)
      .withColumn("__b", last(col("__rrow"), ignoreNulls = true).over(back))
      .withColumn("__f", first(col("__rrow"), ignoreNulls = true).over(fwd))
      .filter(col("__src") === 1)
      .withColumn("__chosen", near)
      .select(leftCols.map(c => col(s"__lrow.$c").as(c)) ++ Seq(
        col("__chosen").dropFields("__rt").as("__near"),
        (col("__chosen.__rt") - col("__t")).as("__dt")): _*)
  }

  /**
   * Binned range join — the scale path for point-in-interval joins, which
   * planners otherwise nested-loop: intervals explode to the time bins they
   * cover, points map to their single bin, both sides hash-join on the bin,
   * and the exact containment predicate filters within bins. Shuffle on the
   * bin key only; bin width trades replication (wide intervals) against
   * bucket fan-in.
   *
   * @param points     rows with a point column
   * @param intervals  rows with [start, end] columns (inclusive)
   */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      pointCol: Column, startCol: Column, endCol: Column,
                      binSize: Long): DataFrame = {
    require(binSize > 0)
    val p = points.withColumn("__bin", floor(pointCol / binSize).cast("long"))
    val i = intervals
      .withColumn("__s", startCol).withColumn("__e", endCol)
      .withColumn("__bin", explode(sequence(
        floor(col("__s") / binSize).cast("long"),
        floor(col("__e") / binSize).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(pointCol >= col("__s") && pointCol <= col("__e"))
      .drop("__bin", "__s", "__e")
  }

  /**
   * Reciprocal-overlap INTERVAL-interval join — the genomic intersection
   * shape (bedtools `intersect -f F -r`, public; the reference's variant/
   * annotation builds join MAF coordinates against feature intervals this
   * way): keep pairs on the same key whose overlap covers at least
   * `minOverlapBp` basis points of BOTH intervals. Intervals are
   * half-open `[start, end)` on NON-NEGATIVE integer coordinates.
   *
   * Scale shape: both sides explode to the fixed-width bins they touch
   * and hash-join on (key, bin) — candidate work is proportional to
   * genuinely co-binned intervals, never |A|×|B|. A pair spanning
   * several shared bins would surface once per bin; it is kept only in
   * the FIRST bin both occupy (`bin == max(sa, sb) div binSize` — the
   * standard dedup device for binned interval joins), so no distinct
   * shuffle is ever needed. The reciprocal test is pure long
   * arithmetic: `ov·10⁴ ≥ minOverlapBp · len` on each side.
   *
   * Column contract: `a` and `b` must not share column names; the output
   * is every a-column, every b-column, and `overlap_len`.
   */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          keyA: Column, keyB: Column,
                          startA: Column, endA: Column,
                          startB: Column, endB: Column,
                          binSize: Long, minOverlapBp: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(minOverlapBp >= 0 && minOverlapBp <= 10000,
      s"minOverlapBp must be in [0, 10000], got $minOverlapBp")
    val aa = a
      .withColumn("__k", keyA.cast("long"))
      .withColumn("__sa", startA.cast("long"))
      .withColumn("__ea", endA.cast("long"))
      .withColumn("__bin", explode(sequence(
        expr("__sa div " + binSize),
        expr("(__ea - 1) div " + binSize))))
    val bb = b
      .withColumn("__k", keyB.cast("long"))
      .withColumn("__sb", startB.cast("long"))
      .withColumn("__eb", endB.cast("long"))
      .withColumn("__bin", explode(sequence(
        expr("__sb div " + binSize),
        expr("(__eb - 1) div " + binSize))))
    val ov = least(col("__ea"), col("__eb")) - greatest(col("__sa"), col("__sb"))
    aa.join(bb, Seq("__k", "__bin"))
      .filter(col("__bin") ===
        greatest(expr("__sa div " + binSize), expr("__sb div " + binSize)))
      .withColumn("overlap_len", ov)
      .filter(col("overlap_len") > 0 &&
        col("overlap_len") * 10000 >= lit(minOverlapBp) * (col("__ea") - col("__sa")) &&
        col("overlap_len") * 10000 >= lit(minOverlapBp) * (col("__eb") - col("__sb")))
      .drop("__k", "__bin", "__sa", "__ea", "__sb", "__eb")
  }

  /**
   * Interval COVERAGE histogram — the `bedtools genomecov` shape (public;
   * the reference's variant builds summarize caller coverage the same
   * way): given half-open `[start, end)` integer intervals per key, the
   * total covered length at EACH stacking depth. Sweep-line as a plan:
   * intervals explode to (+1 at start, −1 at end) boundary events,
   * same-position deltas merge in a hash-agg (so abutting intervals never
   * materialize a zero-length segment), one per-key position-ordered
   * running sum yields the depth of the segment starting at each
   * boundary, and `lead` closes the segment. Cost is O(interval
   * endpoints), never O(covered bases) — per-base explode at genome scale
   * is the classic blowup this shape exists to avoid. One window shuffle
   * on the key.
   *
   * Output: (key, depth, covered_len) for every depth ≥ 1.
   */
  def intervalCoverage(df: DataFrame, keyCol: Column,
                       startCol: Column, endCol: Column): DataFrame = {
    val ev = df.select(keyCol.cast("long").as("k"),
        explode(array(
          struct(startCol.cast("long").as("pos"), lit(1L).as("d")),
          struct(endCol.cast("long").as("pos"), lit(-1L).as("d")))).as("e"))
      .select(col("k"), col("e.pos").as("pos"), col("e.d").as("d"))
    val pts = ev.groupBy(col("k"), col("pos")).agg(sum(col("d")).as("dd"))
    val w = Window.partitionBy(col("k")).orderBy(col("pos"))
    pts
      .withColumn("depth", sum(col("dd")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next", lead(col("pos"), 1).over(w))
      .filter(col("next").isNotNull && col("depth") > 0)
      .groupBy(col("k"), col("depth"))
      .agg(sum(col("next") - col("pos")).cast("long").as("covered_len"))
      .select(col("k"), col("depth").cast("long").as("depth"), col("covered_len"))
  }

  /**
   * Merge overlapping/touching intervals per key into maximal islands —
   * the gaps-and-islands coalesce (SQL-idiom classic; the warehouse form
   * of bedtools merge). An interval starts a NEW island iff its start is
   * strictly greater than the running max end of all earlier-starting
   * intervals (touching intervals [1,5],[5,9] merge — half-open
   * adjacency); island id = running count of new-island flags.
   *
   * Output: (k, island_start, island_end, n_intervals) per island.
   *
   * Scale shape: ONE shuffle (the per-key window sort) feeding both the
   * running-max lag and the island-id running sum on the same
   * partitioning, then a hash-agg that reuses it — no self-join, no
   * explode (the O(covered-length) blowup), no per-island iteration.
   * Skewed keys are bounded by their own interval count, not span.
   */
  def mergeIntervals(df: DataFrame, keyCol: Column,
                     startCol: Column, endCol: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    df.select(keyCol.cast("long").as("k"), startCol.cast("long").as("s"),
        endCol.cast("long").as("e"))
      // running max end over all PRECEDING intervals (exclude current row:
      // the first interval of every key must flag as a new island)
      .withColumn("prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        count(lit(1)).cast("long").as("n_intervals"))
      .select(col("k"), col("island_start"), col("island_end"), col("n_intervals"))
  }

  /**
   * Interval COMPLEMENT per key (bedtools-complement over the covered
   * span): the gaps BETWEEN [[mergeIntervals]]' islands — the uncovered
   * regions a coverage QC reports. Islands are disjoint and
   * gap-separated by construction (touching intervals merged), so every
   * emitted gap has length ≥ 1; a key with one island emits nothing.
   *
   * Scale shape: rides mergeIntervals' one key-partitioned window, then
   * one `lead` over the ISLAND table — already reduced to islands per
   * key, a tiny fraction of the input intervals.
   */
  def intervalGaps(df: DataFrame, keyCol: Column,
                   startCol: Column, endCol: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("island_start"))
    mergeIntervals(df, keyCol, startCol, endCol)
      .withColumn("next_start", lead(col("island_start"), 1).over(w))
      .filter(col("next_start").isNotNull)
      .select(col("k"), col("island_end").as("gap_start"),
        col("next_start").as("gap_end"),
        (col("next_start") - col("island_end")).as("gap_len"))
  }
}
