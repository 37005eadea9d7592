package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Type-2 slowly-changing-dimension maintenance (Kimball's SCD2 — the
 * MERGE-INTO-with-history pattern every warehouse dimension load runs):
 * a history table keeps one row per (key, version) with
 * `[valid_from, valid_to)` validity and an `is_current` flag; applying an
 * update batch CLOSES the current row of every key whose attributes
 * changed (valid_to = batchTs) and opens a new current row, leaves
 * unchanged keys untouched (a no-op update must not create a version),
 * and inserts brand-new keys as open rows.
 *
 * Contract: `updates` carries at most one row per key (dedup upstream —
 * [[graft.llm.Dedup.exactDedupKeepBest]] or a last-write-wins agg);
 * enforcement would hide a data bug, so duplicate update keys fail the
 * uniqueness the caller owns. Attribute comparison is null-safe (NULL →
 * NULL is unchanged, NULL → value is a change).
 *
 * Scale shape: ONE key-partitioned full-outer join of the CURRENT slice
 * against the batch (the closed history never joins — it unions straight
 * through), then a union of three filter-projections of that join. At
 * 100 TB the history is partitioned by key range and only the current
 * slice (≤ one row per key) shuffles per batch.
 */
object Scd {

  def scd2Apply(history: DataFrame, updates: DataFrame, keyCol: String,
                attrCols: Seq[String], batchTs: Long): DataFrame = {
    val outCols = (keyCol +: attrCols) ++ Seq("valid_from", "valid_to", "is_current")
    val cur = history.filter(col("is_current"))
    val past = history.filter(!col("is_current")).select(outCols.map(col): _*)
    val u = updates.select(
      col(keyCol).as("_uk") +: attrCols.map(c => col(c).as(s"_u_$c")): _*)
    val joined = cur.join(u, col(keyCol) === col("_uk"), "full")
    // null-safe change test: any attribute not <=> its update
    val changed = col("_uk").isNotNull && col(keyCol).isNotNull &&
      attrCols.map(c => !(col(c) <=> col(s"_u_$c"))).reduce(_ || _)
    // existing current rows: closed when changed, untouched otherwise
    val keptOrClosed = joined.filter(col(keyCol).isNotNull).select(
      (col(keyCol) +: attrCols.map(col)) ++ Seq(
        col("valid_from"),
        when(changed, lit(batchTs)).otherwise(col("valid_to")).as("valid_to"),
        (!changed).as("is_current")): _*)
    // new versions: changed keys re-open, brand-new keys insert
    val opened = joined.filter(col("_uk").isNotNull && (col(keyCol).isNull || changed))
      .select((col("_uk").as(keyCol) +: attrCols.map(c => col(s"_u_$c").as(c))) ++ Seq(
        lit(batchTs).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current")): _*)
    past.unionByName(keptOrClosed).unionByName(opened)
  }

  /**
   * Type-1 keyed MERGE — the `MERGE INTO target USING source ON key`
   * current-state upsert (no history, the complement to [[scd2Apply]]):
   * matched rows take the source's attributes, matched rows whose source
   * op is `delete` disappear, unmatched target rows pass through, and
   * unmatched non-delete source rows insert. A delete for an absent key
   * is a no-op (MERGE's semantics — not an error).
   *
   * Contract: `source` carries at most one row per key (same rule as
   * [[scd2Apply]]); `opCol` holds `"D"` for deletes, anything else
   * upserts. Emits an `action` audit column (`kept`/`updated`/
   * `inserted`) so a load can assert its expected mix.
   *
   * Scale shape: ONE key-partitioned full-outer join, then a single
   * filter-projection — no union arms, no second shuffle. At 100 TB the
   * target stays partitioned by key and only the batch reshuffles; with
   * a bucketed target the join is shuffle-free on the target side.
   */
  def mergeUpsert(target: DataFrame, source: DataFrame, keyCol: String,
                  attrCols: Seq[String], opCol: String): DataFrame = {
    val s = source.select(
      col(keyCol).as("_sk") +: col(opCol).as("_op") +:
        attrCols.map(c => col(c).as(s"_s_$c")): _*)
    val joined = target.join(s, col(keyCol) === col("_sk"), "full")
    val isDelete = col("_op") === "D"
    val matched = col(keyCol).isNotNull && col("_sk").isNotNull
    joined
      .filter(!coalesce(isDelete, lit(false)))
      .select(
        coalesce(col(keyCol), col("_sk")).as(keyCol) +:
          attrCols.map(c =>
            when(col("_sk").isNotNull, col(s"_s_$c")).otherwise(col(c)).as(c)) :+
          when(col("_sk").isNull, lit("kept"))
            .when(matched, lit("updated"))
            .otherwise(lit("inserted")).as("action"): _*)
  }

  /**
   * CDC changelog COMPACTION — the step between a change stream and
   * [[mergeUpsert]]: a changelog carries MANY ordered ops per key
   * (op ∈ I/U/D, a per-key strictly monotone sequence — the Debezium /
   * Delta-change-data-feed shape, both public), and only each key's
   * LATEST op matters for the next snapshot. Keeps that op's payload plus
   * audit columns (`n_ops` folded, `last_seq` applied) so a load can
   * assert how much history each batch collapsed.
   *
   * Scale shape: ONE hash aggregation on the key — `max_by` over a
   * `(op, attrs…)` struct keyed by the sequence, partial-aggregated
   * map-side (no per-key window sort, no shuffle beyond the groupBy).
   * Equal sequences for one key are a changelog-production bug upstream;
   * the contract here is strict per-key monotonicity.
   */
  def compactChangelog(changelog: DataFrame, keyCol: String, seqCol: String,
                       opCol: String, attrCols: Seq[String]): DataFrame = {
    val payload = struct(col(opCol).as("_op") +: attrCols.map(col): _*)
    changelog.groupBy(col(keyCol))
      .agg(max_by(payload, col(seqCol)).as("_last"),
        count(lit(1)).as("n_ops"),
        max(col(seqCol)).cast("long").as("last_seq"))
      .select(col(keyCol) +: col("_last._op").as(opCol) +:
        attrCols.map(c => col(s"_last.$c").as(c)) :+
        col("n_ops") :+ col("last_seq"): _*)
  }

  /**
   * Apply a raw multi-op changelog to a current-state target:
   * [[compactChangelog]] (latest op per key) piped into [[mergeUpsert]] —
   * the compacted batch holds ≤ one row per key BY CONSTRUCTION, so the
   * merge's uniqueness contract is satisfied structurally, not by caller
   * discipline. A key whose latest op is `D` disappears (even if earlier
   * ops in the same batch inserted it); a delete for an absent key stays
   * a no-op. Two shuffles total: the compaction groupBy and the merge's
   * full-outer join (co-partitioned on the same key, so AQE/bucketing can
   * collapse the second at scale).
   */
  def cdcApply(target: DataFrame, changelog: DataFrame, keyCol: String,
               seqCol: String, opCol: String, attrCols: Seq[String]): DataFrame = {
    val compacted = compactChangelog(changelog, keyCol, seqCol, opCol, attrCols)
      .select(col(keyCol) +: col(opCol) +: attrCols.map(col): _*)
    mergeUpsert(target, compacted, keyCol, attrCols, opCol)
  }

  /**
   * TEMPORAL dimension join — "which version of the dimension was
   * current when this fact happened": each fact row joins the [[scd2Apply]]
   * history version whose `[valid_from, valid_to)` interval contains the
   * fact's time (open `valid_to` = still current). The point-in-time
   * enrichment every warehouse fact load runs against an SCD2 dimension.
   *
   * Scale shape: this is deliberately a KEY equi-join plus an interval
   * FILTER, not a range join — the dimension key carries all the
   * selectivity (each key holds a handful of versions; the filter prunes
   * within the joined key group), so the plan is the ordinary
   * hash/broadcast join and never needs j15's interval binning, which
   * exists for joins with NO equi key. Facts with no covering version
   * (before the key's first version, or an unknown key) are dropped —
   * inner semantics; LEFT-join upstream if absence must surface.
   *
   * Column contract: fact and history must not share column names apart
   * from the join key itself.
   */
  def temporalJoin(facts: DataFrame, history: DataFrame,
                   factKey: String, factTimeCol: String,
                   histKey: String, validFromCol: String = "valid_from",
                   validToCol: String = "valid_to"): DataFrame = {
    val t = col(factTimeCol)
    facts.join(history,
      col(factKey) === col(histKey) &&
        t >= col(validFromCol) &&
        (col(validToCol).isNull || t < col(validToCol)))
  }

  /**
   * LATE-ARRIVING dimension handling (Kimball's "early-arriving facts"):
   * facts referencing a dimension member that has not loaded yet must
   * not be dropped or stalled — the warehouse INSERTS an inferred member
   * (key only, attributes null) so the fact join resolves, then ENRICHES
   * it in place when the real dimension row arrives. Returns the managed
   * dimension: initial rows tagged `loaded`, fact-driven placeholders
   * tagged `inferred`, and placeholders whose real row arrived in
   * `lateDim` tagged `enriched` with the late attributes. (Late rows
   * never referenced by a fact flow through the ordinary load path, not
   * this repair path — out of scope by design.)
   *
   * Scale shape: one distinct on the fact KEY column (pre-aggregated —
   * never the fact rows), one anti join against the dim keys, one left
   * join to the late batch; all key-partitioned equi joins, dims
   * broadcastable as usual.
   */
  def lateArrivingDimension(dim: DataFrame, facts: DataFrame,
                            lateDim: DataFrame, key: String,
                            attrCols: Seq[String]): DataFrame = {
    val attrs = attrCols.map(col)
    val inferredKeys = facts.select(col(key)).distinct()
      .join(dim.select(col(key)), Seq(key), "left_anti")
    // presence marker, not attr nullness: a late row may legitimately
    // carry NULL attributes and must still read as enriched
    val repaired = inferredKeys
      .join(lateDim.withColumn("_present", lit(true)), Seq(key), "left")
      .select(col(key) +: attrs :+
        when(col("_present").isNull, lit("inferred"))
          .otherwise(lit("enriched")).as("status"): _*)
    dim.select(col(key) +: attrs :+ lit("loaded").as("status"): _*)
      .unionByName(repaired)
  }
}
