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
}
