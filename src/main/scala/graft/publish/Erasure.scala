package graft.publish

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Erasure-request CASCADE planner (round 13) — the GDPR/CCPA
 * right-to-be-forgotten primitive: given root-entity delete requests,
 * compute what every table in the FK chain must delete so no orphan
 * survives (the reference's per-program dataset deletes do this
 * wholesale; a lake needs the row-level plan).
 *
 * Each level is ONE semi-join of the child table against the PREVIOUS
 * level's deleted keys — key-on-key, so Catalyst broadcasts small key
 * sets and shuffle-joins big ones; nothing is driver-materialized. The
 * plan is an AUDIT TABLE (per table: delete/keep counts + a checksum of
 * the deleted keys in DECIMAL-safe modular arithmetic), not a side
 * effect — the caller applies it with anti-joins.
 *
 * Output: (table_name, n_delete, n_keep, del_key_mod) —
 * del_key_mod = Σ deleted own-keys mod 10¹², summed in DECIMAL(38,0)
 * so a 100 TB key population can't wrap the checksum.
 */
object Erasure {

  /** One cascade level: table name, its rows, the column referencing the
    * PARENT level's key, and this level's own key (feeds the next). */
  final case class Level(table: String, df: DataFrame,
                         parentRef: Column, ownKey: Column)

  def cascadePlan(rootTable: String, root: DataFrame, rootKey: Column,
                  requests: DataFrame, levels: Seq[Level]): DataFrame = {
    val reqKeys = requests.select(requests.columns.head).toDF("_k").distinct()

    def summarize(table: String, df: DataFrame, own: Column,
                  ref: Column, keys: DataFrame): (DataFrame, DataFrame) = {
      val del = df.join(keys, ref === col("_k"), "left_semi")
      val keysNext = del.select(own.as("_k")).distinct()
      // membership marked via ONE left join so delete/keep/checksum ride
      // a single aggregation
      val marked = df.join(keys.withColumn("_hit", lit(1)),
        ref === col("_k"), "left")
      val s = marked.agg(
        sum(when(col("_hit") === 1, 1L).otherwise(0L)).cast("long").as("n_delete"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).cast("long").as("n_keep"),
        pmod(coalesce(sum(when(col("_hit") === 1, own.cast("long"))
          .otherwise(0L).cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")),
          lit(1000000000000L).cast("decimal(38,0)"))
          .cast("long").as("del_key_mod"))
        .select(lit(table).as("table_name"), col("n_delete"), col("n_keep"),
          col("del_key_mod"))
      (s, keysNext)
    }

    val (rootSummary, rootDeleted) =
      summarize(rootTable, root, rootKey, rootKey, reqKeys)
    val (summaries, _) = levels.foldLeft((Seq(rootSummary), rootDeleted)) {
      case ((acc, keys), lvl) =>
        val (s, next) = summarize(lvl.table, lvl.df, lvl.ownKey, lvl.parentRef, keys)
        (acc :+ s, next)
    }
    summaries.reduce(_.unionByName(_))
  }
}
