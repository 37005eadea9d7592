package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Table-diff macros: the reference's publish gate and its own regression-test
 * primitives, as distributed DataFrame ops (no driver materialization — the
 * reference's dict-compare A11 anti-pattern is deliberately replaced).
 *
 * References:
 *  - symmetric diff publish gate: cda_bq_etl/bq_helpers/lookup.py:692-705
 *    (`compare_two_tables_sql`); NaN-safe variant :677-690.
 *  - added/removed keys: compare_and_publish_tables.py:127-136 (NOT EXISTS).
 *  - changed records: compare_and_publish_tables.py:306-331 (INTERSECT of
 *    both one-way diffs' keys).
 *  - duplicate keys: compare_and_publish_tables.py:247-252 (HAVING COUNT>1).
 */
object Diff {

  /** `EXCEPT DISTINCT` (U2). Spark's `except` already has DISTINCT
    * semantics and treats NULL=NULL and NaN=NaN like BigQuery/DuckDB. */
  def exceptDistinct(a: DataFrame, b: DataFrame): DataFrame = a.except(b)

  /** `INTERSECT DISTINCT` (U4). */
  def intersectDistinct(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  /** NaN → the literal string "NaN", else plain string cast — the
    * lookup.py:677-690 cast-NaN-to-string trick, spelling pinned so both
    * engines agree. */
  def nanSafeString(c: Column): Column =
    when(isnan(c), lit("NaN")).otherwise(c.cast("string"))

  /**
   * U3 symmetric diff: `(a EXCEPT b) UNION ALL (b EXCEPT a)`, tagged with
   * which side each row came from. Empty result ⇒ tables identical ⇒ the
   * publish workflow skips republishing (lookup.py:692-705).
   *
   * `nanSafeCols`: double columns to stringify first (lookup.py:677-690).
   * Spark's set ops already treat NaN=NaN, so this is only needed when the
   * caller wants reference-identical output columns.
   */
  def symmetricDiff(a: DataFrame, b: DataFrame,
                    nanSafeCols: Seq[String] = Nil,
                    sideCol: String = "_side"): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      nanSafeCols.foldLeft(df)((d, c) => d.withColumn(c, nanSafeString(col(c))))
    val pa = prep(a)
    val pb = prep(b)
    pa.except(pb).withColumn(sideCol, lit("old"))
      .unionByName(pb.except(pa).withColumn(sideCol, lit("new")))
  }

  /** True iff the two tables are identical under DISTINCT semantics — the
    * publish gate itself. Cheap: short-circuits on the first diff row. */
  def tablesMatch(a: DataFrame, b: DataFrame): Boolean =
    symmetricDiff(a, b).isEmpty

  /** J7-shaped: rows of `newDf` whose key is absent from `oldDf` (added),
    * via left-anti join (compare_and_publish_tables.py:127-136). */
  def addedRows(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame =
    newDf.join(oldDf.select(keys.map(col).toIndexedSeq: _*).distinct(), keys, "left_anti")

  /** Rows of `oldDf` whose key is absent from `newDf` (removed). */
  def removedRows(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame =
    addedRows(newDf, oldDf, keys)

  /**
   * Changed records: keys present in both sides whose non-key columns
   * differ — INTERSECT of the two one-way diffs projected to keys
   * (compare_and_publish_tables.py:306-331).
   */
  def changedKeys(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val k = keys.map(col).toIndexedSeq
    oldDf.except(newDf).select(k: _*)
      .intersect(newDf.except(oldDf).select(k: _*))
  }

  /** Duplicate-key report: `GROUP BY keys HAVING COUNT(*) > 1`
    * (compare_and_publish_tables.py:247-252). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /**
   * Order-insensitive comparison of `sep`-concatenated columns
   * (shared_test_functions.py:195-335): rows whose concat column holds a
   * DIFFERENT SET of elements on each side, keyed comparison. The reference
   * does this with Python set symmetric difference per row; here the concat
   * is split + sorted and compared as an expression.
   */
  def concatColumnDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
                       concatCol: String, sep: String = ";"): DataFrame = {
    def norm(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+
        array_sort(array_distinct(split(col(concatCol), java.util.regex.Pattern.quote(sep))))
          .as(as): _*)
    val na = norm(a, "__a"); val nb = norm(b, "__b")
    na.join(nb, keys, "full")
      .filter(!(col("__a") <=> col("__b")))
      .select(keys.map(col) :+ col("__a").as(s"${concatCol}_old") :+
        col("__b").as(s"${concatCol}_new"): _*)
  }

  /**
   * SCHEMA diff between two table versions — the column-level gate the
   * reference's publish-compare runs BEFORE any row diff (a type change
   * or dropped column is a breaking release even when every surviving
   * row matches): one row per column name with `added` / `removed` /
   * `type_changed` / `unchanged` status and both catalog type strings.
   * Pure metadata — schemas are bounded driver objects, so this is a
   * LocalTableScan, never a data job. Names compare exactly (Spark's
   * resolution is case-preserving; normalize upstream if a source is
   * case-sloppy).
   */
  def schemaDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val ta = a.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val tb = b.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val rows = (ta.keySet ++ tb.keySet).toSeq.sorted.map { n =>
      (ta.get(n), tb.get(n)) match {
        case (Some(x), Some(y)) if x == y => (n, "unchanged", x, y)
        case (Some(x), Some(y))           => (n, "type_changed", x, y)
        case (Some(x), None)              => (n, "removed", x, null)
        case (None, Some(y))              => (n, "added", null, y)
        case (None, None)                 => throw new IllegalStateException(n)
      }
    }
    import a.sparkSession.implicits._
    rows.toDF("col_name", "status", "type_old", "type_new")
  }
}
