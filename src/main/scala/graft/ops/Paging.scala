package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyset (cursor) pagination — the OUTBOUND page-serving complement to
 * the inbound paginated sources (S13/S14): page N+1 is "the first
 * `pageSize` rows strictly after the last row of page N in the sort
 * order", expressed as a lexicographic tuple predicate instead of
 * OFFSET. OFFSET pagination re-sorts and discards N·page rows per page
 * (quadratic over a full export, and skew-broken under concurrent
 * writes); the keyset predicate pushes to the scan and the page itself
 * is one TakeOrderedAndProject — O(page) per call at any table size,
 * which is why every large-table export API serves this shape.
 *
 * Contract: `keys` must form a UNIQUE total order (append the primary
 * key last) or pages can skip/repeat rows at duplicate boundaries.
 */
object Paging {

  /** Rows strictly after `cursor` in the lexicographic order of `keys`,
    * limited to `pageSize`, sorted. `keys` = (column name, cursor value)
    * in sort order; a NULL-free key tuple is assumed (keyset pagination
    * over nullable keys needs a null-ordering convention upstream). */
  def keysetPage(df: DataFrame, keys: Seq[(String, Column)],
                 pageSize: Int): DataFrame = {
    require(keys.nonEmpty && pageSize > 0)
    // (a, b, c) > (x, y, z)  ⇔  a > x  ∨  (a = x ∧ b > y)  ∨  (a = x ∧ b = y ∧ c > z)
    val afterCursor = keys.indices.map { i =>
      val equalPrefix = (0 until i).map(j => col(keys(j)._1) === keys(j)._2)
      (equalPrefix :+ (col(keys(i)._1) > keys(i)._2)).reduce(_ && _)
    }.reduce(_ || _)
    df.filter(afterCursor)
      .orderBy(keys.map(k => col(k._1)): _*)
      .limit(pageSize)
  }
}
