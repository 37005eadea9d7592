package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering — the multi-dimensional data-skipping
 * layout Delta/Iceberg expose as `ZORDER BY` / `sort_order`: interleaving
 * the bits of two sort keys makes rows close in EITHER dimension land in
 * the same files, so min/max footer pruning works for predicates on both
 * columns at once. A linear sort gives perfect skipping on its leading
 * column and none on the other; at 100 TB the layout choice decides
 * whether a selective two-column probe reads gigabytes or terabytes
 * (ZOrderSpec measures exactly this on real parquet footers).
 */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. 21 bits per
    * dimension (42-bit z-value) covers 2M distinct values per dim.
    *
    * The dimensions MUST be normalized to comparable bit widths first
    * (shift/bucket/rank — what Delta's ZORDER range-partition step does):
    * interleaving a 8-bit domain with a 19-bit domain leaves the wide
    * domain's high bits uncontested at the top of the z-value, so the
    * curve degenerates to a linear sort on the wide column and the
    * narrow column gets NO skipping (ZOrderSpec demonstrates both the
    * degenerate and the normalized layout). Pure bitwise expression,
    * whole-stage-codegen'd, replayed exactly by the s23 oracle. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column =
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Write `df` as `nFiles` parquet files clustered on the z-value of
    * (a, b): range-partition on the z-value (contiguous curve segments
    * per file — the property pruning needs), sort within each file so
    * row-group min/max stay tight. */
  def zOrderWrite(df: DataFrame, path: String, a: Column, b: Column,
                  nFiles: Int): Unit = {
    val z = zValue(a, b)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
