package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HyperLogLog-style distinct sketch with PORTABLE registers (Flajolet,
 * Fusy, Gandouet, Meunier 2007) — the mergeable-state path next to a15's
 * opaque `approx_count_distinct`: this one exposes the registers, so
 * shards sketch independently and MERGE BY PER-BUCKET MAX — the property
 * that makes 100 TB distinct-counting a map-side aggregate plus a tiny
 * reduce, and lets sketches be stored per partition/day and combined
 * later without rescanning.
 *
 * Portability: the value hash is the md5-derived
 * [[graft.llm.TextOps.portableHash60]] (exactly `('0x' ||
 * substr(md5(v),1,15))::BIGINT` in DuckDB), bucket = h % 256, and the
 * register is the 1-based leading-zero rank of the remaining 52-bit word
 * (`53 − bitlen(w)`, `bitlen` via the binary-string length — exact
 * integer on both engines, never a float log2). The whole sketch —
 * registers, the common-denominator sum `Σ 2^(53−R_j)` (absent buckets
 * contribute 2^53), and the bias-corrected estimate — replays exactly in
 * SQL.
 *
 * Exact integer estimator: est_micro = ⌊A / S⌋ where
 * A = α₂₅₆_micro · m² · 2⁵³ (α₂₅₆ = 0.7213/(1+1.079/256) ≈ 0.718273,
 * pinned as the integer micro constant 718273 — a spec constant, not a
 * computed float) and S = Σⱼ 2^(53−Rⱼ). The quotient is taken as
 * (A − A mod S)/S in DECIMAL(38,0) arithmetic — exact on both engines,
 * no decimal-division rounding in play. No small-range linear-counting
 * branch: ln() is libm and not cross-engine exact; below ~2.5·m distinct
 * values the raw estimator reads high (documented HLL behavior — gate on
 * `n_hit < m` if the small regime matters).
 */
object HllSketch {

  val NumBuckets = 256
  val AlphaMicro = 718273L
  /** 2⁵³ — the register-sum common denominator (60-bit hash − 8 bucket
    * bits = a 52-bit word; ranks are 1..53). */
  val Denom: Long = 1L << 53
  /** A = α_micro · m² · 2⁵³, as an exact integer literal. */
  val NumeratorA: BigInt = BigInt(AlphaMicro) * NumBuckets * NumBuckets * BigInt(Denom)

  /**
   * Per-(group, bucket) registers: (grp, bucket, reg). NO distinct pass —
   * the register is a MAX, which is duplicate-insensitive by construction
   * (spec'd), so the raw stream partial-aggregates map-side and the only
   * shuffle carries ≤ m rows per group per input partition. This is the
   * whole point of the sketch at 100 TB: the scan is the cost, the
   * exchange is negligible, and stored register sets merge by per-bucket
   * max without rescanning anything.
   */
  def registers(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), col(valueCol).cast("string").as("v"))
      .select(col("grp"),
        graft.llm.TextOps.portableHash60(col("v")).as("h60"))
      .select(col("grp"),
        pmod(col("h60"), lit(NumBuckets.toLong)).as("bucket"),
        expr(s"h60 div $NumBuckets").as("w"))
      .select(col("grp"), col("bucket"),
        when(col("w") === 0L, 53L)
          .otherwise(lit(53L) - length(bin(col("w"))).cast("long")).as("reg"))
      .groupBy("grp", "bucket")
      .agg(max(col("reg")).as("reg"))

  /**
   * Per-group sketch summary: (grp, n_hit, reg_checksum, est_micro,
   * exact_distinct, within_50pct). `reg_checksum = Σ reg·(bucket+1)`
   * pins register VALUES AND POSITIONS; the register-sum S pins the
   * multiset a second way (it is a sum of distinct powers of two with
   * bounded multiplicity). `exact_distinct` rides along so the row
   * carries its own ground truth. Headroom: the BIGINT cast of est_micro
   * requires S ≥ A/2⁶³ — true unless essentially every register
   * saturates at 53, i.e. never on real data.
   */
  def summary(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val vals = df.select(col(groupCol).as("grp"),
      col(valueCol).cast("string").as("v")).distinct()
    val regs = registers(df, groupCol, valueCol)
    val s = regs.groupBy("grp").agg(
      count(lit(1)).cast("long").as("n_hit"),
      sum(col("reg") * (col("bucket") + 1L)).cast("long").as("reg_checksum"),
      sum(expr(s"CAST(${Denom}L div shiftleft(1L, CAST(reg AS INT)) AS DECIMAL(38,0))"))
        .as("_s_hit"))
      .select(col("grp"), col("n_hit"), col("reg_checksum"),
        (col("_s_hit") + (lit(NumBuckets.toLong) - col("n_hit")).cast("decimal(38,0)")
          * lit(Denom).cast("decimal(38,0)")).cast("decimal(38,0)").as("_s"))
      .select(col("grp"), col("n_hit"), col("reg_checksum"),
        expr(s"CAST((CAST('$NumeratorA' AS DECIMAL(38,0)) " +
          s"- CAST('$NumeratorA' AS DECIMAL(38,0)) % _s) / _s AS BIGINT)")
          .as("est_micro"))
    val exact = vals.groupBy("grp")
      .agg(count(lit(1)).cast("long").as("exact_distinct"))
    s.join(exact, Seq("grp"))
      .withColumn("within_50pct",
        abs(col("est_micro") - col("exact_distinct") * 1000000L)
          <= col("exact_distinct") * 500000L)
  }
}
