package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling: a row is kept iff
 * `portableHash60(seed ‖ key) mod 100 < pct`. Unlike `df.sample` (RNG
 * state, partition-order-dependent), the decision is a pure function of
 * the row's KEY — reproducible across runs, engines, cluster layouts, and
 * retries, and stable under re-partitioning: the properties corpus
 * sampling actually needs (resumable pipelines, auditable subsets,
 * train/validation splits that never leak across reruns).
 *
 * The stratified form varies the rate by a stratum column (downsample
 * dominant classes, keep rare ones whole). Expression-only — the filter
 * pushes into the scan stage; no shuffle, no RNG.
 *
 * Exact DuckDB twin: the md5-derived hash is the portable family's
 * (`('0x'||substr(md5(s),1,15))::BIGINT`).
 */
object Sampling {

  /** Separator between seed and key in the hash input: without one,
    * (seed "s1", key "23") and (seed "s12", key "3") would hash the same
    * bytes and correlate what should be independent samples (train/val
    * leakage). Unit-separator keeps both sides printable-safe; seeds must
    * not contain it. */
  val SeedSep = "\u001f"

  /** Keep-decision column for one key at `pct`% (0–100). */
  def keepCol(key: Column, pct: Column, seed: String): Column = {
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    pmod(TextOps.portableHash60(concat(lit(seed + SeedSep), key.cast("string"))),
      lit(100L)) < pct
  }

  /** String/integral key types only: doubles, decimals, and timestamps
    * render to string DIFFERENTLY across engines, which would silently
    * break the cross-engine reproducibility contract. */
  private def requireStableKeyType(df: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType =>
      case other => throw new IllegalArgumentException(
        s"deterministic sampling key '$keyCol' must be string or integral " +
          s"(got ${other.catalogString}): other types' string renderings " +
          "differ across engines")
    }
  }

  /** Uniform deterministic sample: keep `pct`% of rows by key hash. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int,
                          seed: String = "s1"): DataFrame = {
    require(pct >= 0 && pct <= 100)
    requireStableKeyType(df, keyCol)
    df.filter(keepCol(col(keyCol), lit(pct), seed))
  }

  /**
   * Stratified deterministic sample: per-stratum keep percentages;
   * strata absent from `rates` are dropped (rate 0). The rates map rides
   * the plan as ONE map literal (`typedlit`, not per-entry CASE nodes).
   */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Int], seed: String = "s1"): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= 100))
    requireStableKeyType(df, keyCol)
    val rate = coalesce(element_at(typedlit(rates), col(stratumCol)), lit(0))
    df.filter(keepCol(col(keyCol), rate, seed))
  }
}
