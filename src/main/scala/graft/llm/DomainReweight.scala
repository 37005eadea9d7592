package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
 * data mixtures speeds up language model pretraining", public) reduced to
 * its engine-side primitive: MULTIPLICATIVE-WEIGHTS updates over per-domain
 * excess signals, with uniform smoothing — the step that turns per-domain
 * proxy losses into a training mixture. The full method trains a Group-DRO
 * proxy model for the excess term; a data engine's job is the exact,
 * replayable weight recurrence, with the excess column pluggable (here:
 * each domain's RELATIVE mean-value excess over the corpus mean, the
 * length-drift shape a22 tests — a real deployment feeds proxy-loss gaps
 * through the identical arithmetic).
 *
 * All arithmetic is exact integer micro-units so any engine replays it bit
 * for bit (no exp/softmax — the multiplicative update uses the linear
 * multiplier 1 + η·excess, clamped at 0.01×, which is exp's first-order
 * form and keeps the recurrence in integers; documented trade):
 *
 *   rel_i    = trunc(10⁶·(s_i·N − S·n_i) / (S·n_i))      (TRUNCATING div
 *                toward zero — BigInt `/`, = Spark `div` = DuckDB `//`;
 *                NOT floor: rel_i can be negative, and ⌊−7/2⌋ = −4 while
 *                trunc(−7/2) = −3 — see fdiv below)
 *   mult_i   = max(10⁴, 10⁶ + trunc(ηbp·rel_i / 10⁴))
 *   per round: u_i = w_i·mult_i;  w_i ← trunc(10⁶·u_i / Σu)  (renormalize;
 *                u, Σu ≥ 0 so trunc = floor here)
 *   final_i  = trunc((10⁴−αbp)·w_i / 10⁴) + trunc(αbp·10⁶ / (10⁴·k))
 *
 * Scale shape: ONE corpus aggregation to per-domain (n, Σv) — the only
 * data-sized job; the recurrence runs driver-side over the DOMAIN table
 * (bounded by domain cardinality, ≤ dozens — the kmeansCentroids /
 * trainer-table precedent), so 100 TB of documents cost one hash-agg.
 * Eager by construction (the bounded collect happens at build time).
 */
object DomainReweight {

  /** Truncating division — BigInt `/` truncates toward zero, which is
    * exactly what BOTH Spark's `div` and DuckDB's `//` do (measured:
    * `SELECT (-7) // 2` → −3 in DuckDB), so negative excesses replay
    * without a sign split. Named so the contract is visible at use. */
  private def fdiv(a: BigInt, b: BigInt): BigInt = a / b

  def doremiWeights(df: DataFrame, domainCol: String, valueCol: String,
                    rounds: Int = 4, etaBp: Long = 100L,
                    alphaBp: Long = 200L): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be 1-64, got $rounds")
    require(etaBp > 0 && alphaBp >= 0 && alphaBp <= 10000, "bad eta/alpha")
    val spark = df.sparkSession
    val stats = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(valueCol).cast("long")).cast("long").as("s"))
      .collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
      .sortBy(_._1)
    val k = stats.length
    require(k >= 1, "no domains")
    val nTot = stats.map(_._2).sum
    val sTot = stats.map(_._3).sum
    val M = BigInt(1000000)
    val rel = stats.map { case (d, n, s) =>
      (d, n, fdiv(M * (s * nTot - sTot * n), sTot * n))
    }
    val mult = rel.map { case (_, _, r) =>
      (M + fdiv(BigInt(etaBp) * r, BigInt(10000))).max(BigInt(10000))
    }
    var w = Array.fill(k)(M)
    for (_ <- 1 to rounds) {
      val u = w.zip(mult).map { case (wi, mi) => wi * mi }
      val su = u.sum
      w = u.map(ui => fdiv(M * ui, su))
    }
    val smoothed = w.map(wi =>
      fdiv(BigInt(10000 - alphaBp) * wi, BigInt(10000)) +
        fdiv(BigInt(alphaBp) * M, BigInt(10000) * k))
    val rows = rel.zip(smoothed).map { case ((d, n, r), wi) =>
      Row(d, n.toLong, r.toLong, wi.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("domain", StringType, nullable = false),
        StructField("n_docs", LongType, nullable = false),
        StructField("rel_excess_micro", LongType, nullable = false),
        StructField("weight_micro", LongType, nullable = false))))
  }
}
