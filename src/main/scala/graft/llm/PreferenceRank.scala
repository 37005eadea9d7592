package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Bradley–Terry preference-strength aggregation (Bradley & Terry 1952;
 * the MM fixed point of Hunter 2004, "MM algorithms for generalized
 * Bradley-Terry models") — the RLHF reward-data primitive: given
 * pairwise preference counts (response A beat response B n times),
 * recover per-item strength weights, the quantity a reward-model
 * trainer fits and a data-curation pipeline uses to rank policies /
 * prompts / annotator pools.
 *
 * The MM update, in EXACT integer micro-units so any engine replays it
 * bit for bit (every division is truncating — BigInt `/` = Spark `div`
 * = DuckDB `//` on non-negatives; all quantities here are ≥ 0):
 *
 *   c_ij  = n_ij + n_ji                (comparisons between i and j)
 *   W_i   = Σ_j n_ij                   (total wins of i)
 *   d_i   = Σ_j trunc(c_ij·10¹² / (w_i + w_j))
 *   w'_i  = max(1, trunc(W_i·10¹² / d_i))
 *   w_i   ← max(1, trunc(10⁶·w'_i / Σ w'))        (renormalize)
 *
 * starting from w_i = 10⁶. The max(1, ·) clamps keep never-winners from
 * collapsing a later round's denominator to zero (the DoReMi 10⁴-clamp
 * precedent). Each summand truncates INDEPENDENTLY, so the sum is
 * accumulation-order-free.
 *
 * Scale shape: ONE aggregation of the preference stream to the
 * (winner, loser) count matrix — the only data-sized job; the
 * recurrence runs driver-side over the ITEM table (bounded by item
 * cardinality: responses-per-prompt, policies, annotators — dozens,
 * the kmeansCentroids / DoReMi trainer-table precedent), and that bound
 * is ENFORCED: a pre-aggregate rejects inputs whose distinct winner or
 * loser count exceeds `maxItems` (and any winner==loser self-pair)
 * before anything collects. Eager by construction. Reference analogy: the per-program aggregate tables
 * the reference's BQ builds assemble; this one's recurrence just isn't
 * expressible as one SQL statement, so it unrolls like l125.
 *
 * Output: (item, wins, losses, weight_micro) — weight_micro sums to
 * ~10⁶ across items (truncation dust aside).
 */
object PreferenceRank {

  private val S12 = BigInt(10).pow(12)
  private val S6 = BigInt(1000000)

  def bradleyTerry(counts: DataFrame, winnerCol: String, loserCol: String,
                   nCol: String, rounds: Int = 6,
                   maxItems: Int = 4096): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be 1-64, got $rounds")
    require(maxItems >= 1, s"maxItems must be positive, got $maxItems")
    val spark = counts.sparkSession
    val base = counts
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
      .select(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"),
        col(nCol).cast("long").as("n"))
    // Fail-fast gate, ONE cheap pre-aggregate before anything collects:
    // (a) winner == loser self-pairs add 2n to c(i,i) and n to both wins
    // and losses of i, silently skewing every weight — degenerate input
    // must fail loudly, not diverge from a clean oracle; (b) the count
    // matrix collects driver-side, bounded by maxItems² aggregated rows —
    // a caller ranking 10⁶ prompts gets a readable error, not a driver OOM
    // (the l16/l123 bounded-collect precedent).
    val pre = base.agg(
      sum(when(col("w") === col("l"), col("n")).otherwise(0L)).as("self"),
      countDistinct("w").as("dw"), countDistinct("l").as("dl")).head()
    require(pre.getLong(0) == 0L,
      s"bradleyTerry: ${pre.getLong(0)} winner==loser self-comparisons in " +
        s"'$winnerCol'/'$loserCol' — a self-pair inflates its own wins AND " +
        "losses; filter these rows upstream")
    require(pre.getLong(1) <= maxItems && pre.getLong(2) <= maxItems,
      s"bradleyTerry: ${pre.getLong(1)} distinct winners / ${pre.getLong(2)} " +
        s"distinct losers exceed maxItems=$maxItems — the count matrix is " +
        "collected driver-side over the ITEM table (responses-per-prompt, " +
        "policies, annotators: dozens); raise maxItems only if the matrix " +
        "genuinely fits the driver")
    val rows = base
      .groupBy("w", "l")
      .agg(sum(col("n")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), BigInt(r.getLong(2))))
    require(rows.nonEmpty, "no preference pairs")

    val items = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    val wins = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val losses = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // symmetric comparison matrix c_ij keyed by (i, j), both directions
    val c = scala.collection.mutable.Map.empty[(String, String), BigInt]
      .withDefaultValue(BigInt(0))
    rows.foreach { case (w, l, n) =>
      c((w, l)) += n
      c((l, w)) += n
    }
    val neighbors: Map[String, Seq[String]] =
      c.keys.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap

    var w: Map[String, BigInt] = items.map(_ -> S6).toMap
    for (_ <- 1 to rounds) {
      val wp = items.map { i =>
        val d = neighbors.getOrElse(i, Nil)
          .map(j => c((i, j)) * S12 / (w(i) + w(j))).sum
        i -> (if (d > 0) (wins.getOrElse(i, BigInt(0)) * S12 / d).max(1) else BigInt(1))
      }.toMap
      val s = wp.values.sum
      w = items.map(i => i -> (S6 * wp(i) / s).max(1)).toMap
    }

    val out = items.map { i =>
      Row(i, wins.getOrElse(i, BigInt(0)).toLong,
        losses.getOrElse(i, BigInt(0)).toLong, w(i).toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("wins", LongType, nullable = false),
        StructField("losses", LongType, nullable = false),
        StructField("weight_micro", LongType, nullable = false))))
  }
}
