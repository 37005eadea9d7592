package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection via importance resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling", public):
 * score every raw document by how much more likely its hashed n-gram
 * features are under a TARGET distribution (a trusted domain — curated
 * encyclopedia, books, a vetted source) than under the RAW crawl
 * distribution:
 *
 *   log w(x) = Σ_features ln p̂_target(b(f)) − ln p̂_raw(b(f))
 *
 * with features = unigrams ++ bigrams hashed into `nBuckets` buckets
 * (the paper's hashed n-gram generative model) and add-one smoothing
 * p̂(b) = (cnt(b)+1)/(total+B). Positive log w ⇒ more target-like than
 * raw; the paper resamples ∝ w, the deterministic engine form reports
 * the exact score and a `selected = log w > 0` gate so callers can
 * threshold or top-k (both reproducible, unlike Gumbel resampling).
 *
 * Cross-engine exactness: the per-bucket log-ratio is computed in
 * BASE 2 via [[Log2Micro]] — a pure int64 fixed-point recurrence (no
 * libm call anywhere), applied factor-by-factor:
 *
 *   s₂(b) = L2M(ct+1) − L2M(cr+1) + L2M(R+B) − L2M(T+B)
 *         ≈ 10⁶·log2(p̂_target(b)/p̂_raw(b))
 *
 * so both engines produce the identical integer bit-for-bit (the oracle
 * replays the recurrence as a recursive CTE over the ≤B distinct
 * factors). The previous form rounded a libm `ln` to 6 dp — the ULP
 * fragility class that flipped l104 in round 9. Base 2 vs natural log
 * only rescales; the sign gate and the ranking are preserved up to the
 * recurrence's own (deterministic, documented) micro-unit quantization.
 *
 * Scale shape: both models are `nBuckets`-BOUNDED aggregates (map-side
 * partials, one skinny shuffle each) merged with a full-outer join of
 * two ≤B-row tables; totals ride windows over that B-row table — no
 * corpus re-scan, no driver collect. Per-bucket scores are 4
 * Log2Micro calls over B rows (one O(20) int loop each). Scoring
 * explodes raw features once and joins the BROADCAST ≤B-row score
 * table; the per-doc score is a plain int64 SUM — order-independent
 * and exact, corpora to ~10¹² feature instances per doc before the
 * micro-unit sum could approach 2⁶³.
 */
object Dsir {

  /** (doc_id, b): one row per feature INSTANCE (multiplicity counts, as
    * the generative model requires), b = portableHash60(feature) mod B.
    * Blank/null docs are excluded (no features). */
  private def featStream(df: DataFrame, idCol: String, textCol: String,
                         nBuckets: Int): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        concat(TextOps.shingles(col(textCol), 1),
          TextOps.shingles(col(textCol), 2)).as("_f"))
      .select(col("doc_id"), explode(col("_f")).as("f"))
      .select(col("doc_id"),
        pmod(TextOps.portableHash60(col("f")), lit(nBuckets.toLong)).as("b"))

  /**
   * Importance weights for every non-blank raw doc against the target
   * corpus. Output: (doc_id, n_feats, logw2_micro, selected) with
   * logw2_micro = Σ_features 10⁶·log2(p̂_target/p̂_raw) in the exact
   * [[Log2Micro]] fixed-point arithmetic.
   */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    Log2Micro.register(raw.sparkSession)
    val rawFeats = featStream(raw, idCol, textCol, nBuckets)
    val rModel = rawFeats.groupBy("b").agg(count(lit(1)).cast("long").as("cr"))
    val tModel = featStream(target, idCol, textCol, nBuckets)
      .groupBy("b").agg(count(lit(1)).cast("long").as("ct"))
    val wAll = Window.partitionBy()
    val b = lit(nBuckets.toLong)
    // every bucket a raw feature can hit has cr ≥ 1, so all four
    // Log2Micro inputs are ≥ 1 (buckets seen only in the target are
    // carried by the full-outer merge but never joined by rawFeats)
    val scores = rModel.join(tModel, Seq("b"), "full_outer")
      .withColumn("r_total", sum(coalesce(col("cr"), lit(0L))).over(wAll))
      .withColumn("t_total", sum(coalesce(col("ct"), lit(0L))).over(wAll))
      .withColumn("_ct1", coalesce(col("ct"), lit(0L)) + lit(1L))
      .withColumn("_cr1", coalesce(col("cr"), lit(0L)) + lit(1L))
      .withColumn("_rb", col("r_total") + b)
      .withColumn("_tb", col("t_total") + b)
      .select(col("b"), expr(
        """graft_log2micro(_ct1) - graft_log2micro(_cr1)
           + graft_log2micro(_rb) - graft_log2micro(_tb)""").as("s2_micro"))
    rawFeats.join(broadcast(scores), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("s2_micro")).cast("long").as("logw2_micro"))
      .select(col("doc_id"), col("n_feats"), col("logw2_micro"),
        (col("logw2_micro") > 0).as("selected"))
  }
}
