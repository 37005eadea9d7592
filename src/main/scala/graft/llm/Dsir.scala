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
 * Cross-engine exactness: each feature contribution is ONE libm `ln` of
 * an exactly-computed double ratio `((ct+1)·(R+B)) / ((cr+1)·(T+B))`
 * (products/quotients of integer-valued doubles are correctly rounded,
 * so both engines feed `ln` the same bits), rounded to 6 dp and summed
 * in DECIMAL(18,6) — the registry-wide order-independent sum rule
 * (l43's pattern).
 *
 * Scale shape: both models are `nBuckets`-BOUNDED aggregates (map-side
 * partials, one skinny shuffle each) merged with a full-outer join of
 * two ≤B-row tables; totals ride windows over that B-row table — no
 * corpus re-scan, no driver collect. Scoring explodes raw features once
 * and joins the BROADCAST model table. Two raw-corpus scans total
 * (model build + scoring), one target scan. Integer-valued doubles stay
 * exact up to 2⁵³, i.e. corpora to ~4·10¹⁵ feature instances.
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
   * corpus. Output: (doc_id, n_feats, logw, selected).
   */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val rawFeats = featStream(raw, idCol, textCol, nBuckets)
    val rModel = rawFeats.groupBy("b").agg(count(lit(1)).cast("long").as("cr"))
    val tModel = featStream(target, idCol, textCol, nBuckets)
      .groupBy("b").agg(count(lit(1)).cast("long").as("ct"))
    val wAll = Window.partitionBy()
    val models = rModel.join(tModel, Seq("b"), "full_outer")
      .withColumn("r_total", sum(coalesce(col("cr"), lit(0L))).over(wAll))
      .withColumn("t_total", sum(coalesce(col("ct"), lit(0L))).over(wAll))
    val b = lit(nBuckets.toLong)
    val num = (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") *
      (col("r_total") + b).cast("double")
    val den = (col("cr") + lit(1L)).cast("double") *
      (col("t_total") + b).cast("double")
    rawFeats.join(broadcast(models), Seq("b"))
      .select(col("doc_id"),
        round(log(num / den), 6).cast("decimal(18,6)").as("_s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("_s")).cast("double").as("logw"))
      .select(col("doc_id"), col("n_feats"), col("logw"),
        (col("logw") > 0).as("selected"))
  }
}
