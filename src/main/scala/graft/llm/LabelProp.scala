package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * kNN label propagation over the LSH neighbor graph — the semi-supervised
 * annotation step behind classifier-curated corpora (a small seed set
 * carries trusted labels; every unlabeled document inherits the
 * similarity-weighted majority label of its embedding neighbors, the
 * "label a few, spread to the corpus" recipe used for quality/topic
 * annotation at pretraining scale).
 *
 * Composition, not a new index: neighbors come from [[Ann.lshKnnJoin]]
 * (the same multi-table hyperplane structure every other ANN consumer
 * shares), the vote joins the seed-label table on the neighbor side, and
 * the winner per document is chosen by exact-DECIMAL weight with a
 * deterministic (weight DESC, label ASC) tie-break — so an external
 * engine replays the vote bit for bit on top of the replayed kNN.
 *
 * Scale shape: one bucketed candidate generation (shared LSH machinery,
 * capped buckets, no all-pairs), a join against the seed labels — a
 * broadcast when seeds are the usual small fraction — and one
 * (id, label) groupBy. Weights sum 6-dp-rounded sims as DECIMAL(16,6):
 * exact and order-free, so partial aggregation cannot flip a tie.
 */
object LabelProp {

  /**
   * Propagate `labels` (id, label) to unlabeled rows of `df` by
   * sim-weighted kNN vote. Output: (id, pred_label, weight, n_votes) for
   * every unlabeled row with at least one labeled neighbor among its
   * top-`k`.
   */
  def knnLabelVote(df: DataFrame, vecCol: String, idCol: String,
                   labels: DataFrame, dim: Int, k: Int,
                   nPlanes: Int = 8, nTables: Int = 4,
                   maxBucketSize: Int = 2000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(16, 6)
    val nn = Ann.lshKnnJoin(df, vecCol, idCol, dim, k, nPlanes, nTables,
      maxBucketSize)
    val lab = labels.select(col("id").as("neighbor_id"), col("label"))
    val votes = nn
      .join(lab, "neighbor_id") // only labeled neighbors vote
      .join(labels.select(col("id")), Seq("id"), "left_anti") // targets = unlabeled
      .groupBy(col("id"), col("label"))
      .agg(sum(col("cosine_sim").cast(dec)).as("w"),
        count(lit(1)).as("n_votes"))
    val win = Window.partitionBy(col("id"))
      .orderBy(col("w").desc, col("label").asc)
    votes.withColumn("_r", row_number().over(win)).filter(col("_r") === 1)
      .select(col("id"), col("label").as("pred_label"),
        col("w").cast("double").as("weight"), col("n_votes"))
  }
}
