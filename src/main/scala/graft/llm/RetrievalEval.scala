package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Retrieval-quality evaluation as a first-class engine operator: given a
 * ground-truth top-k table and a system's result table, compute per-query
 * recall@k and reciprocal rank — the metrics every ANN index deployment
 * reports (recall/QPS curves), here as a distributed query so index
 * quality can be monitored over the FULL corpus on every build, not just
 * spot-checked in CI (the spec-level gates in AnnRecallSpec sample; this
 * measures).
 *
 * Determinism: hit counts are integers; recall@k = hits/k and rr = 1/rank
 * are quotients of small ints — both engines compute identical doubles —
 * and outputs are 6-dp-rounded. Rank within `results` is recomputed here
 * from the (rounded sim DESC, corpus_id ASC) key rather than trusted from
 * the caller, so the metric is well-defined regardless of result order.
 *
 * Scale shape: one equi-join on (query_id, corpus_id) between two
 * k-bounded tables (|Q|·k rows each — tiny relative to the corpus), one
 * groupBy query. The expensive inputs (truth via
 * [[Ann.bruteForceTopKJoin]], results via [[Ann.lshTopK]]) keep their own
 * scale shapes; evaluation adds nothing super-linear.
 */
object RetrievalEval {

  /**
   * Per-query metrics. `truth`: (query_id, corpus_id, ...) — the exact
   * top-k set. `results`: (query_id, corpus_id, cosine_sim) — the system
   * output. Queries present in `truth` but absent from `results` (the
   * index returned nothing) come back with zero recall and rr.
   *
   * Output: (query_id, n_hits, recall_at_k, rr) — rr = 1/rank of the
   * FIRST true neighbor in the system ranking, 0 when none hit.
   */
  def retrievalMetrics(truth: DataFrame, results: DataFrame,
                       k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("cosine_sim"), 6).desc, col("corpus_id").asc)
    val ranked = results.select(col("query_id"), col("corpus_id"),
        col("cosine_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
    val hits = truth.select(col("query_id"), col("corpus_id"))
      .join(ranked, Seq("query_id", "corpus_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).cast("long").as("n_hits"),
        min(col("rank")).as("_first"))
    truth.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 6)
          .as("recall_at_k"),
        round(when(col("_first").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("_first")), 6).as("rr"))
  }
}
