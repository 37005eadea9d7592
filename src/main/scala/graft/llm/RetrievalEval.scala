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

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009, public):
   * combine N retrieval rankings — lexical BM25, dense ANN, any mix — by
   * Σ 1/(kConst + rank), the standard hybrid-search combiner: no score
   * calibration across systems is needed because only RANKS enter, and
   * kConst (=60 in the paper) damps the head so one list can't dominate.
   *
   * Exactness: each list's contribution is the integer floor quotient
   * 10⁹ div (kConst + rank) — per-term truncation, so the sum is
   * accumulation-order-free and any engine replays it bit for bit (the
   * bradleyTerry/giniByGroup micro-unit rule).
   *
   * Scale shape: inputs are top-k LISTS by contract (each ≤ k rows — the
   * bounded output of bm25TopK / lshTopK / ivfTopK), so every window here
   * runs over ≤ k·N rows, never the corpus; the expensive retrieval keeps
   * its own scale shape and fusion adds one tiny hash-agg. Per-list ranks
   * are recomputed from (score DESC, doc ASC) so result order never
   * matters.
   *
   * Output: (doc_id, rrf_score_nano, n_lists, rrf_rank), top `topK` by
   * (score desc, doc asc).
   */
  def rrfFuse(rankings: Seq[DataFrame], docCol: String, scoreCol: String,
              kConst: Int = 60, topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(kConst >= 1 && topK >= 1, s"kConst=$kConst topK=$topK")
    val perListW = Window.orderBy(col("_s").desc, col("doc_id").asc)
    val ranked = rankings.map { r =>
      r.select(col(docCol).as("doc_id"), col(scoreCol).as("_s"))
        .withColumn("_rnk", row_number().over(perListW).cast("long"))
        .select(col("doc_id"), col("_rnk"))
    }.reduce(_ unionByName _)
    val fusedW = Window.orderBy(col("rrf_score_nano").desc, col("doc_id").asc)
    ranked
      .groupBy("doc_id")
      .agg(sum(expr(s"1000000000 div (${kConst.toLong} + _rnk)")).cast("long")
          .as("rrf_score_nano"),
        count(lit(1)).cast("long").as("n_lists"))
      .withColumn("rrf_rank", row_number().over(fusedW).cast("long"))
      .filter(col("rrf_rank") <= topK)
  }
}
