package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Preference-pair construction for RLHF / DPO training sets: from a pool
 * of scored candidate responses per prompt, emit one (chosen, rejected)
 * pair per prompt — the best-scoring candidate against the worst — subject
 * to a minimum score gap (pairs with near-equal scores teach nothing and
 * add label noise).
 *
 * Determinism: candidate selection is the lexicographic max/min of the
 * STRUCT (score, candidate_id), so score ties break on id identically in
 * every engine — no "first seen" nondeterminism.
 *
 * Scale shape: ONE hash-aggregate on the prompt key (two struct min/max +
 * a count — partial-aggregated map-side); no window, no self-join, no
 * per-prompt collect. 100 TB of candidates reduces to one row per prompt.
 */
object Preference {

  /**
   * @param candidates (promptCol, idCol, scoreCol) rows; scoreCol must be
   *                   integral (exact cross-engine comparison)
   * @param minGap     minimum chosen−rejected score difference to emit
   *
   * Output: (prompt_id, chosen_id, rejected_id, chosen_score,
   * rejected_score, gap, n_candidates) — ids/scores BIGINT.
   */
  def buildPairs(
      candidates: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String,
      minGap: Long): DataFrame = {
    val scored = candidates.select(
      col(promptCol).as("prompt_id"),
      col(idCol).cast("long").as("cid"),
      col(scoreCol).cast("long").as("score"))
    scored
      .groupBy("prompt_id")
      .agg(
        max(struct(col("score"), col("cid"))).as("best"),
        min(struct(col("score"), col("cid"))).as("worst"),
        count(lit(1)).cast("long").as("n_candidates"))
      .select(
        col("prompt_id"),
        col("best.cid").as("chosen_id"),
        col("worst.cid").as("rejected_id"),
        col("best.score").as("chosen_score"),
        col("worst.score").as("rejected_score"),
        (col("best.score") - col("worst.score")).as("gap"),
        col("n_candidates"))
      .filter(col("n_candidates") >= 2 && col("gap") >= minGap)
  }
}
