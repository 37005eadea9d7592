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

  /**
   * GRPO-style group-relative advantage (Shao et al. 2024's
   * group-baseline idea, in exact integer micro-units): for EVERY
   * candidate, its reward minus the group's mean reward
   * (`adv_micro = score·10⁶ − ⌊total·10⁶ / n⌋`), the gap to the group's
   * best, and the best-of-n chosen flag — the per-sample table a
   * rejection-sampling / GRPO data-prep step materializes, where
   * [[buildPairs]] keeps only the two extremes.
   *
   * Determinism: the chosen candidate is the lexicographic max of the
   * STRUCT (score, cid) — same tie-break as [[buildPairs]].
   *
   * Scale shape: one hash-aggregate reduces the candidate stream to one
   * row per prompt, and the probe joins it back on the prompt key — the
   * stats side BROADCASTS while distinct prompts fit an executor
   * (measured: BHJ at every test SF, so the candidate stream never
   * re-shuffles at all), and degrades to a same-key shuffle join beyond
   * that. No window, so nothing ever sorts the candidate stream.
   * Headroom (ANSI mode throws, never wraps): per-group |sum(score)|
   * must stay under 2⁶³/10⁶ ≈ 9.2·10¹²; scores must be non-negative so
   * integral `div` (truncating) and the oracle's `//` (flooring) agree.
   */
  def groupAdvantage(
      candidates: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String): DataFrame = {
    val scored = candidates.select(
      col(promptCol).as("prompt_id"),
      col(idCol).cast("long").as("cid"),
      col(scoreCol).cast("long").as("score"))
    val stats = scored.groupBy("prompt_id").agg(
      count(lit(1)).cast("long").as("n_candidates"),
      sum(col("score")).cast("long").as("_total"),
      max(struct(col("score"), col("cid"))).as("_best"))
    scored.join(stats, Seq("prompt_id"))
      .select(
        col("prompt_id"), col("cid"), col("score"), col("n_candidates"),
        (col("score") * lit(1000000L)
          - expr("_total * 1000000L div n_candidates")).as("adv_micro"),
        (col("_best.score") - col("score")).as("gap_to_best"),
        (struct(col("score"), col("cid")) === col("_best")).as("is_chosen"))
  }
}
