package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Repetition-based quality filters (the Gopher/MassiveText rule family):
 * per-document fractions that catch boilerplate and degenerate text that
 * length/punctuation scores ([[TextOps.qualityScore]]) miss —
 *
 *  - `top_token_frac`: occurrences of the most frequent token / total
 *    tokens (a page of "buy buy buy …" scores ~1);
 *  - `top_bigram_frac`: same for word bigrams (catches looping phrases);
 *  - `uniq_token_frac`: distinct / total tokens (low = repetitive).
 *
 * Computed relationally (explode → per-(doc, gram) counts → per-doc max),
 * not with per-row array lambdas: two hash aggregations that partial-
 * aggregate map-side and shuffle only (doc_id, gram) counts — the shape
 * that survives 100 TB, where a quadratic per-row HOF over token arrays
 * would not (and HOF lambdas get no CSE — see PERF.md rule 8).
 *
 * All fractions round to 6 dp for cross-engine hash stability.
 */
object RepetitionStats {

  private def gramStats(grams: DataFrame, outFrac: String, outUniq: Option[String]): DataFrame = {
    val perGram = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val agg0 = perGram.groupBy("doc_id")
      .agg(max(col("c")).as("_max"), sum(col("c")).as("_tot"),
        count(lit(1)).as("_uniq"))
    val withFrac = agg0.select(col("doc_id"),
      round(col("_max").cast("double") / col("_tot"), 6).as(outFrac),
      round(col("_uniq").cast("double") / col("_tot"), 6).as(outUniq.getOrElse("_drop")))
    outUniq.fold(withFrac.drop("_drop"))(_ => withFrac)
  }

  /**
   * Per-document repetition fractions over `documents`-shaped input.
   * Documents with no tokens (empty/blank text) are omitted — a document
   * with nothing in it has no repetition to measure (filter upstream on
   * token count for emptiness policies).
   */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        TextOps.whitespaceTokens(lower(col(textCol))).as("t"))
      .filter(size(col("t")) > 0)
    val tokens = toks.select(col("doc_id"), explode(col("t")).as("g"))
      .filter(length(col("g")) > 0)
    // bigrams from the SAME materialized token array (shingles() would
    // re-tokenize the raw text)
    val bigrams = toks
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)))).as("g"))
    val tok = gramStats(tokens, "top_token_frac", Some("uniq_token_frac"))
    val big = gramStats(bigrams, "top_bigram_frac", None)
    tok.join(big, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top_token_frac"),
        col("top_bigram_frac"), col("uniq_token_frac"))
  }
}
