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
 * Computed relationally (one kind-tagged explode → per-(doc, kind, gram)
 * counts → per-doc pivot), not with per-row array lambdas: hash
 * aggregations partial-aggregate map-side and shuffle only (doc_id, kind,
 * gram) counts — the shape that survives 100 TB, where a quadratic
 * per-row HOF over token arrays would not (and HOF lambdas get no CSE —
 * see PERF.md rule 8).
 *
 * All fractions round to 6 dp for cross-engine hash stability.
 */
object RepetitionStats {

  /**
   * Per-document repetition fractions over `documents`-shaped input.
   * Documents with no tokens (empty/blank text) are omitted — a document
   * with nothing in it has no repetition to measure (filter upstream on
   * token count for emptiness policies).
   *
   * ONE pass over the corpus: unigrams and bigrams are generated from the
   * same per-row token array into a kind-tagged explode, so the source is
   * scanned and tokenized once (separate unigram/bigram aggregation
   * branches would read and re-split every row twice — the dominant cost
   * at corpus scale).
   */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val gramType = "array<struct<k:string,g:string>>"
    val toks = docs.select(col(idCol).as("doc_id"),
      TextOps.whitespaceTokens(lower(col(textCol))).as("t"))
    val grams = toks.select(col("doc_id"),
        explode(concat(
          // unigrams (empty split tokens excluded from token stats)
          filter(transform(col("t"), t0 => struct(lit("u").as("k"), t0.as("g"))),
            s0 => length(s0.getField("g")) > 0),
          // bigrams (from the same array; empty tokens kept, as documented)
          when(size(col("t")) >= 2,
            transform(sequence(lit(1), size(col("t")) - 1),
              i => struct(lit("b").as("k"),
                concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)).as("g"))))
            .otherwise(array().cast(gramType)))).as("kg"))
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.g").as("g"))
    val perGram = grams.groupBy("doc_id", "k", "g").agg(count(lit(1)).as("c"))
    val perKind = perGram.groupBy("doc_id", "k")
      .agg(max(col("c")).as("_max"), sum(col("c")).as("_tot"), count(lit(1)).as("_uniq"))
    perKind.groupBy("doc_id")
      .agg(
        max(when(col("k") === "u",
          round(col("_max").cast("double") / col("_tot"), 6))).as("top_token_frac"),
        max(when(col("k") === "b",
          round(col("_max").cast("double") / col("_tot"), 6))).as("top_bigram_frac"),
        max(when(col("k") === "u",
          round(col("_uniq").cast("double") / col("_tot"), 6))).as("uniq_token_frac"))
      // a doc with no non-empty tokens has no 'u' group → omitted (its
      // degenerate all-empty bigrams alone are not a measurable signal)
      .filter(col("top_token_frac").isNotNull)
  }
}
