package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cross-document lexical diversity (round 13) — the corpus-health
 * metric next to the WITHIN-document repetition filters (l27): what
 * fraction of a source's n-gram mass is distinct, and how much is
 * singleton? A scraped source whose type-token ratio collapses between
 * crawls is templating/boilerplate (the Gopher repetition signal lifted
 * from document scope to SOURCE scope); a singleton fraction near 1 on
 * a big source is OCR noise / id-like junk.
 *
 * Counting key is the PORTABLE 60-bit hash of the space-joined n-gram
 * (md5-derived, exactly replayable in any engine), not the string:
 * at corpus scale the shuffled key is 8 bytes instead of the n-gram
 * text, and a 60-bit collision merges the same two grams in every
 * engine, so cross-engine parity is exact by construction.
 *
 * Scale shape: explode n-grams → ONE hash-agg on (group, gram-hash)
 * (high-cardinality composite key, map-side partials) → one skinny
 * per-group agg. No windows, no driver state. `10⁶·distinct` stays in
 * long up to ~9·10¹² distinct grams per group (documented bound).
 *
 * Output: (group, total_ngrams, distinct_ngrams, singleton_ngrams,
 * ttr_micro = ⌊10⁶·distinct/total⌋) — all BIGINT.
 */
object Diversity {

  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String,
                     n: Int): DataFrame = {
    require(n >= 1 && n <= 16, s"n must be in [1, 16], got $n")
    df.select(col(groupCol).as("grp"),
        explode(TextOps.shingles(col(textCol), n)).as("_g"))
      .select(col("grp"), TextOps.portableHash60(col("_g")).as("_h"))
      .groupBy("grp", "_h")
      .agg(count(lit(1)).as("_c"))
      .groupBy("grp")
      .agg(sum("_c").cast("long").as("total_ngrams"),
        count(lit(1)).cast("long").as("distinct_ngrams"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).cast("long")
          .as("singleton_ngrams"))
      .withColumn("ttr_micro",
        expr("(1000000 * distinct_ngrams) div total_ngrams"))
  }
}
