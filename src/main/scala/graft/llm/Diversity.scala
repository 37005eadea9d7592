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

  /**
   * Duplicate-WEIGHTED sampling (round 13): instead of hard-deleting
   * exact duplicates (l1) or keeping them all, give every document of a
   * size-s duplicate cluster weight 1/s and a deterministic 1/s keep
   * probability — the count-proportional down-weighting used when a
   * document's duplication FREQUENCY is itself signal (RefinedWeb-style
   * curation keeps one copy; loss-weighting trainers want the weight).
   * E[kept per cluster] = 1, and the choice is a pure function of
   * (seed, doc id) — reproducible across engines and retries.
   *
   * Shape: one hash-agg on the 60-bit portable text fingerprint for
   * cluster sizes, one shuffle join back on the fingerprint (both keyed
   * on the high-cardinality fingerprint — parallel at any scale), all
   * arithmetic integer (threshold = ⌊2⁶⁰/s⌋; P(h < t) ≈ 1/s exactly
   * replayable).
   *
   * Output: (id, cluster_size, weight_micro = ⌊10⁶/s⌋, kept).
   */
  def dupWeightedSample(df: DataFrame, idCol: String, textCol: String,
                        seed: String = "d1"): DataFrame = {
    val sep = "\u001f"
    require(!seed.contains(sep), "seed must not contain the unit separator")
    val fp = df.select(col(idCol), TextOps.portableHash60(col(textCol)).as("_fp"))
    val sizes = fp.groupBy("_fp").agg(count(lit(1)).cast("long").as("cluster_size"))
    val keepHash = TextOps.portableHash60(
      concat(lit(seed + sep), col(idCol).cast("string")))
    fp.join(sizes, Seq("_fp"))
      .select(col(idCol), col("cluster_size"),
        expr("1000000L div cluster_size").as("weight_micro"),
        // integer div (Column./ is DOUBLE division); 2^60 threshold
        (keepHash < expr("1152921504606846976L div cluster_size")).as("kept"))
  }
}
