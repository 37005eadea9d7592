package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Edit-distance near-dup verification with prefix blocking — the
 * character-level complement to token-shingle Jaccard (l6) and SimHash
 * (l7): short documents (titles, queries, code one-liners) have too few
 * shingles for set-based dedup, but a bounded Levenshtein over cheaply
 * blocked candidates catches their near-identical variants.
 *
 * Scale shape: candidates come from an EQUI-join on the normalized-text
 * prefix (never all-pairs); within a block the per-block rank cap bounds
 * pair count at cap·(cap−1)/2 regardless of block skew (the same
 * `maxBucketSize` discipline as the LSH family — a boilerplate mega-block
 * cannot go quadratic). Levenshtein runs on length-capped text, so the
 * per-pair cost is O(capLen²) constant. One shuffle (block key), one
 * join, no window over the corpus.
 *
 * Determinism: `levenshtein` is exact integer DP on both engines;
 * similarity rounds at 6 dp after an integer division contract
 * (1 − lev/maxLen in DOUBLE from exact BIGINTs).
 */
object EditSim {

  /**
   * Pairs (doc_a < doc_b) sharing a `prefixLen`-char normalized prefix,
   * with Levenshtein distance over `capLen`-truncated normalized text and
   * normalized similarity ≥ `minSim`. Blocks are rank-capped at
   * `blockCap` members (by id — deterministic; dropped members are the
   * block's tail, same policy as the LSH bucket cap).
   */
  def prefixBlockedEditVerify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int = 32,
      capLen: Int = 400,
      blockCap: Int = 16,
      minSim: Double = 0.5): DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    val base = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), substring(norm, 1, capLen).as("t"))
      .filter(length(col("t")) >= 1)
      .withColumn("blk", substring(col("t"), 1, prefixLen))
    // deterministic per-block cap: smallest-id members survive
    val byBlock = org.apache.spark.sql.expressions.Window.partitionBy("blk").orderBy("id")
    val capped = base
      .withColumn("rk", row_number().over(byBlock))
      .filter(col("rk") <= blockCap)
      .drop("rk")
    val a = capped.select(col("blk"), col("id").as("doc_a"), col("t").as("ta"))
    val b = capped.select(col("blk"), col("id").as("doc_b"), col("t").as("tb"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
      .withColumn("max_len",
        greatest(length(col("ta")), length(col("tb"))).cast("long"))
      .withColumn("sim",
        round(lit(1.0) - col("lev").cast("double") / col("max_len").cast("double"), 6))
      .filter(col("sim") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("lev"), col("max_len"), col("sim"))
  }
}
