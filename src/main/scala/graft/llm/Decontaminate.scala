package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag corpus documents sharing word n-grams
 * with an evaluation/benchmark set (the GPT-3-style 13-gram collision
 * check, parameterized n). A training pipeline runs this before every
 * release — leaked eval data silently inflates downstream scores.
 *
 * Scale shape: both sides reduce to DISTINCT hashed shingles; the
 * benchmark side is small by definition and is broadcast, so the whole
 * check is one scan of the corpus with a broadcast-hash semi-side — no
 * shuffle of corpus text, no all-pairs anything. Hashes are the portable
 * md5-derived 60-bit family, so the DuckDB oracle replays the identical
 * check ([[graft.queries.TextOracles.decontaminateSql]]).
 */
object Decontaminate {

  /** Distinct (id, shingleHash) pairs of `n`-gram shingles. */
  private def shingleHashes(df: DataFrame, textCol: String, idCol: String,
                            n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(
          TextOps.shingles(col(textCol), n),
          s => TextOps.portableHash60(s)))).as("h"))

  /**
   * Corpus docs sharing ≥ 1 distinct `n`-gram with the benchmark set:
   * (doc_id, n_shared) where n_shared counts the distinct collided
   * shingles — the triage signal (1 shared 5-gram is noise at small n,
   * hundreds is a leak).
   */
  def flaggedDocs(corpus: DataFrame, bench: DataFrame, textCol: String,
                  idCol: String, n: Int): DataFrame = {
    val ch = shingleHashes(corpus, textCol, idCol, n)
    val bh = broadcast(shingleHashes(bench, textCol, idCol, n)
      .select("h").distinct())
    // ch is distinct per (doc_id, h) by construction (array_distinct before
    // the explode) and bh is distinct — so the join emits each collided
    // (doc_id, h) exactly once and count(*) IS the distinct count, without
    // countDistinct's expand + second aggregation pass
    ch.join(bh, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_shared"))
  }

  /**
   * Per-document contamination FRACTION: of a doc's distinct `n`-gram
   * shingles, what share also occurs in the benchmark set. [[flaggedDocs]]
   * is the binary triage; this is the number a release gate thresholds on
   * (e.g. drop docs > 20% contaminated, keep-but-tag above 0%). Emits one
   * row per corpus doc with ≥ 1 shingle, ZERO-shared docs included —
   * a gate needs the clean docs' zeros, not just the hits.
   *
   * Same scale shape as [[flaggedDocs]]: one corpus scan, benchmark side
   * broadcast; the fraction folds into the same single aggregation (flag
   * from the left join, no second pass, no countDistinct).
   */
  def contaminationScore(corpus: DataFrame, bench: DataFrame, textCol: String,
                         idCol: String, n: Int): DataFrame = {
    val ch = shingleHashes(corpus, textCol, idCol, n)
    val bh = broadcast(shingleHashes(bench, textCol, idCol, n)
      .select("h").distinct().withColumn("_hit", lit(1L)))
    ch.join(bh, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_shingles"),
        coalesce(sum(col("_hit")), lit(0L)).cast("long").as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles").cast("double"), 6)
          .as("contamination"))
  }
}
