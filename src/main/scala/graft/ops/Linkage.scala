package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.JaroWinklerMicro

/**
 * Fuzzy record linkage with Jaro–Winkler scoring (Winkler 1990) — the
 * entity-resolution step of a 100 TB curation pipeline (match incoming
 * records against a canonical registry despite typos / OCR swaps).
 *
 * Scale shape (same discipline as j16's levenshtein variant): candidates
 * come from an EQUI join on a cheap blocking key — (2-byte prefix, exact
 * length) here — never an all-pairs theta join, so the plan is a plain
 * shuffle/broadcast hash join and the O(l²)-ish scorer runs only on
 * within-block candidates. At 1000 executors the block key partitions the
 * shuffle; a hot prefix block is an AQE skew-split, not a BNLJ.
 *
 * Scoring is [[graft.llm.JaroWinklerMicro]] — exact integer micro-units,
 * codegen'd, oracle-matched bit-for-bit against DuckDB's
 * `jaro_winkler_similarity` (see that file's doc for the two pinned
 * floating-point caveats and the data asserts LinkageSpec runs).
 */
object Linkage {

  /** (2-char prefix, byte length) blocking key for a name column. */
  def blockKey(name: Column): Seq[Column] =
    Seq(substring(name, 1, 2), length(name))

  /**
   * Blocked fuzzy linkage: join `left` (records to resolve) against
   * `right` (the canonical registry) on the blocking key, score every
   * candidate pair with Jaro–Winkler, keep pairs scoring at least
   * `minJwMicro` (micro-units: 900000 = 0.9). Emits the pair keys, the
   * exact `jw_micro` score, and the plain levenshtein `dist` for audit.
   */
  def jwBlockedLinkage(spark: SparkSession,
                       left: DataFrame, leftKey: String, leftName: String,
                       right: DataFrame, rightKey: String, rightName: String,
                       minJwMicro: Long): DataFrame = {
    val l = left.select(col(leftKey).as("m_key"), col(leftName).as("m_name"))
    val r = right.select(col(rightKey).as("cand_key"), col(rightName).as("cand_name"))
    val cond = blockKey(col("m_name")).zip(blockKey(col("cand_name")))
      .map { case (a, b) => a === b }.reduce(_ && _)
    l.join(r, cond)
      .select(col("m_key"), col("cand_key"),
        JaroWinklerMicro.jwMicroCol(spark, col("m_name"), col("cand_name")).as("jw_micro"),
        levenshtein(col("m_name"), col("cand_name")).cast("long").as("dist"))
      .filter(col("jw_micro") >= minJwMicro)
  }

  /** Deterministic "OCR swap" corruption for self-linkage demos/tests:
    * transpose characters 3 and 4 (1-based) — preserves the length and
    * the 2-char blocking prefix, costs exactly one Jaro transposition. */
  def swap34(name: Column, nameSql: String): Column =
    concat(substring(name, 1, 2), substring(name, 4, 1),
      substring(name, 3, 1), expr(s"substring($nameSql, 5)"))
}
