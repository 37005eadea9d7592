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

  /**
   * Scalable entity resolution: best JW match per LEFT RECORD, computed
   * once per DISTINCT name pair. This is the 100 TB form of
   * [[jwBlockedLinkage]] — the pair-level form's output (and its scoring
   * work) is quadratic in name duplication, and real corpora duplicate
   * heavily (boilerplate part names here repeat up to 347× at sf0.1, so
   * pair output grows ~O(n²/|vocab|)). Shape:
   *
   *   1. reduce both sides to distinct names (right side keeps
   *      `min(key)` per name — the deterministic representative);
   *   2. blocked equi-join + JW scoring on the SKINNY distinct tables
   *      (scoring cost bounded by distinct-name collisions, not rows);
   *   3. keep the argmax per left name — rank by (jw DESC, cand_key ASC),
   *      so a cross-name jw tie resolves to the globally smallest key
   *      (min over per-name minima = min over all tied candidates);
   *   4. fan back to records with ONE equi-join on the name (the skinny
   *      best-match table broadcasts at any realistic vocabulary size).
   *
   * Output: one row per left record whose name resolved at ≥
   * `minJwMicro` — (m_key, cand_key, jw_micro, dist); linear in the
   * left table, never in the duplication square.
   */
  def jwResolveBest(spark: SparkSession,
                    left: DataFrame, leftKey: String, leftName: String,
                    right: DataFrame, rightKey: String, rightName: String,
                    minJwMicro: Long): DataFrame = {
    val l = left.select(col(leftKey).as("m_key"), col(leftName).as("m_name"))
    val dm = l.select(col("m_name")).distinct()
    val dr = right.groupBy(col(rightName).as("cand_name"))
      .agg(min(col(rightKey)).as("cand_key"))
    val cond = blockKey(col("m_name")).zip(blockKey(col("cand_name")))
      .map { case (a, b) => a === b }.reduce(_ && _)
    val scored = dm.join(dr, cond)
      .withColumn("jw_micro", JaroWinklerMicro.jwMicroCol(spark, col("m_name"), col("cand_name")))
      .filter(col("jw_micro") >= minJwMicro)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("m_name")).orderBy(col("jw_micro").desc, col("cand_key").asc)
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("m_name"), col("cand_key"), col("jw_micro"),
        levenshtein(col("m_name"), col("cand_name")).cast("long").as("dist"))
    l.join(best, Seq("m_name"))
      .select(col("m_key"), col("cand_key"), col("jw_micro"), col("dist"))
  }

  /** Deterministic "OCR swap" corruption for self-linkage demos/tests:
    * transpose characters 3 and 4 (1-based) — preserves the length and
    * the 2-char blocking prefix, costs exactly one Jaro transposition. */
  def swap34(name: Column, nameSql: String): Column =
    concat(substring(name, 1, 2), substring(name, 4, 1),
      substring(name, 3, 1), expr(s"substring($nameSql, 5)"))
}
