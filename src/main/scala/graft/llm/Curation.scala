package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Composed curation pipeline: the operators prove they COMPOSE, not just
 * pass row-level oracles. Normalize → learned quality gate →
 * opening-fingerprint dedup (keep-first among survivors on the md5 of
 * the first `prefixTokens` normalized tokens — the boilerplate-opening
 * key that catches templated near-identical docs exact-text dedup
 * misses) → per-source funnel report — the end-to-end shape of a
 * training-data ingestion run, and the report a data curator actually
 * reads (how many docs each source lost at each stage, and the
 * surviving token budget).
 *
 * Every stage is the already-oracle-checked operator family: [[TextOps
 * .normalizeText]] (l47), [[QualityClassifier.score]] (l46), md5
 * keep-first dedup (the l1/l14 family), so the composite's DuckDB oracle
 * is the same CTE chain and stays EXACT end to end.
 *
 * Scale shape: normalization is expression-only; the quality gate is one
 * explode + broadcast-weights join + per-doc agg; dedup is one window
 * over md5(norm); the report is one final hash agg on source. No
 * cross-branch recomputation of the tokenize/score work — `score` runs
 * once and joins back by id.
 *
 * Docs whose normalized text has zero tokens carry n_tokens = 0 and fail
 * the gate only if `minLogit` ≥ 0 · bias — they are LEFT-join-preserved
 * so `n_in` counts every input row.
 */
object Curation {

  /** Opening fingerprint: md5 of the first `prefixTokens` normalized
    * tokens — ONE definition shared by [[curationFunnel]] and
    * [[graft.pipelines.RunCuration]]'s row-level path, whose runtime
    * consistency check depends on the two being bit-identical. */
  def openingFingerprint(norm: org.apache.spark.sql.Column,
                         prefixTokens: Int): org.apache.spark.sql.Column =
    md5(array_join(slice(split(trim(lower(norm)), "\\s+"), 1, prefixTokens), " "))

  def curationFunnel(df: DataFrame, idCol: String, textCol: String,
                     sourceCol: String, model: QualityClassifier.Model,
                     minLogit: java.math.BigDecimal,
                     prefixTokens: Int = 8): DataFrame = {
    require(prefixTokens > 0, "prefixTokens must be positive")
    val norm = df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
      TextOps.normalizeText(col(textCol)).as("norm"))
    val scored = QualityClassifier.score(norm, "doc_id", "norm", model, minLogit)
      .select(col("id").as("doc_id"), col("n_tokens"), col("keep"))
    // LEFT join: zero-token docs have no scored row — they count in n_in,
    // never in the gate's survivors
    val q = norm.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("norm"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("keep"), lit(false)).as("keep"))
    // dedup rank rides the SAME pass: partitioning the window by
    // (fingerprint, keep) ranks survivors only, so `final` needs no
    // filter→rank→self-join (which re-ran the whole normalize+score
    // subtree per branch — no cross-arm CSE; this shape scans the corpus
    // twice total instead of six times)
    val w = Window.partitionBy(col("_k"), col("keep")).orderBy(col("doc_id"))
    q.withColumn("_k", openingFingerprint(col("norm"), prefixTokens))
      .withColumn("_rn", row_number().over(w))
      .withColumn("final", col("keep") && col("_rn") === 1)
      .groupBy("source")
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("final"), 1L).otherwise(0L)).as("n_final"),
        sum(when(col("final"), col("n_tokens")).otherwise(0L)).as("tokens_final"))
  }

  /**
   * One INCREMENT of the composed ingest path — the micro-batch /
   * daily-ingest tail of the curation funnel: quality-gated new docs get
   * an admission verdict against the standing corpus via
   * [[Dedup.incrementalDedup]] (l56 shape: corpus pre-reduced to keeper
   * aggregates, batch never shuffles corpus text).
   *
   * `gated` is the OUTPUT of the streaming-safe gate —
   * `(doc_id, norm, n_tokens, keep)` as produced by
   * `QualityClassifier.scoreStreamable(..., carry = Seq("norm"))` — so
   * the normalize→gate stages run INSIDE a Structured Streaming query
   * (stateless, append-safe) and only this corpus-verdict tail runs per
   * micro-batch (`foreachBatch`), where its aggregations are legal. The
   * same call curates a daily batch unchanged.
   *
   * One row per input doc: (doc_id, n_tokens, verdict, dup_of) with
   * verdict ∈ rejected_quality | exact_dup | near_dup | admitted.
   */
  def admitIncrement(gated: DataFrame, corpus: DataFrame,
                     corpusIdCol: String, corpusTextCol: String,
                     shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                     family: MinHashFamily = Xx64Family): DataFrame = {
    val corpusNorm = corpus.select(col(corpusIdCol).as("doc_id"),
      TextOps.normalizeText(col(corpusTextCol)).as("norm"))
    val survivors = gated.filter(col("keep")).select("doc_id", "norm")
    val verdicts = Dedup.incrementalDedup(survivors, corpusNorm, "norm", "doc_id",
      shingleSize, k, bands, family)
    gated.join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(!col("keep"), lit("rejected_quality"))
          .when(col("verdict") === "unique", lit("admitted"))
          .otherwise(col("verdict")).as("verdict"),
        col("dup_of"))
  }

  /**
   * Filter-overlap ablation matrix: for a set of named reject conditions,
   * how many docs fail each PAIR (and how many ONLY that filter) — the
   * redundancy diagnostic a curation team reads before spending compute
   * on a rule ("everything the entropy rule rejects, the quality
   * classifier already rejects" ⇒ drop the rule; "filter X uniquely
   * removes 0 docs" ⇒ it's dead weight). The ablation-table habit of the
   * Gopher/RefinedWeb rule studies, as a query.
   *
   * Output rows (filter_a, filter_b, n_docs):
   *  - diagonal a = b: total docs failing the filter;
   *  - a before b in the DECLARED order: docs failing both;
   *  - (a, "__only__"): docs failing a and nothing else.
   *
   * Scale shape: each doc emits its ≤ k(k+1)/2 failed-pair structs
   * expression-side (k = #filters, a constant) and ONE hash-agg counts
   * them — no self-joins, no windows; 100 TB reduces to ≤ k²+k rows.
   */
  def filterOverlapMatrix(docs: DataFrame,
                          filters: Seq[(String, Column)]): DataFrame = {
    val names = filters.map(_._1)
    require(names.distinct.size == names.size, "filter names must be unique")
    val marked = array(filters.map { case (n, c) =>
      when(coalesce(c, lit(false)), lit(n)).otherwise(lit(null))
    }: _*)
    val flagged = docs
      .select(filter(marked, x => x.isNotNull).as("fails"))
      .filter(size(col("fails")) > 0)
    // (a, a), (a, every later b) per doc — declared order, diagonal incl.
    val pairs = flagged.select(
      explode(flatten(transform(col("fails"), (a, i) =>
        transform(slice(col("fails"), i + 1, size(col("fails"))),
          b => struct(a.as("filter_a"), b.as("filter_b")))))).as("p"),
      (size(col("fails")) === 1).as("_solo"))
    val matrix = pairs.groupBy(col("p.filter_a"), col("p.filter_b"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val only = pairs.filter(col("_solo"))
      .groupBy(col("p.filter_a").as("filter_a"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .select(col("filter_a"), lit("__only__").as("filter_b"), col("n_docs"))
    matrix.unionByName(only)
  }
}
