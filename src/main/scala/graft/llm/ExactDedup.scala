package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ScanPar.widen

/**
 * Exact / line / span deduplication family (split from Dedup.scala,
 * round 11 — pure mechanical move on the family seam, mixed back into
 * [[Dedup]] so every call site keeps reading `Dedup.exactDedup`):
 * fingerprint-exact dedup with min-id and keep-best keepers, corpus-level
 * line dedup (CCNet/RefinedWeb boilerplate removal), and repeated-span
 * scrubbing (Lee et al. 2021 exact-substring dedup).
 */
private[llm] trait ExactDedupOps {

  /** Exact-dup fingerprint: md5 of the raw text (hex string). */
  def exactFingerprint(text: Column): Column = md5(text.cast("binary"))

  /**
   * Exact dedup: one row per fingerprint group — the minimum id is kept,
   * with the group's duplicate count. Single hash-shuffle on the
   * fingerprint; map-side partial aggregation applies.
   */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(exactFingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).cast("long").as("dup_cnt"))

  /** [[exactDedupKeepBest]] merit ceiling (exclusive): 2^20. */
  val KeepBestMeritCap: Long = 1L << 20
  /** [[exactDedupKeepBest]] id ceiling (exclusive): 2^33. */
  val KeepBestIdCap: Long = 1L << 33

  /**
   * Exact dedup with a PRIORITY keeper: one row per fingerprint group
   * keeping the member that MAXIMIZES `meritCol` (quality score, doc
   * length, source trust rank — CCNet keeps the best-scored copy, the
   * reference keeps RefSeq rows by status rank, refseq.py:append_ranks),
   * ties broken by the SMALLEST id. Where [[exactDedup]]'s keep-first is
   * an arbitrary-but-stable winner, this is the curation form: when five
   * crawls carry the same article, keep the longest / cleanest copy.
   *
   * The keeper rides the ONE fingerprint hash-aggregation as a packed
   * long `(cap − merit)·2³³ + id` whose MIN is "best merit, then smallest
   * id" — no window sort, no second join, map-side partials apply, and
   * the arithmetic is pure integers so a DuckDB oracle replays it bit for
   * bit. Contract (guarded per row): 0 ≤ merit < 2²⁰, 0 ≤ id < 2³³ —
   * merits are scores/lengths (rescale upstream if wider), ids at 100 TB
   * needing > 2³³ should dedup on a surrogate id and map back.
   *
   * Output: (fingerprint, keep_id, keep_merit, dup_cnt).
   */
  def exactDedupKeepBest(df: DataFrame, textCol: String, idCol: String,
                         meritCol: String): DataFrame = {
    val merit = col(meritCol).cast("long")
    val id = col(idCol).cast("long")
    val packed = when(
      merit.between(0, KeepBestMeritCap - 1) && id.between(0, KeepBestIdCap - 1),
      (lit(KeepBestMeritCap) - merit) * lit(KeepBestIdCap) + id)
      .otherwise(raise_error(concat(
        lit(s"exactDedupKeepBest: merit/id out of range (merit < $KeepBestMeritCap, id < $KeepBestIdCap): "),
        merit, lit("/"), id)))
    df.groupBy(exactFingerprint(col(textCol)).as("fingerprint"))
      .agg(min(packed).as("_pk"), count(lit(1)).cast("long").as("dup_cnt"))
      .select(col("fingerprint"),
        col("_pk").bitwiseAND(lit(KeepBestIdCap - 1)).as("keep_id"),
        (lit(KeepBestMeritCap) - shiftright(col("_pk"), 33)).as("keep_merit"),
        col("dup_cnt"))
  }

  /**
   * Corpus-level LINE deduplication (the CCNet/RefinedWeb boilerplate
   * step): a line whose trimmed form appears in ≥ `minDf` DISTINCT
   * documents is boilerplate (nav bars, cookie banners, license headers)
   * and is removed from EVERY document; remaining lines are rejoined in
   * original order. Blank lines are structural, never counted or removed.
   * Intra-document repeats don't count toward `minDf` — the signal is
   * cross-document repetition.
   *
   * Returns one row per non-null-text document:
   * (doc_id, clean_text, n_lines, n_removed) — docs whose every line was
   * boilerplate come back with clean_text = ''.
   *
   * Scale shape: two corpus passes, both embarrassingly standard — pass 1
   * explodes lines and hash-aggregates document frequency (map-side
   * partials; one shuffle on the trimmed-line key), pass 2 anti-joins the
   * BROADCAST heavy-line set (boilerplate vocabularies are tiny by
   * definition — it's the lines that repeat across the corpus) and
   * reassembles per doc (one shuffle on doc id). No all-pairs anything;
   * at 100 TB the only growing state is the heavy set, bounded by how
   * much distinct boilerplate exists, not by corpus size.
   */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"minDf=$minDf would remove every non-blank line")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("_text"))
    // -1 limit: trailing empty lines survive the split on both engines
    val lines = base.select(col("doc_id"),
      posexplode(split(col("_text"), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("k", trim(col("line")))
    val heavy = lines.filter(col("k") =!= "")
      .groupBy("k").agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select("k")
    val kept = lines.join(broadcast(heavy), Seq("k"), "left_anti")
    val agg = kept.groupBy("doc_id").agg(
      graft.ops.Agg.stringAggOrderedBy(col("line"), col("pos"), "\n").as("clean"),
      count(lit(1)).cast("long").as("n_kept"))
    base.select(col("doc_id"),
        size(split(col("_text"), "\n", -1)).cast("long").as("n_lines"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"))
  }

  /**
   * Repeated-SPAN scrubbing — the token-level generalization of
   * [[lineDedup]] and the bucketed approximation of exact-substring dedup
   * (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
   * Better"): any maximal run of tokens covered by word `n`-grams that
   * occur in ≥ `minDf` DISTINCT documents is removed from every document
   * (long verbatim repeats — licenses, templates, quoted chunks — are
   * exactly runs of repeated n-grams). Token-exact and case-sensitive;
   * docs shorter than `n` tokens are untouched; intra-document repeats
   * don't count toward `minDf`. Suffix arrays give the reference algorithm
   * single-occurrence precision, but they're a global sequential
   * structure; n-gram DF + position masking is the shuffle-native form,
   * over-approximating only in that ALL occurrences of a repeated span are
   * scrubbed (the [[lineDedup]] convention).
   *
   * Returns (doc_id, clean_text, n_tokens, n_removed) per non-blank doc.
   *
   * Scale shape: one tokens explode + one shingles explode (corpus-linear,
   * map-side-partial DF agg on the shingle string), repeated-shingle join,
   * covered-position expansion bounded by repeated-content volume × n,
   * anti-join + one reassembly shuffle. The repeated-shingle set is NOT
   * assumed broadcastable (unlike boilerplate lines it can grow with
   * heavily-templated corpora) — the join shuffles on the shingle string
   * and AQE may still broadcast it when small.
   */
  def repeatedSpanScrub(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 8, minDf: Int = 2): DataFrame = {
    require(n >= 2, s"span n-grams need n >= 2, got $n")
    require(minDf >= 2, s"minDf=$minDf would scrub every shingle")
    val base = widen(docs)
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), TextOps.whitespaceTokens(col(textCol)).as("_toks"))
    val tok = base.select(col("doc_id"),
      posexplode(col("_toks")).as(Seq("pos", "w")))
    val shingled = base.filter(size(col("_toks")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("_toks")) - n),
          i => array_join(slice(col("_toks"), i + 1, lit(n)), " ")))
          .as(Seq("spos", "s")))
    val heavy = shingled.groupBy("s")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select("s")
    val covered = shingled.join(heavy, "s")
      .select(col("doc_id"),
        explode(sequence(col("spos"), col("spos") + (n - 1))).as("pos"))
      .distinct()
    val kept = tok.join(covered, Seq("doc_id", "pos"), "left_anti")
    val agg = kept.groupBy("doc_id").agg(
      graft.ops.Agg.stringAggOrderedBy(col("w"), col("pos"), " ").as("clean"),
      count(lit(1)).cast("long").as("n_kept"))
    base.select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"))
  }

  /**
   * Deduplicated corpus: keep exactly the min-id row of every exact-dup
   * group (semi-join against [[exactDedup]]'s keep list — the filter step
   * a training-data pipeline applies after grouping).
   */
  def dedupKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactDedup(df, textCol, idCol).select(col("keep_id"))
    df.join(keep, df(idCol) === keep("keep_id"), "left_semi")
  }

}
