package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-level audit statistics a curation run reports next to its funnel
 * (reference: the QC/reporting surfaces around the dedup and publish
 * flows): vocabulary growth (Heaps' law) and duplicate-group structure.
 *
 * Both are one-or-two hash-agg shapes whose OUTPUT is tiny (10 rows /
 * one row per distinct group size), so they ride along a 100 TB run for
 * the cost of the token/fingerprint aggregation they already share with
 * dedup — no windows over the corpus, no driver-side iteration.
 */
object CorpusStats {

  /**
   * Heaps-law vocabulary growth: the corpus in `nBuckets` equal id slices,
   * per slice the number of NEW token types first seen there (plus their
   * total document frequency), and the cumulative vocabulary size.
   * `tokens` is any array expression over the doc row — unigram tokens
   * for classic Heaps, n-gram shingles for a curve that keeps moving on
   * small fixed vocabularies.
   *
   * Shape: (doc,token) distinct → per-token (min first id, df) hash-agg →
   * bucket groupBy (`nBuckets` rows) → a `nBuckets`-row running sum. The
   * only per-corpus work is the token aggregation; the final window sorts
   * `nBuckets` rows, not the corpus.
   */
  def vocabGrowth(docs: DataFrame, idCol: String, tokens: org.apache.spark.sql.Column,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val toks = docs.select(col(idCol).as("doc"), explode(tokens).as("tok"))
      .distinct()
    val firstSeen = toks.groupBy("tok")
      .agg(min("doc").as("first_doc"), count(lit(1)).cast("long").as("df"))
    // id-space size as a broadcast 1-row bound (ids need not be dense:
    // the curve is over the id RANGE, which both engines replay exactly)
    val bound = docs.agg((max(col(idCol)) + 1).cast("long").as("n_ids"))
    // 1-row broadcast attach as a BroadcastHashJoin (crossJoin would plan
    // a BroadcastNestedLoopJoin, forbidden by the registry plan audit)
    val perBucket = graft.ops.JoinOps.withScalar(firstSeen, bound)
      .select(expr(s"least((first_doc * $nBuckets) div n_ids, ${nBuckets - 1})")
        .cast("long").as("bucket"), col("df"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast("long").as("new_types"),
        sum("df").cast("long").as("new_type_docfreq"))
    perBucket.withColumn("cum_types",
      sum("new_types").over(Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
  }

  /**
   * Per-document n-gram novelty: the fraction of a doc's distinct
   * n-gram shingles whose FIRST corpus occurrence (by id order) is this
   * doc — the duplication/memorization audit from the dataset-analysis
   * literature (a low-novelty doc is mostly recycled text, even when no
   * single near-dup partner exists). Docs shorter than n tokens have no
   * shingles and are absent from the output.
   *
   * Shape: explode → per-shingle min-id hash-agg → one equi-join back on
   * the shingle → per-doc hash-agg. Everything partitions on the shingle
   * or the id — no windows, no all-pairs.
   */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
      explode(array_distinct(TextOps.shingles(col(textCol), n))).as("sh"))
    val first = sh.groupBy("sh").agg(min("doc").as("first_doc"))
    sh.join(first, "sh")
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_shingles"),
        sum(when(col("first_doc") === col("doc"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_shingles"), 6))
  }

  /**
   * Per-source consecutive-document n-gram overlap — the "is this source
   * a template mill?" crawl diagnostic: a source whose adjacent documents
   * (in id order) share most of their shingles is boilerplate-heavy and a
   * near-dup-cluster factory downstream. Output per source: pair count,
   * mean adjacent Jaccard (6-dp decimal-summed — engine-exact), and the
   * count of pairs above `highThreshold`.
   *
   * Scale note: one shuffle, partitioned by source — adjacency is the
   * semantic unit, and the aggregate is a sum/count, so a skewed giant
   * source can be split into id-range blocks and partial-summed (only
   * each block-boundary pair needs stitching); the per-source partition
   * here is the direct form.
   */
  def consecutiveOverlap(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, n: Int = 3, highThreshold: Double = 0.5): DataFrame = {
    val w = Window.partitionBy("_src").orderBy("_id")
    val sh = docs.select(col(idCol).as("_id"), col(srcCol).as("_src"),
      array_distinct(TextOps.shingles(col(textCol), n)).as("sh"))
    val pairs = sh.withColumn("psh", lag("sh", 1).over(w))
      .filter(col("psh").isNotNull && size(col("sh")) > 0 && size(col("psh")) > 0)
      .withColumn("inter", size(array_intersect(col("sh"), col("psh"))).cast("long"))
      .withColumn("uni",
        (size(col("sh")) + size(col("psh"))).cast("long") - col("inter"))
      .withColumn("j", round(col("inter") / col("uni"), 6))
    pairs.groupBy(col("_src").as(srcCol))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        round(sum(col("j").cast("decimal(18,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_jaccard"),
        sum(when(col("j") >= highThreshold, 1L).otherwise(0L))
          .cast("long").as("n_high"))
  }

  /**
   * Per-source log2 token-length histogram — the packing/context-window
   * planner's input: how sequence lengths distribute per source, and how
   * many tokens sit in each band. Bucket = floor(log2(tokens)) computed
   * EXACTLY as binary-digit count (length(bin(t)) - 1, no floating log
   * at power-of-two boundaries); empty docs land in bucket -1. One
   * hash-agg over (source, bucket) — map-side partials do the work.
   */
  def lengthHistogram(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val t = coalesce(TextOps.tokenCount(col(textCol)), lit(0L))
    docs.select(col(srcCol), t.as("_t"))
      .withColumn("bucket",
        when(col("_t") <= 0, lit(-1L))
          .otherwise((length(bin(col("_t"))) - 1).cast("long")))
      .groupBy(col(srcCol), col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("_t").cast("long").as("n_tokens"),
        min("_t").cast("long").as("min_tokens"),
        max("_t").cast("long").as("max_tokens"))
  }

  /**
   * Duplicate-group size histogram + keep-first dedup savings: one row per
   * distinct group size with the number of groups, docs, redundant docs,
   * and the total `weightCol` (e.g. chars or tokens) a keep-smallest-id
   * dedup would delete. The keeper's weight is selected with `min_by`
   * (deterministic: `idCol` is unique), so "removable weight" is exact,
   * not an average approximation.
   */
  def dupSizeHistogram(df: DataFrame, keyCol: String, idCol: String,
      weightCol: String): DataFrame = {
    val groups = df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("group_size"),
        sum(col(weightCol)).cast("long").as("total_w"),
        min_by(col(weightCol), col(idCol)).cast("long").as("keeper_w"))
    groups.groupBy(col("group_size"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        (sum("group_size") - count(lit(1))).cast("long").as("n_redundant_docs"),
        sum(col("total_w") - col("keeper_w")).cast("long").as("removable_weight"))
  }

  /**
   * Lexical-diversity report per source: type-token ratio and distinct
   * n-gram ratio (the "self-repetition" / distinct-n metric — a corpus
   * slice whose distinct-4gram ratio collapses is template-mill output
   * even when no two whole docs near-dup). Complements the per-doc
   * novelty audit ([[ngramNovelty]]) with the per-SOURCE aggregate a mix
   * planner compares across crawls.
   *
   * Shape: one token explode feeds both measures; each is a two-level
   * hash-agg — (source, gram) distinct-style agg, then source — so the
   * heavy key is (source, gram), never a corpus-wide distinct. Output is
   * one row per source. The two ratios are exact-BIGINT divisions rounded
   * at 6 dp.
   */
  def ngramDiversity(docs: DataFrame, srcCol: String, textCol: String,
      n: Int = 4): DataFrame = {
    require(n >= 2, "n must be >= 2 (unigrams are the TTR term)")
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(srcCol).as("source"),
        filter(TextOps.whitespaceTokens(lower(col(textCol))),
          t => length(t) > 0).as("_tk"))
      .filter(size(col("_tk")) > 0)
    val uni = toks.select(col("source"), explode(col("_tk")).as("g"))
      .groupBy("source", "g").agg(count(lit(1)).cast("long").as("c"))
      .groupBy("source")
      .agg(sum("c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"))
    val grams = toks
      .filter(size(col("_tk")) >= n)
      .select(col("source"),
        explode(transform(
          sequence(lit(1), size(col("_tk")) - (n - 1)),
          i => array_join(slice(col("_tk"), i, lit(n)), " "))).as("g"))
      .groupBy("source", "g").agg(count(lit(1)).cast("long").as("c"))
      .groupBy("source")
      .agg(sum("c").cast("long").as("n_ngrams"),
        count(lit(1)).cast("long").as("n_distinct_ngrams"))
    uni.join(grams, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_distinct_ngrams"), lit(0L)).as("n_distinct_ngrams"),
        round(col("n_distinct_ngrams").cast("double") / col("n_ngrams"), 6)
          .as("distinct_ngram_ratio"))
  }

  /**
   * Corpus-level CLIPPED n-gram precision (the BLEU-1/BLEU-2 core,
   * Papineni et al. 2002) between each doc and its predecessor in the
   * same source — the MULTISET-counting eval twin of
   * [[consecutiveOverlap]]'s distinct-set Jaccard: clipped counts credit
   * a candidate n-gram only up to its count in the reference, which is
   * what makes "the the the the" score 2/4 against "the cat the dog"
   * instead of 4/4. The same function evaluates generation output against
   * references when the pair column IS (candidate, reference); the
   * adjacent-doc registration is the self-supervised crawl diagnostic.
   *
   * Corpus-level = Σ clipped / Σ candidate n-grams per source (BLEU's
   * aggregation — NOT the mean of per-pair ratios, which over-weights
   * short docs). Exact integer numerators/denominators are emitted next
   * to the 6-dp ratios so the oracle compares integers, not float sums.
   *
   * Scale shape: ONE exchange on the source key (the lag window), then
   * pair-local array lambdas — clipping never joins or re-shuffles; the
   * per-source rollup reuses the window's partitioning. Clipping is
   * O(|distinct grams| · |doc|) per pair on bound array columns (no
   * re-tokenization inside lambdas).
   */
  def ngramPrecisionEval(docs: DataFrame, idCol: String, srcCol: String,
                         textCol: String): DataFrame = {
    val w = Window.partitionBy("_src").orderBy("_id")
    // multiset token/bigram arrays (duplicates preserved — BLEU is
    // multiset counting, array_distinct would change the metric).
    // FILTERED split, not raw whitespaceTokens: a blank doc must be an
    // empty array the size>0 guard excludes, not the [""] split artifact
    // (which would count phantom ""-gram pairs the oracle's list_filter
    // drops)
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val base = docs.select(col(idCol).as("_id"), col(srcCol).as("_src"),
      toks.as("t1"), TextOps.shingles(col(textCol), 2).as("t2"))
    val pairs = base
      .withColumn("r1", lag("t1", 1).over(w))
      .withColumn("r2", lag("t2", 1).over(w))
      .filter(col("r1").isNotNull && size(col("t1")) > 0 && size(col("r1")) > 0)
    def clipped(cand: Column, ref: Column): Column =
      aggregate(array_distinct(cand), lit(0L), (acc, g) =>
        acc + least(size(filter(cand, x => x === g)),
          size(filter(ref, x => x === g))).cast("long"))
    pairs
      .select(col("_src"),
        clipped(col("t1"), col("r1")).as("c1"), size(col("t1")).cast("long").as("d1"),
        clipped(col("t2"), col("r2")).as("c2"), size(col("t2")).cast("long").as("d2"))
      .groupBy(col("_src").as(srcCol))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum("c1").cast("long").as("p1_num"), sum("d1").cast("long").as("p1_den"),
        sum("c2").cast("long").as("p2_num"), sum("d2").cast("long").as("p2_den"))
      .select(col(srcCol), col("n_pairs"),
        col("p1_num"), col("p1_den"), col("p2_num"), col("p2_den"),
        round(col("p1_num").cast("double") / col("p1_den"), 6).as("p1"),
        when(col("p2_den") > 0,
          round(col("p2_num").cast("double") / col("p2_den"), 6)).as("p2"))
  }

  /**
   * ROUGE-L (Lin 2004, public) per source over the SAME adjacent
   * candidate/reference pairing as [[ngramPrecisionEval]] — the
   * subsequence-based eval next to BLEU-style clipped n-gram precision:
   * LCS rewards in-order coverage without requiring contiguity, so
   * reordered-but-faithful text scores where bigram precision collapses.
   *
   * LCS runs in the native [[LcsLen]] expression (codegen'd O(m·n) DP —
   * a HOF fold cannot carry the DP row's left neighbor), over sequences
   * TRUNCATED to `maxTokens` (prefix-ROUGE, the documented eval-cost cap:
   * the DP is quadratic, so the cap — not the corpus — bounds per-row
   * work; the oracle replays the same truncation). Micro-averaged per
   * source: P = ΣLCS/Σ|cand|, R = ΣLCS/Σ|ref|, F = 2ΣLCS/(Σ|cand|+Σ|ref|),
   * all from exact integer sums rounded to 6 dp.
   *
   * Scale shape: one window shuffle on the source key (the lag pairing),
   * then a partial-agg rollup on the same key — no joins, no second
   * shuffle; per-row cost is capped at maxTokens². Output: one row per
   * source.
   */
  def rougeLBySource(docs: DataFrame, idCol: String, srcCol: String,
                     textCol: String, maxTokens: Int = 40): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be positive")
    val w = Window.partitionBy("_src").orderBy("_id")
    val toks = slice(filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0), 1, maxTokens)
    val base = docs.select(col(idCol).as("_id"), col(srcCol).as("_src"), toks.as("t"))
    val pairs = base.withColumn("r", lag("t", 1).over(w))
      .filter(col("r").isNotNull && size(col("t")) > 0 && size(col("r")) > 0)
    import org.apache.spark.sql.GraftExpressionBridge._
    val lcs = column(LcsLen(expression(col("t")), expression(col("r"))))
    pairs
      .select(col("_src"), lcs.cast("long").as("lcs"),
        size(col("t")).cast("long").as("clen"), size(col("r")).cast("long").as("rlen"))
      .groupBy(col("_src").as(srcCol))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum("lcs").cast("long").as("lcs_sum"),
        sum("clen").cast("long").as("cand_sum"),
        sum("rlen").cast("long").as("ref_sum"))
      .select(col(srcCol), col("n_pairs"), col("lcs_sum"), col("cand_sum"), col("ref_sum"),
        round(col("lcs_sum").cast("double") / col("cand_sum"), 6).as("rouge_p"),
        round(col("lcs_sum").cast("double") / col("ref_sum"), 6).as("rouge_r"),
        round(lit(2.0) * col("lcs_sum") / (col("cand_sum") + col("ref_sum")), 6).as("rouge_f"))
  }

  /**
   * Flesch-Kincaid readability (Kincaid et al. 1975 — the grade-level
   * curation gate complement to the Gopher heuristics) in EXACT integer
   * micro-units. Counts per non-blank doc over lowercased text:
   * words = whitespace tokens, sentences = max(1, runs of [.!?]),
   * syllables = vowel-group runs [aeiouy]+ plus one per vowel-less word
   * (the standard min-1-per-word heuristic). Both scores ride one
   * common-denominator rational, sign-split integer division (the
   * a25/l89 ULP rule — no doubles anywhere):
   *   grade = 0.39·W/S + 11.8·Y/W − 15.59
   *   ease  = 206.835 − 1.015·W/S − 84.6·Y/W
   * Expression-only over the scan — zero shuffles; every count and both
   * divisions replay exactly in ANSI SQL.
   */
  def readabilityStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col("_t"), "\\s+")
    val counts = df
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), lower(trim(col(textCol))).as("_t"))
      .select(col("doc_id"),
        size(toks).cast("long").as("w"),
        greatest(lit(1L),
          size(regexp_extract_all(col("_t"), lit("[.!?]+"), lit(0))).cast("long"))
          .as("s"),
        (size(regexp_extract_all(col("_t"), lit("[aeiouy]+"), lit(0))).cast("long") +
          size(filter(toks, t => !t.rlike("[aeiouy]"))).cast("long")).as("y"))
    // numerators ride DECIMAL(38,0): in int64, 206835000·s·w wraps once
    // s·w exceeds ~4.5·10¹⁰ (a multi-million-word document) — decimal
    // headroom holds to w ≈ 10¹⁶ tokens/doc, i.e. any physical document.
    // `div` on decimals still returns BIGINT, so the output stays exact
    // integer micro-units and the DuckDB replay (HUGEINT) is unchanged
    val (wD, sD, yD) = (col("w").cast("decimal(20,0)"),
      col("s").cast("decimal(20,0)"), col("y").cast("decimal(20,0)"))
    val withNum = counts.select(col("doc_id"), col("w"), col("s"), col("y"),
      (lit(390000L) * wD * wD + lit(11800000L) * yD * sD
        - lit(15590000L) * sD * wD).as("gnum"),
      (lit(206835000L) * sD * wD - lit(1015000L) * wD * wD
        - lit(84600000L) * yD * sD).as("en"),
      (sD * wD).as("den"))
    withNum.select(col("doc_id"), col("w").as("n_words"), col("s").as("n_sentences"),
      col("y").as("n_syllables"),
      when(col("gnum") < 0, -expr("(-gnum) div den"))
        .otherwise(expr("gnum div den")).as("fk_grade_micro"),
      when(col("en") < 0, -expr("(-en) div den"))
        .otherwise(expr("en div den")).as("ease_micro"))
  }
}
