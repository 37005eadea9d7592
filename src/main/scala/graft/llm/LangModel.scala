package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Statistical language-model quality scoring, CCNet-style (Wenzek et al.
 * 2019, public): score every document by its per-token surprisal under a
 * bigram model — low average surprisal ≈ fluent in-distribution text, high
 * ≈ boilerplate, gibberish, or wrong-language. CCNet trains the reference
 * LM offline (KenLM); here the corpus scores itself in ONE lazy plan —
 * the self-scoring form a data pipeline uses to find its own outliers.
 *
 * Model: add-one-smoothed bigram with a BOS marker per document,
 * `P(w|prev) = (c2(prev,w) + 1) / (c1(prev) + V)`, all counts corpus-wide
 * exact longs, V = distinct token count. Per-token surprisal −ln P rounds
 * to 6 dp and sums in DECIMAL(18,6) (the registry-wide order-independent
 * double-sum rule), so the doc score is engine-reproducible.
 *
 * Scale shape: the bigram stream is built expression-side (BOS-prepend +
 * zip — no self-join of tokens on position) and exploded once; both count
 * tables ride WINDOWS over that one stream (partition (prev,w), then
 * prev) instead of groupBy-and-join-back arms that would recompute the
 * explode (no cross-arm CSE). V is a one-row aggregate joined on a
 * NON-FOLDABLE constant key (BroadcastHashJoin, never a cross join). Two
 * corpus scans total (stream + the skinny V aggregate), three exchanges
 * ((prev,w) → prev → doc_id). Window skew on a stopword `prev` is a
 * per-partition sort — disk-spillable, the same envelope as the inverted
 * index.
 *
 * Output: (doc_id, n_bigrams, nll, avg_nll) — one row per doc with at
 * least one token; nll = Σ round(−ln P, 6) exactly, avg_nll = nll / n.
 */
object LangModel {

  /** BOS marker: a control char whitespace-split tokens can never equal
    * (STX, `chr(2)` on the DuckDB side). */
  val Bos = "\u0002"

  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = filter(split(trim(lower(col(textCol))), "\\s+"), t => length(t) > 0)
    // prev_i = BOS for i=1, else token_{i-1}: a zip of (BOS ++ tk[0, n-1))
    // with tk — expression-only, no positional self-join
    val prevArr = concat(array(lit(Bos)), slice(col("_tk"), lit(1), greatest(size(col("_tk")) - 1, lit(0))))
    val stream = df
      .select(col(idCol).as("doc_id"), tk.as("_tk"))
      .filter(size(col("_tk")) > 0)
      .select(col("doc_id"), explode(arrays_zip(prevArr.as("prev"), col("_tk").as("w"))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.w").as("w"))
    val counted = stream
      .withColumn("c2", count(lit(1)).over(Window.partitionBy("prev", "w")).cast("long"))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("prev")).cast("long"))
    val vocab = stream.agg(countDistinct(col("w")).cast("long").as("v"))
      .withColumn("_k", pmod(xxhash64(col("v")), lit(1)))
    counted
      .withColumn("_k", pmod(xxhash64(col("doc_id")), lit(1)))
      .join(broadcast(vocab), "_k")
      .select(col("doc_id"),
        round(lit(0.0) - log((col("c2") + 1L) / (col("c1") + col("v"))), 6)
          .cast("decimal(18,6)").as("_s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("_s")).cast("double").as("nll"))
      .select(col("doc_id"), col("n_bigrams"), col("nll"),
        (col("nll") / col("n_bigrams")).as("avg_nll"))
  }

  /**
   * Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
   * Goodman 1998's interpolated form) — the smoothing family KenLM
   * implements, i.e. the ACTUAL model behind CCNet's perplexity gate,
   * next to [[bigramSurprisal]]'s add-one strawman. Absolute discount
   * `D` off every seen bigram, mass re-spent on the CONTINUATION
   * unigram (how many distinct contexts a word follows — "Francisco"
   * is frequent but only ever follows "San", so its continuation
   * probability is tiny):
   *
   *   P(w|prev) = (max(c(prev,w) − D, 0) + D·N1+(prev·)·Pcont(w)) / c(prev)
   *   Pcont(w)  = N1+(·w) / N1+(··)
   *
   * Per `prev`, the probabilities sum to exactly 1 over the vocabulary
   * (spec-checked) — a PROPER distribution, unlike add-one's V-inflated
   * denominators. Self-scoring keeps every scored bigram seen (c ≥ 1),
   * so no OOV path is needed.
   *
   * Determinism: all inputs to each term are exact corpus-wide longs;
   * the float expression is mirrored operation-for-operation by the
   * oracle (IEEE +,−,×,÷ are correctly rounded on both engines), each
   * term rounds to 6 dp into DECIMAL(18,6), and sums are exact.
   *
   * Scale shape: the one exploded bigram stream carries all count
   * windows — (prev,w) types/counts, prev totals, w continuation counts
   * — with the distinct-type flag a row_number==1 marker (no
   * countDistinct window, which Spark lacks); N1+(··) is a one-row agg
   * joined on a non-foldable key (BHJ). Four exchanges total
   * ((prev,w) → prev → w → doc), all token-keyed and spillable.
   */
  def kneserNeyScores(df: DataFrame, idCol: String, textCol: String,
                      discount: Double = 0.75): DataFrame = {
    val tk = filter(split(trim(lower(col(textCol))), "\\s+"), t => length(t) > 0)
    val prevArr = concat(array(lit(Bos)), slice(col("_tk"), lit(1), greatest(size(col("_tk")) - 1, lit(0))))
    val stream = df
      .select(col(idCol).as("doc_id"), tk.as("_tk"))
      .filter(size(col("_tk")) > 0)
      .select(col("doc_id"), explode(arrays_zip(prevArr.as("prev"), col("_tk").as("w"))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.w").as("w"))
    // one distinct-type marker per (prev,w): which row wins the tie is
    // nondeterministic, but the n1p/n1c SUMS over the markers are not
    val counted = stream
      .withColumn("c2", count(lit(1)).over(Window.partitionBy("prev", "w")).cast("long"))
      .withColumn("_first",
        when(row_number().over(Window.partitionBy("prev", "w").orderBy("doc_id")) === 1, 1L)
          .otherwise(0L))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("prev")).cast("long"))
      .withColumn("n1p", sum(col("_first")).over(Window.partitionBy("prev")).cast("long"))
      .withColumn("n1c", sum(col("_first")).over(Window.partitionBy("w")).cast("long"))
    val tot = stream.select(col("prev"), col("w")).distinct()
      .agg(count(lit(1)).cast("long").as("nt"))
      .withColumn("_k", pmod(xxhash64(col("nt")), lit(1)))
    val disc = greatest(col("c2").cast("double") - lit(discount), lit(0.0))
    val cont = lit(discount) * col("n1p").cast("double") * col("n1c").cast("double") /
      col("nt").cast("double")
    val p = (disc + cont) / col("c1").cast("double")
    counted
      .withColumn("_k", pmod(xxhash64(col("doc_id")), lit(1)))
      .join(broadcast(tot), "_k")
      .select(col("doc_id"),
        round(lit(0.0) - log(p), 6).cast("decimal(18,6)").as("_s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("_s")).cast("double").as("kn_nll"))
      .select(col("doc_id"), col("n_bigrams"), col("kn_nll"),
        (col("kn_nll") / col("n_bigrams")).as("avg_kn_nll"))
  }

  /**
   * CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
   * 2019 §4.3): per language, rank documents by average surprisal and
   * split into terciles — "head" (most fluent third) is what the pretrain
   * mix keeps at full weight, "tail" gets downsampled or dropped. Output
   * is the per-(lang,bucket) summary the mix planner reads: doc count,
   * exact token mass, and the mean per-doc avg_nll.
   *
   * Scale shape: rides [[bigramSurprisal]]'s one-stream plan, then ONE
   * window (partition lang, order avg_nll) for NTILE and one hash-agg —
   * per-language sort is partition-local and spillable. Ties order by
   * doc_id so tercile boundaries are engine-deterministic; the mean
   * rounds each double at 6 dp and sums in DECIMAL (registry rule).
   */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String, langCol: String): DataFrame = {
    val scored = bigramSurprisal(df, idCol, textCol)
      .join(df.select(col(idCol).as("doc_id"), col(langCol).as("lang")), "doc_id")
    val byLang = Window.partitionBy("lang").orderBy(col("avg_nll"), col("doc_id"))
    scored
      .withColumn("_t", ntile(3).over(byLang))
      .withColumn("bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")), col("_t")))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum("n_bigrams").cast("long").as("n_bigrams"),
        round(sum(round(col("avg_nll"), 6).cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_avg_nll"))
  }

  /**
   * PMI collocation mining (Church & Hanks 1990, public): the corpus's
   * most-associated adjacent word pairs — multiword expressions, named
   * entities, templated boilerplate phrases — ranked by pointwise mutual
   * information over the bigram event space:
   *
   *   PMI(x,y) = ln( p(x,y) / (p(x,·)·p(·,y)) )
   *            = ln( c(x,y)·N / (c(x,·)·c(·,y)) )
   *
   * with BOTH marginals taken from the joint bigram table itself (first-
   * position and second-position counts), so joint and marginals live on
   * one event space — the contingency-table form, no separate unigram
   * pass. A `minCount` support cutoff kills the PMI-loves-rare-pairs
   * pathology; ties break lexically so top-K is total.
   *
   * Cross-engine exactness: `ln` is MONOTONE, so ranking by PMI equals
   * ranking by the rational `c(x,y)·N / (c(x,·)·c(·,y))` — emitted as the
   * exact integer micro-quotient `pmi_ratio_micro = (10⁶·c_pair·n_tot)
   * div (c_x·c_y)` in DECIMAL(38,0) intermediates (no overflow to ~10¹⁶
   * bigrams, vs 2⁵³ for the double path). No libm call anywhere: a
   * `round(ln(x),6)` compare column flips a digit when two libm builds
   * disagree by one ULP at a rounding boundary — this bit the round-9
   * driver run. Callers who want nats apply `ln(micro/1e6)` downstream;
   * order and cut are already fixed by the rational.
   *
   * Scale shape: ONE corpus-wide shuffle (the exploded bigram stream →
   * (w1,w2) hash-agg); marginals are windows over the PAIR table (rows
   * bounded by distinct-bigram count, not corpus size); N is a one-row
   * aggregate joined on a NON-FOLDABLE key (BHJ); top-K plans as
   * TakeOrderedAndProject — no global sort materializes.
   *
   * Output: top-K (w1, w2, c_pair, pmi_ratio_micro) — micro BIGINT.
   */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1, "minCount and topK must be positive")
    val tk = filter(split(trim(lower(col(textCol))), "\\s+"), t => length(t) > 0)
    val prevArr = slice(col("_tk"), lit(1), greatest(size(col("_tk")) - 1, lit(0)))
    val nextArr = slice(col("_tk"), lit(2), greatest(size(col("_tk")) - 1, lit(0)))
    val pairs = df
      .select(tk.as("_tk"))
      .filter(size(col("_tk")) >= 2)
      .select(explode(arrays_zip(prevArr.as("w1"), nextArr.as("w2"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).cast("long").as("c_pair"))
    val cx = Window.partitionBy("w1")
    val cy = Window.partitionBy("w2")
    val marg = pairs
      .withColumn("c_x", sum("c_pair").over(cx).cast("long"))
      .withColumn("c_y", sum("c_pair").over(cy).cast("long"))
    val tot = pairs.agg(sum("c_pair").cast("long").as("n_tot"))
      .withColumn("_k", pmod(xxhash64(col("n_tot")), lit(1)))
    marg
      .filter(col("c_pair") >= minCount)
      .withColumn("_k", pmod(xxhash64(col("c_pair")), lit(1)))
      .join(broadcast(tot), "_k")
      .select(col("w1"), col("w2"), col("c_pair"),
        expr("""CAST((CAST(c_pair AS DECIMAL(38,0)) * n_tot * 1000000)
                div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)""")
          .as("pmi_ratio_micro"))
      .orderBy(col("pmi_ratio_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
