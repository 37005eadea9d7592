package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The DataFrame-shaped transform family of [[TextOps]] (round-12 file
 * split, pure move, no behavior change): seeded word dropout, T5 span
 * corruption, content-defined chunking, SFT template rendering, sliding
 * windows, fill-in-the-middle, and feature hashing. Mixed into
 * `object TextOps`, so every call site keeps addressing
 * `TextOps.<member>`.
 */
private[llm] trait TextTransforms { this: TextOps.type =>

  /**
   * Seeded word-dropout augmentation: drop `dropPct`% of tokens, the
   * keep-decision a pure function of (seed, doc id, token position) — the
   * classic denoising/robustness augmentation, reproducible across
   * runs/engines/retries exactly like [[Sampling.deterministicSample]]
   * (an RNG-based dropout can never re-materialize the same epoch).
   * Position indexes the EMPTY-FILTERED token array; the index comes from
   * `transform`'s (element, index) lambda — no `sequence(1, size)` that
   * walks DESCENDING on empty docs. Expression-only, zero shuffles.
   *
   * Output: (id, aug_text, n_tokens, n_kept). A doc whose every token
   * drops keeps its row with aug_text '' — augmentation must not silently
   * change corpus membership.
   */
  def wordDropout(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, dropPct: Int,
                  seed: String): org.apache.spark.sql.DataFrame = {
    require(dropPct >= 0 && dropPct <= 100, "dropPct must be 0-100")
    require(!seed.contains(Sampling.SeedSep), "seed must not contain the unit separator")
    val keep = (s: Column) => pmod(portableHash60(
      concat(lit(seed + Sampling.SeedSep), col("id").cast("string"),
        lit(":"), s.getField("i").cast("string"))), lit(100L)) >= dropPct
    df.select(col(idCol).as("id"),
        filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0).as("_tk"))
      .select(col("id"), col("_tk"),
        filter(transform(col("_tk"), (t, i) =>
          struct(t.as("t"), i.as("i"))), keep).as("_kept"))
      .select(col("id"),
        array_join(transform(col("_kept"), _.getField("t")), " ").as("aug_text"),
        size(col("_tk")).cast("long").as("n_tokens"),
        size(col("_kept")).cast("long").as("n_kept"))
  }

  /**
   * T5-style span corruption (Raffel et al. 2020, public): mask token
   * spans, replace each masked RUN with one numbered sentinel in the
   * input, and emit the masked-out tokens behind their sentinels as the
   * target — the (input, target) pair a seq2seq denoising objective
   * trains on. [[wordDropout]] deletes tokens; this op RELOCATES them,
   * which is the difference between an augmentation and a training
   * objective.
   *
   * Corruption decisions are a pure function of (seed, doc, position) —
   * the l55/l28 determinism contract: the same epoch re-materializes on
   * any engine, so the DuckDB oracle replays every sentinel boundary
   * exactly. Masking is iid per token with consecutive masked tokens
   * collapsing into one span (mean span ≈ 1/(1−p); the T5 paper fixes
   * mean span length 3 via an RNG the determinism contract disallows —
   * documented trade).
   *
   * Target format: `<extra_id_0> masked… <extra_id_1> masked… <extra_id_K>`
   * with the final sentinel appended (T5 convention). Unmasked docs emit
   * their input unchanged with an empty target; docs with NO tokens
   * (empty/blank/null text) are ABSENT from the output — a denoising
   * objective has nothing to train on there, and the upstream curation
   * gate drops them anyway (the oracle drops them identically).
   *
   * Scale shape: one posexplode, ONE exchange on the doc key (the lag +
   * running-sum windows and the rebuild groupBy all share it), sentinel
   * numbering is a per-doc running sum — no driver state, no second
   * shuffle.
   */
  def spanCorrupt(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, maskPct: Int,
                  seed: String): org.apache.spark.sql.DataFrame = {
    require(maskPct >= 0 && maskPct <= 100, "maskPct must be 0-100")
    require(!seed.contains(Sampling.SeedSep), "seed must not contain the unit separator")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(filter(split(trim(col(textCol)), "\\s+"),
          t => length(t) > 0)).as(Seq("pos", "tok")))
    val mask = pmod(portableHash60(concat(lit(seed + Sampling.SeedSep),
      col("doc_id").cast("string"), lit(":"), col("pos").cast("string"))),
      lit(100L)) < maskPct
    val staged = toks.withColumn("m", mask)
      .withColumn("rs", col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false)))
      .withColumn("sid",
        (sum(when(col("rs"), 1L).otherwise(0L)).over(w) - 1).cast("long"))
    val sentinel = concat(lit("<extra_id_"), col("sid").cast("string"), lit(">"))
    val inputPiece = when(!col("m"), col("tok")).when(col("rs"), sentinel)
    val targetPiece = when(col("rs"), concat(sentinel, lit(" "), col("tok")))
      .when(col("m"), col("tok"))
    def orderedJoin(piece: Column): Column = array_join(
      transform(array_sort(collect_list(
        when(piece.isNotNull, struct(col("pos"), piece.as("p"))))),
        e => e.getField("p")), " ")
    staged.groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).cast("long").as("n_masked"),
        (max(col("sid")) + 1).cast("long").as("n_spans"),
        orderedJoin(inputPiece).as("input_text"),
        orderedJoin(targetPiece).as("_t"))
      .select(col("doc_id"), col("input_text"),
        when(col("n_spans") > 0,
          concat(col("_t"), lit(" <extra_id_"), col("n_spans").cast("string"), lit(">")))
          .otherwise(lit("")).as("target_text"),
        col("n_tokens"), col("n_masked"), col("n_spans"))
  }

  /**
   * Content-defined chunking (Rabin/CDC family — Muthitacharoen et al.
   * 2001 LBFS, public): chunk boundaries where the rolling hash of the
   * last `k` tokens lands ≡ 0 (mod m), so boundaries are a function of
   * LOCAL CONTENT, not absolute position. The property that matters for
   * dedup: inserting a sentence near the top of a doc re-chunks only the
   * chunks it touches — every later boundary re-synchronizes within k
   * tokens — so chunk-level dedup still matches the unchanged tail.
   * Fixed-stride chunking ([[slidingWindows]]) loses ALL alignment after
   * one insertion; this is the storage/dedup-grade alternative
   * (production CDC adds min/max chunk bounds via a sequential fold —
   * same boundary hash, stateful cut; documented trade for the
   * window-free shuffle shape here).
   *
   * Deterministic: the boundary hash is the portable md5 family over the
   * space-joined k-token window, so the DuckDB oracle replays every cut.
   * Expected chunk length = m tokens.
   *
   * Scale shape: one posexplode + ONE exchange on the doc key — the
   * k-token window rides `lag`, the chunk id is a running sum over the
   * SAME sort, and the chunk rebuild groupBy reuses the partitioning
   * (the l88 profile).
   *
   * Output: (doc_id, chunk_idx 0-based, n_tokens, chunk_md5).
   */
  def cdcChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, k: Int = 3,
                m: Int = 16): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && m >= 1, "need k >= 1 and m >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(filter(split(trim(col(textCol)), "\\s+"),
        t => length(t) > 0)).as(Seq("pos", "tok")))
    val windowStr = concat_ws(" ",
      ((k - 1) to 1 by -1).map(j => lag(col("tok"), j).over(w)) :+ col("tok"): _*)
    val boundary = col("pos") >= (k - 1) &&
      pmod(portableHash60(windowStr), lit(m.toLong)) === 0
    val staged = toks.withColumn("bnd", boundary)
      .withColumn("chunk_idx",
        coalesce(sum(when(col("bnd"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("long"))
    staged.groupBy("doc_id", "chunk_idx")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        md5(org.apache.spark.sql.functions.encode(
          graft.ops.Agg.stringAggOrderedBy(col("tok"), col("pos"), " "),
          "UTF-8")).as("chunk_md5"))
  }

  /** Role markers for [[renderSftTemplate]]. Fixed strings, shared with
    * the generated oracle SQL so the span arithmetic can never skew. */
  val SftSystemTag = "<|system|>\n"
  val SftUserTag = "\n<|user|>\n"
  val SftAssistantTag = "\n<|assistant|>\n"
  val SftEndTag = "<|end|>"

  /**
   * SFT chat-template rendering: serialize (system, prompt, response)
   * into one training string and report the LOSS-MASK span — the
   * character range covering exactly the assistant response, which is
   * what supervised fine-tuning computes loss on (prompt tokens are
   * masked out). Getting this span arithmetic right is the fiddly part
   * of SFT prep; emitting it next to the rendered text makes it
   * verifiable instead of re-derived downstream by fragile re-parsing.
   *
   * Offsets are CODE-POINT positions (Spark `length` semantics, matching
   * DuckDB `length`), 0-based: `substr(rendered, mask_start+1, mask_len)`
   * is the response. Expression-only — zero shuffles.
   *
   * Output: (id, rendered, mask_start, mask_len).
   */
  def renderSftTemplate(df: org.apache.spark.sql.DataFrame, idCol: String,
                        promptCol: String, responseCol: String,
                        systemPrompt: String): org.apache.spark.sql.DataFrame = {
    val pre = concat(lit(SftSystemTag + systemPrompt + SftUserTag),
      col(promptCol), lit(SftAssistantTag))
    df.select(col(idCol).as("id"),
        concat(pre, col(responseCol), lit(SftEndTag)).as("rendered"),
        length(pre).cast("long").as("mask_start"),
        length(col(responseCol)).cast("long").as("mask_len"))
  }

  /**
   * Sliding token-window chunking (the RAG / context-window prep step):
   * each document becomes overlapping windows of `windowTokens` whitespace
   * tokens advancing by `strideTokens` — window w covers tokens
   * `[w·stride, w·stride + window)`, the last window may be shorter, a doc
   * of ≤ window tokens yields exactly one window, blank/NULL docs yield
   * none. Expression-only window construction (one `transform` over a
   * `sequence`, slices of the one tokens array) followed by a single
   * `posexplode` — no shuffle at all; the output is a scan-shaped map.
   *
   * Returns (doc_id, win_id, win_text, win_tokens).
   */
  def slidingWindows(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, windowTokens: Int,
                     strideTokens: Int): org.apache.spark.sql.DataFrame = {
    require(windowTokens > 0 && strideTokens > 0 && strideTokens <= windowTokens,
      s"need 0 < stride <= window, got window=$windowTokens stride=$strideTokens")
    val toks = whitespaceTokens(col(textCol))
    val n = size(toks)
    // ceil((n - window)/stride) + 1 for n > window, else 1. Spark's `/` on
    // int columns is DOUBLE division; truncate back (operands are ≥ 0 and
    // far below 2^53, so the double round-trip is exact)
    val nWins = when(n <= windowTokens, lit(1))
      .otherwise(((n - windowTokens + strideTokens - 1) / strideTokens).cast("int") + 1)
    df.filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), toks.as("_toks"), nWins.as("_nw"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("_nw") - 1),
          w => slice(col("_toks"), w * strideTokens + 1, lit(windowTokens))))
          .as(Seq("win_id", "_win")))
      .select(col("doc_id"), col("win_id").cast("long").as("win_id"),
        array_join(col("_win"), " ").as("win_text"),
        size(col("_win")).cast("long").as("win_tokens"))
  }

  /**
   * Fill-in-the-middle (FIM) transformation in PSM order (Bavarian et al.
   * 2022, "Efficient training of language models to fill in the middle",
   * public): split each doc's token stream at two DETERMINISTIC cut points
   * and re-serialize as `<PRE>prefix<SUF>suffix<MID>middle`. Cuts are
   * `portableHash60(seed ‖ arm ‖ id) mod (n+1)` for arms "a"/"b",
   * lo=min / hi=max — a pure function of (seed, id), so a re-run, a
   * retried partition, or another engine reproduces the same split (the
   * same resumability contract as [[Sampling]]). Docs shorter than
   * `minTokens` keep lo=hi=n: whole doc in the prefix, empty suffix and
   * middle — one uniform serialization, no special-case row shape.
   *
   * Expression-only (hash + slice + concat): zero shuffles, scan-shaped.
   *
   * Output: (doc_id, n_tokens, cut_lo, cut_hi, fim_md5) — the md5 stands
   * in for shipping the transformed text through the hash gate; real
   * pipelines write the PSM string itself.
   */
  def fimTransform(df: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, seed: String = "f1",
                   minTokens: Int = 3): org.apache.spark.sql.DataFrame = {
    require(!seed.contains(Sampling.SeedSep), "seed must not contain the unit separator")
    def cutHash(arm: String, n: Column): Column =
      pmod(portableHash60(concat(
        lit(seed + Sampling.SeedSep + arm + Sampling.SeedSep),
        col(idCol).cast("string"))), n + 1)
    val tk = whitespaceTokens(col(textCol))
    val base = df.select(col(idCol).as("doc_id"), tk.as("_tk"), size(tk).as("_n"))
      .select(col("doc_id"), col("_tk"), col("_n"),
        cutHash("a", col("_n")).as("_h1"), cutHash("b", col("_n")).as("_h2"))
      .select(col("doc_id"), col("_tk"), col("_n"),
        when(col("_n") < minTokens, col("_n").cast("long"))
          .otherwise(least(col("_h1"), col("_h2"))).as("_lo"),
        when(col("_n") < minTokens, col("_n").cast("long"))
          .otherwise(greatest(col("_h1"), col("_h2"))).as("_hi"))
    base.select(col("doc_id"), col("_n").cast("long").as("n_tokens"),
      col("_lo").as("cut_lo"), col("_hi").as("cut_hi"),
      md5(concat(
        lit("<PRE>"), array_join(slice(col("_tk"), lit(1), col("_lo").cast("int")), " "),
        lit("<SUF>"), array_join(slice(col("_tk"), col("_hi").cast("int") + 1,
          col("_n") - col("_hi").cast("int")), " "),
        lit("<MID>"), array_join(slice(col("_tk"), col("_lo").cast("int") + 1,
          (col("_hi") - col("_lo")).cast("int")), " ")).cast("binary")).as("fim_md5"))
  }

  /**
   * Feature hashing — the hashing-trick text vectorizer (Weinberger et
   * al. 2009, ICML, public): token → dimension `portableHash60(tok) mod
   * dim`, with a SIGN bit from an independent hash
   * (`portableHash60("sgn:"+tok) mod 2 → ±1`) so collisions cancel in
   * expectation instead of biasing upward — the fixed-memory,
   * vocabulary-free featurizer that feeds linear classifiers (the l46
   * quality gate) without any trained vocabulary to ship.
   *
   * Output is the SPARSE form (doc_id, idx, w), zero weights dropped —
   * the join-friendly layout at corpus scale (a dense array column of
   * mostly zeros is dim× the storage for no information). One explode +
   * one hash-agg on (doc, idx); both hashes are the md5-derived portable
   * family, so any SQL engine replays them bit for bit.
   */
  def featureHashSparse(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, dim: Int): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toks = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(filter(whitespaceTokens(col(textCol)),
          t => length(t) > 0)).as("tok"))
    toks
      .select(col("doc_id"),
        pmod(portableHash60(col("tok")), lit(dim.toLong)).as("idx"),
        (pmod(portableHash60(concat(lit("sgn:"), col("tok"))), lit(2L)) * 2L - 1L)
          .as("sgn"))
      .groupBy("doc_id", "idx")
      .agg(sum(col("sgn")).cast("long").as("w"))
      .filter(col("w") =!= 0L)
  }
}
