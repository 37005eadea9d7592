package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword segmentation (Kudo 2018 — the SentencePiece unigram
 * model; public): per word, the MINIMUM-COST segmentation into vocabulary
 * pieces under an additive cost model (cost ≈ −log p in integer
 * micro-nats), computed by the exact Viterbi DP — the second real
 * tokenizer family next to BPE ([[Bpe]]). BPE is greedy-merge bottom-up;
 * unigram is global-optimum top-down, which is why the two disagree on
 * real text and production pipelines (T5, LLaMA, mT5) ship unigram.
 *
 * Determinism/exactness: costs are INTEGER micro-nats and the DP value is
 * a single packed long `cost·2048 + pieces` (pieces < 2048 ≥ any word
 * length we fold), so the lexicographic (cost, pieces) minimum IS the
 * numeric minimum — no float log-probs, no tie ambiguity. Unmatched
 * single characters take the fixed `unkCost` (every word is segmentable);
 * unmatched longer substrings are infeasible via a BIG sentinel, with
 * `coalesce(..., BIG)` spelled identically in the generated DuckDB oracle
 * so null-handling semantics can never diverge.
 *
 * Spark-first shape: the WHOLE Viterbi is a Catalyst expression fold —
 * `aggregate(sequence(1, n), dp, append(min over k of dp[i−k] + cost))`
 * nested inside a fold over the word array. Zero shuffles, zero UDFs,
 * no mapPartitions: the plan is a one-pass projection, and the vocabulary
 * rides the expression tree as literals (O(1) plan size in corpus,
 * [[Bpe]]'s merges-on-the-plan pattern). O(n·maxPieceLen) per word with
 * O(1)-bound lambda variables (no re-evaluation traps).
 */
object Unigram {

  /** Single-character fallback cost (micro-nats) — the OOV escape that
    * keeps every string segmentable (SentencePiece's character coverage). */
  val UnkCostMicro = 2500000L

  /** Longest vocabulary piece considered by the DP. */
  val MaxPieceLen = 4

  /** Packing factor: dp value = cost·2048 + pieces (pieces < 2048). */
  val Pack = 2048L

  /** Words are capped at this many chars before the DP (all three paths —
    * native, HOF, oracle — identically): pieces ≤ word length < Pack, so
    * the 11 piece bits can never overflow into the cost. Real tokens this
    * long are binary blobs/URLs a curation pipeline drops upstream. */
  val MaxWordChars = 2047

  /** Infeasible-candidate sentinel — far above any real packed cost but
    * safe to add another candidate cost to without overflow. */
  val Big = Long.MaxValue / 4

  /**
   * Fixed seed vocabulary (piece → cost in micro-nats), tuned so common
   * English/SQL digraphs and trigraphs undercut their single-char
   * spellings (2 chars: one ~2.8 piece beats 2 × 2.5 singles). The same
   * literal table is interpolated into the DuckDB oracle.
   */
  val DefaultVocab: Seq[(String, Long)] = Seq(
    "tion" -> 4200000L, "ment" -> 4500000L, "able" -> 4600000L,
    "ther" -> 4400000L,
    "the" -> 3200000L, "ing" -> 3400000L, "and" -> 3500000L,
    "err" -> 3900000L, "ord" -> 3800000L, "val" -> 3700000L,
    "row" -> 3600000L, "key" -> 3650000L, "agg" -> 3750000L,
    "can" -> 3850000L,
    "th" -> 2800000L, "he" -> 2850000L, "in" -> 2750000L,
    "er" -> 2700000L, "an" -> 2820000L, "re" -> 2840000L,
    "on" -> 2860000L, "at" -> 2880000L, "en" -> 2900000L,
    "or" -> 2920000L, "ta" -> 2940000L, "le" -> 2960000L,
    "sc" -> 2980000L, "jo" -> 2990000L, "ha" -> 2970000L,
    "sh" -> 2950000L, "up" -> 2930000L, "qu" -> 2910000L)

  require(DefaultVocab.forall { case (p, c) =>
    p.nonEmpty && p.length <= MaxPieceLen && c > 0 }, "malformed vocab")

  /** Piece cost for a length-`k` substring column: vocabulary CASE chain
    * over the length-k entries; single chars fall back to `unkCost`,
    * longer unmatched substrings are null (infeasible). */
  private def pieceCost(sub: Column, k: Int, vocab: Seq[(String, Long)],
                        unkCost: Long): Column = {
    val entries = vocab.filter(_._1.length == k)
    val base: Column = if (k == 1) lit(unkCost) else lit(null).cast("long")
    entries.foldRight(base) { case ((p, c), els) =>
      when(sub === p, lit(c)).otherwise(els)
    }
  }

  /**
   * Packed Viterbi value `cost·2048 + pieces` of one word column —
   * the inner DP fold. Exposed for the oracle-parity spec.
   */
  private[llm] def wordPacked(w: Column, vocab: Seq[(String, Long)],
                              unkCost: Long, maxLen: Int): Column = {
    val n = length(w)
    val dp = aggregate(sequence(lit(1), n), array(lit(0L)), (acc, i) => {
      val cands = (1 to maxLen).map { k =>
        val prev = element_at(acc, (i - k + 1).cast("int"))
        val c = pieceCost(
          substring(w, (i - k + 1).cast("int"), lit(k)), k, vocab, unkCost)
        coalesce(when(i >= k, prev + c * Pack + 1), lit(Big))
      }
      concat(acc, array(least(cands: _*)))
    })
    element_at(dp, (n + 1).cast("int"))
  }

  /**
   * Per-doc unigram segmentation cost: (doc out column) total cost in
   * micro-nats and total piece count over all whitespace words
   * (lowercased — the registry-wide token definition). Empty/null docs
   * emit (0, 0, 0).
   *
   * Computed by the native codegen'd [[UnigramSegmentExpr]] (the
   * [[BpeCountExpr]] pattern — vocab as a plan reference object, per-JVM
   * distinct-word memo; ~4× the interpreted HOF fold on the registered
   * corpus). [[segmentCostHof]] keeps the expression-fold definition the
   * native path is parity-tested against.
   *
   * Output: (idCol, cost_micro, n_pieces, n_words).
   */
  def segmentCost(df: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[(String, Long)] = DefaultVocab,
                  unkCost: Long = UnkCostMicro,
                  maxLen: Int = MaxPieceLen): DataFrame = {
    require(maxLen >= 1 && vocab.forall(_._1.length <= maxLen),
      "vocab pieces must fit maxLen")
    df.select(col(idCol),
        segmentArray(col(textCol), vocab, unkCost, maxLen).as("_s"))
      .select(col(idCol),
        element_at(col("_s"), 1).as("cost_micro"),
        element_at(col("_s"), 2).as("n_pieces"),
        element_at(col("_s"), 3).as("n_words"))
  }

  /** The native segmentation triple `[cost_micro, n_pieces, n_words]` as
    * a composable Column (null text → zeros) — for registry rows that
    * combine it with other per-doc columns in one scan. */
  def segmentArray(text: Column,
                   vocab: Seq[(String, Long)] = DefaultVocab,
                   unkCost: Long = UnkCostMicro,
                   maxLen: Int = MaxPieceLen): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(UnigramSegmentExpr(
      expression(coalesce(text, lit(""))), vocab, unkCost, maxLen))
  }

  /** Expression-fold (HOF) twin of [[segmentCost]] — the independent
    * definition the native expression is parity-tested against
    * (the `portableHash60Sql` pattern). */
  private[llm] def segmentCostHof(df: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[(String, Long)] = DefaultVocab,
                  unkCost: Long = UnkCostMicro,
                  maxLen: Int = MaxPieceLen): DataFrame = {
    df.select(col(idCol),
        // filtered split (not raw whitespaceTokens): blank text must give
        // an EMPTY word list, not the [""] split artifact — the oracle's
        // list_filter(…, length > 0) twin
        coalesce(filter(split(trim(lower(col(textCol))), "\\s+"),
          t => length(t) > 0), array().cast("array<string>")).as("_w"))
      // materialize the per-word packed costs ONCE (bound-column rule);
      // MaxWordChars cap mirrors the native path and the oracle
      .select(col(idCol),
        size(col("_w")).cast("long").as("n_words"),
        transform(col("_w"), w =>
          wordPacked(substring(w, 1, MaxWordChars.toInt), vocab, unkCost, maxLen))
          .as("_p"))
      .select(col(idCol),
        // Pack = 2^11: unpack with shift/mask — exact integer ops with
        // the same spelling (>> / &) in the DuckDB oracle
        aggregate(col("_p"), lit(0L), (a, x) => a + shiftright(x, 11)).as("cost_micro"),
        aggregate(col("_p"), lit(0L), (a, x) => a + x.bitwiseAND(lit(Pack - 1)))
          .as("n_pieces"),
        col("n_words"))
  }
}
