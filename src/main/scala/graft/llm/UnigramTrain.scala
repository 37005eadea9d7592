package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Hard-EM unigram-LM tokenizer TRAINER (Kudo 2018's SentencePiece EM
 * re-estimation with a Viterbi/hard E-step) — the training-side
 * complement to [[Unigram]]'s segmentation, structured exactly like the
 * BPE trainer ([[Bpe.trainLocal]]): the CORPUS-SCALE part is a
 * word-frequency aggregation (one shuffle, map-side partials); the EM
 * loop then runs over the bounded top-`topWords` word table on the
 * driver, which is how production tokenizer trainers work (the freq
 * table, not the corpus, is the trainer's input — SentencePiece itself
 * trains on a bounded sentence sample).
 *
 * Round structure (all arithmetic exact int64 — every count is an
 * integer and every cost is a [[Log2Micro]] fixed-point value, so the
 * whole train replays bit-for-bit in DuckDB):
 *
 *  1. SEED: candidate pieces = all substrings (length 1..maxLen) of the
 *     top words, weighted by word frequency per occurrence; keep the
 *     `vocabSize` heaviest (count DESC, piece ASC). Piece cost =
 *     l2m(T) − l2m(count) where T = Σ kept counts — the integer-log2
 *     form of −log p (monotone with it, exact).
 *  2. E-step: Viterbi-segment each word under the current costs with
 *     [[Unigram]]'s packed DP (`cost·2048 + pieces`, unk single-char
 *     fallback), backtracing with the SMALLEST-k tie-break; count each
 *     emitted piece at the word's frequency.
 *  3. M-step: re-select the `vocabSize` heaviest pieces by EM count and
 *     recompute costs from the EM counts (same l2m form).
 *
 * Output: the `topK` final pieces as (piece, em_count, cost_micro) —
 * exact integers, ordered (em_count DESC, piece ASC) with the order
 * columns present, so the driver hash compare is total.
 */
object UnigramTrain {

  private def l2m(n: Long): Long = Log2Micro.compute(n)

  /** Packed Viterbi DP over `w` under `costs` — [[UnigramTable]]'s exact
    * arithmetic, returning the full dp array for backtracing. */
  private def dpArray(w: String, costs: Map[String, Long], unkCost: Long,
                      maxLen: Int): Array[Long] = {
    val n = w.length
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = Unigram.Big
      var k = 1
      while (k <= maxLen && k <= i) {
        val piece = w.substring(i - k, i)
        val c: Option[Long] =
          if (k == 1) Some(costs.getOrElse(piece, unkCost)) else costs.get(piece)
        c.foreach { cv =>
          val cand = dp(i - k) + cv * Unigram.Pack + 1
          if (cand < best) best = cand
        }
        k += 1
      }
      dp(i) = best
      i += 1
    }
    dp
  }

  /** Backtrace with the smallest-k tie-break (mirrored by the oracle's
    * CASE order): at position j pick the shortest piece whose candidate
    * achieves dp(j). */
  private[llm] def segmentPieces(w: String, costs: Map[String, Long],
                                 unkCost: Long, maxLen: Int): Seq[String] = {
    val dp = dpArray(w, costs, unkCost, maxLen)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var j = w.length
    while (j > 0) {
      var k = 1
      var done = false
      while (!done && k <= maxLen && k <= j) {
        val piece = w.substring(j - k, j)
        val c: Option[Long] =
          if (k == 1) Some(costs.getOrElse(piece, unkCost)) else costs.get(piece)
        if (c.exists(cv => dp(j) == dp(j - k) + cv * Unigram.Pack + 1)) {
          out += piece
          j -= k
          done = true
        } else k += 1
      }
      require(done, s"backtrace failed at $j in '$w'") // unreachable: k=1 always feasible
    }
    out.reverse.toSeq
  }

  /** Cost table from (piece → count): l2m(T) − l2m(count), T = Σ counts. */
  private def costsFrom(counts: Seq[(String, Long)]): Map[String, Long] = {
    val t = counts.map(_._2).sum
    counts.map { case (p, c) => p -> (l2m(t) - l2m(c)) }.toMap
  }

  /** Top-`n` by (count DESC, key ASC) — the deterministic cut both
    * engines replay with ORDER BY ... LIMIT. */
  private def topBy(m: Iterable[(String, Long)], n: Int): Seq[(String, Long)] =
    m.toSeq.sortBy { case (p, c) => (-c, p) }.take(n)

  /**
   * Train and return the final vocab table. `rounds` hard-EM rounds
   * after seeding (each = segment + recount + recost). Eager: runs the
   * word-frequency aggregation and collects the bounded top-`topWords`
   * table at construction (the l16/k-means precedent).
   */
  def emTrain(spark: SparkSession, df: DataFrame, textCol: String,
              topWords: Int = 2000, vocabSize: Int = 64, topK: Int = 40,
              maxLen: Int = Unigram.MaxPieceLen,
              unkCost: Long = Unigram.UnkCostMicro,
              rounds: Int = 1): DataFrame = {
    require(rounds >= 1 && topK <= vocabSize)
    val wordFreq = df
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(substring(col("w"), 1, Unigram.MaxWordChars).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    // seed: weighted substring candidates over the top-word table
    val candCounts = scala.collection.mutable.HashMap[String, Long]()
    wordFreq.foreach { case (w, f) =>
      var k = 1
      while (k <= maxLen) {
        var p = 0
        while (p + k <= w.length) {
          val piece = w.substring(p, p + k)
          candCounts(piece) = candCounts.getOrElse(piece, 0L) + f
          p += 1
        }
        k += 1
      }
    }
    var vocabCounts = topBy(candCounts, vocabSize)
    var costs = costsFrom(vocabCounts)

    // hard-EM rounds: Viterbi counts at word frequency → re-cut → re-cost
    (1 to rounds).foreach { _ =>
      val emCounts = scala.collection.mutable.HashMap[String, Long]()
      wordFreq.foreach { case (w, f) =>
        segmentPieces(w, costs, unkCost, maxLen).foreach { p =>
          emCounts(p) = emCounts.getOrElse(p, 0L) + f
        }
      }
      vocabCounts = topBy(emCounts, vocabSize)
      costs = costsFrom(vocabCounts)
    }

    import spark.implicits._
    topBy(vocabCounts, topK)
      .map { case (p, c) => (p, c, costs(p)) }
      .toDF("piece", "em_count", "cost_micro")
  }
}
