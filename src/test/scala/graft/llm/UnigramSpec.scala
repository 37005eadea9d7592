package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class UnigramSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val vocabMap = Unigram.DefaultVocab.toMap

  /** Reference Viterbi in plain Scala: (cost, pieces) lexicographic min. */
  private def refSegment(w: String): (Long, Long) = {
    val n = w.length
    val dp = Array.fill[(Long, Long)](n + 1)((Long.MaxValue / 4, 0L))
    dp(0) = (0L, 0L)
    for (i <- 1 to n; k <- 1 to Unigram.MaxPieceLen if k <= i) {
      val sub = w.substring(i - k, i)
      val cOpt =
        if (vocabMap.contains(sub)) Some(vocabMap(sub))
        else if (k == 1) Some(Unigram.UnkCostMicro)
        else None
      cOpt.foreach { c =>
        val cand = (dp(i - k)._1 + c, dp(i - k)._2 + 1)
        // packed comparison = lexicographic (cost, pieces)
        if (cand._1 < dp(i)._1 || (cand._1 == dp(i)._1 && cand._2 < dp(i)._2))
          dp(i) = cand
      }
    }
    dp(n)
  }

  test("hand-checked words: vocabulary pieces beat character spelling") {
    val got = Unigram.segmentCost(
        Seq((1L, "the"), (2L, "xyz"), (3L, "thether")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 'the' is one 3.2 piece (beats th+e = 5.3 and 3 singles = 7.5)
    assert(got(1L) === ((1L, 3200000L, 1L, 1L)))
    // no piece covers xyz: three UNK singles
    assert(got(2L) === ((2L, 3L * Unigram.UnkCostMicro, 3L, 1L)))
    // global optimum crosses greedy-longest boundaries: the|ther = 7.6
    assert(got(3L) === ((3L, 3200000L + 4400000L, 2L, 1L)))
  }

  test("doc-level sums, case folding, empty doc zeros") {
    val got = Unigram.segmentCost(
        Seq((1L, "THE xyz"), (2L, "   "), (3L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3200000L + 3L * Unigram.UnkCostMicro, 4L, 2L)))
    assert(got(2L) === ((2L, 0L, 0L, 0L)))
    assert(got(3L) === ((3L, 0L, 0L, 0L)))
  }

  test("expression DP equals the reference Viterbi on exhaustive short strings") {
    // all strings of length 1..4 over a vocab-heavy alphabet hit every
    // piece-length branch and every tie shape
    val alpha = "ther"
    val words = for {
      n <- 1 to 4
      s <- Iterator.fill(n)(alpha).toList
        .foldLeft(Seq("")) { (acc, cs) => acc.flatMap(p => cs.map(c => p + c)) }
    } yield s
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = Unigram.segmentCost(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) === refSegment(w), s"word '$w'")
    }
    // optimality bound: never worse than all-singles
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong)._1 <= w.length * Unigram.UnkCostMicro, s"word '$w'")
    }
  }

  test("words past MaxWordChars are capped: piece bits can never overflow into cost") {
    val blob = "z" * 5000 // 5000-char unbroken token (base64-blob shape)
    val got = Unigram.segmentCost(Seq((1L, blob)).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].head()
    // scored on the first 2047 chars, all UNK singles: pieces stays < 2048
    assert(got === ((1L, 2047L * Unigram.UnkCostMicro, 2047L, 1L)))
    // native and HOF agree on the capped form too
    val hof = Unigram.segmentCostHof(Seq((1L, blob)).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Long, Long, Long)].head()
    assert(got === hof)
  }

  test("native expression path is bit-identical to the HOF expression fold") {
    val docs = Seq(
      (1L, "the thermal reorder aggregation can be unmentionable"),
      (2L, "KEY VALUE  row\trow\nscan"),
      (3L, ""), (4L, "   "), (5L, null.asInstanceOf[String]),
      (6L, "qu er th in on at xyzzyx 12345 a")
    ).toDF("doc_id", "text")
    val native = Unigram.segmentCost(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val hof = Unigram.segmentCostHof(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(native === hof)
  }
}
