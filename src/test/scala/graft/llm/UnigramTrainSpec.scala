package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class UnigramTrainSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def l2m(n: Long) = Log2Micro.compute(n)

  test("segmentPieces reconstructs exactly the packed-DP optimum (parity with UnigramTable)") {
    val vocab = Unigram.DefaultVocab
    val costs = vocab.toMap
    val table = new UnigramTable(vocab, Unigram.UnkCostMicro, Unigram.MaxPieceLen)
    val words = Seq("the", "theory", "international", "ordering", "xyzq",
      "a", "correlation", "scanner", "quantile", "ingestion")
    words.foreach { w =>
      val pieces = UnigramTrain.segmentPieces(w, costs,
        Unigram.UnkCostMicro, Unigram.MaxPieceLen)
      assert(pieces.mkString("") === w, s"pieces must tile '$w'")
      val packed = pieces.map(p =>
        costs.getOrElse(p, Unigram.UnkCostMicro) * Unigram.Pack + 1).sum
      assert(packed === table.wordPacked(w), s"'$w' backtrace packed cost")
    }
  }

  test("emTrain: hand-computed seed, Viterbi E-step, and M-step costs on a tiny corpus") {
    // words: ab ×3, abc ×1. Seed counts: a=4 b=4 ab=4 c=1 bc=1 abc=1, T0=15.
    // Under seed costs [abc] beats ab+c (l2m15 < 2·l2m15 − l2m4), ab beats
    // a+b on piece count → EM counts: ab=3, abc=1, T1=4.
    val docs = Seq((1L, "ab ab"), (2L, "ab abc"), (3L, "  ")).toDF("doc_id", "text")
    val out = UnigramTrain.emTrain(spark, docs, "text",
        topWords = 10, vocabSize = 10, topK = 10, rounds = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("ab", 3L, l2m(4) - l2m(3)),
      ("abc", 1L, l2m(4) - l2m(1))))
  }

  test("emTrain: EM mass conservation — piece counts sum to word-frequency-weighted piece totals") {
    val docs = Seq((1L, "the theory of the ordered theory"),
      (2L, "ordering the order by key"),
      (3L, "zz qq zz")).toDF("doc_id", "text")
    val out = UnigramTrain.emTrain(spark, docs, "text",
      topWords = 100, vocabSize = 200, topK = 200, rounds = 2)
      .as[(String, Long, Long)].collect()
    // every piece's count is positive; more frequent pieces never cost more
    assert(out.forall(_._2 > 0))
    val byCount = out.sortBy(r => (-r._2, r._1))
    assert(byCount.sliding(2).forall {
      case Array(hi, lo) => hi._3 <= lo._3 || hi._2 == lo._2
      case _ => true
    }, "cost must be monotone nonincreasing in count")
    // deterministic across invocations
    val again = UnigramTrain.emTrain(spark, docs, "text",
      topWords = 100, vocabSize = 200, topK = 200, rounds = 2)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq === again.toSeq)
  }
}
