package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class LangModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bigramSurprisal: hand-computed add-one bigram NLL; blank docs absent") {
    // corpus bigrams: doc0 (BOS,a)(a,b)(b,a), doc1 (BOS,a)(a,b)
    // c2: (BOS,a)=2 (a,b)=2 (b,a)=1; c1: BOS=2 a=2 b=1; V={a,b}=2
    // P(BOS→a)=P(a→b)=3/4, P(b→a)=2/3
    val docs = Seq((0L, "a b a"), (1L, "A b"), (2L, "   ")).toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(2L)) // token-less docs have no bigrams
    val nl34 = BigDecimal(-math.log(3.0 / 4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nl23 = BigDecimal(-math.log(2.0 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (_, n0, nll0, avg0) = out(0L)
    assert(n0 === 3L)
    assert(math.abs(nll0 - (2 * nl34 + nl23)) < 1e-9, s"nll0=$nll0")
    assert(math.abs(avg0 - nll0 / 3) < 1e-12)
    val (_, n1, nll1, _) = out(1L) // case-folds to "a b"
    assert(n1 === 2L)
    assert(math.abs(nll1 - 2 * nl34) < 1e-9, s"nll1=$nll1")
  }

  test("self-scoring flags out-of-distribution text with the highest surprisal") {
    val fluent = (0L until 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val oov = Seq((99L, "zxq wvu tsr qpo nml kji"))
    val docs = (fluent ++ oov).toDF("doc_id", "text")
    val scores = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val worst = scores.maxBy(_._2)._1
    assert(worst === 99L, s"expected the gibberish doc to score worst: $scores")
    // every repeated fluent doc scores identically (pure function of text)
    assert(fluent.map(f => scores(f._1)).distinct.size === 1)
  }
}
