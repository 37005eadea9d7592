package graft.llm

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** DoReMi-lite multiplicative weights: direction, smoothing floor,
  * conservation, and determinism. */
class DomainReweightSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // three domains: long docs (positive excess), short (negative), average
  private def corpus = Seq.tabulate(300) { i =>
    val d = i % 3
    val len = d match { case 0 => 900L; case 1 => 100L; case _ => 500L }
    (s"dom$d", len)
  }.toDF("source", "n_chars")

  test("excess direction drives weights; totals conserved; deterministic") {
    val out = DomainReweight.doremiWeights(corpus, "source", "n_chars",
        rounds = 4, etaBp = 100L, alphaBp = 200L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val byDom = out.map(r => r._1 -> r).toMap
    assert(byDom("dom0")._3 > 0 && byDom("dom1")._3 < 0,
      "long domain has positive excess, short negative")
    assert(byDom("dom0")._4 > byDom("dom2")._4 &&
      byDom("dom2")._4 > byDom("dom1")._4, "weights ordered by excess")
    val total = out.map(_._4).sum
    assert(total > 990000L && total <= 1000000L,
      s"weights conserve ~1e6 micro (floor slack only), got $total")
    val again = DomainReweight.doremiWeights(corpus, "source", "n_chars",
        rounds = 4, etaBp = 100L, alphaBp = 200L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === out.toSeq, "bit-deterministic")
  }

  test("smoothing floors a crushed domain at ~alpha/k") {
    // aggressive eta + many rounds starve the short domain; alpha keeps it
    val out = DomainReweight.doremiWeights(corpus, "source", "n_chars",
        rounds = 32, etaBp = 2000L, alphaBp = 300L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val floor = 300L * 1000000L / (10000L * 3)
    assert(out("dom1") >= floor && out("dom1") <= floor + 1000,
      s"crushed domain sits at the alpha/k floor, got ${out("dom1")}")
  }

  test("single domain degenerates to full weight") {
    val one = Seq(("only", 10L), ("only", 20L)).toDF("source", "n_chars")
    val out = DomainReweight.doremiWeights(one, "source", "n_chars")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length === 1 && out.head._3 === 0L)
    assert(out.head._4 === 1000000L)
  }
}
