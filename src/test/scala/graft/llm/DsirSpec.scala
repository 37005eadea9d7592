package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class DsirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def target = Seq(
    (100L, "alpha beta gamma delta"),
    (101L, "beta gamma alpha epsilon")
  ).toDF("doc_id", "text")

  private def raw = Seq(
    (0L, "alpha beta gamma"),    // pure target vocab
    (1L, "zeta eta theta iota"), // pure off-vocab
    (2L, "alpha zeta")           // mixed
  ).toDF("doc_id", "text")

  test("target-like docs outrank off-target docs; feature count is exact") {
    val out = Dsir.importanceWeights(raw, target, "doc_id", "text", nBuckets = 512)
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    // 3 tokens → 3 unigrams + 2 bigrams
    assert(out(0L)._2 === 5L)
    assert(out(1L)._2 === 7L)
    assert(out(2L)._2 === 3L)
    // ranking: in-distribution > mixed > out-of-distribution
    assert(out(0L)._3 > out(2L)._3 && out(2L)._3 > out(1L)._3)
    // signs: target vocab selected, off-vocab rejected
    assert(out(0L)._4)
    assert(!out(1L)._4)
  }

  test("deterministic across runs; blank/null raw docs are excluded") {
    val rawWithBlank = raw.union(Seq((3L, "   "), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val a = Dsir.importanceWeights(rawWithBlank, target, "doc_id", "text", nBuckets = 512)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    val b = Dsir.importanceWeights(rawWithBlank, target, "doc_id", "text", nBuckets = 512)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._1).toSet === Set(0L, 1L, 2L))
  }

  test("a doc identical to the whole target corpus scores maximal among raw") {
    val r2 = raw.union(Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text"))
    val out = Dsir.importanceWeights(r2, target, "doc_id", "text", nBuckets = 512)
      .as[(Long, Long, Double, Boolean)].collect()
    val best = out.maxBy(_._3)
    assert(best._1 === 9L || best._1 === 0L) // both pure target-vocab docs lead
    // the full-target doc always outranks the off-vocab doc (absolute sign
    // is not asserted: with a tiny fixture add-one smoothing can push every
    // score negative — ranking is the invariant)
    assert(out.find(_._1 == 9L).get._3 > out.find(_._1 == 1L).get._3)
  }
}
