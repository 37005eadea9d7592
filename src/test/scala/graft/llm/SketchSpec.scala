package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a a a b b c"),
    (1L, "a b c d"),
    (2L, "e f g a")
  ).toDF("doc_id", "text")
  // exact counts: a=5 b=3 c=2 d=1 e=1 f=1 g=1, N=14

  test("CMS never undercounts; wide sketch is exact here; absent terms read 0") {
    val probes = Seq("a", "b", "c", "d", "nope")
    val est = Sketch.cmsHeavyHitters(docs, "doc_id", "text", probes, d = 4, w = 64)
      .as[(String, Long)].collect().toMap
    val exact = Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 1L, "nope" -> 0L)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t undercounted: ${est(t)} < $c")
    }
    // 7 tokens in 4×64 cells: collisions are possible but the hash family
    // is fixed — pin exactness so a hash change is visible
    assert(est === exact)
  }

  test("degenerate 1-bucket sketch reads the whole stream for every term (upper-bound form)") {
    val est = Sketch.cmsHeavyHitters(docs, "doc_id", "text", Seq("a", "nope"), d = 2, w = 1)
      .as[(String, Long)].collect().toMap
    assert(est("a") === 14L)
    assert(est("nope") === 14L) // everything collides: max overestimate, never under
  }

  // --- bloomDecontaminate ---

  private def bloomCorpus = Seq(
    (1L, "one two three four five six seven"), // shares "three four five" 3-gram run with bench
    (2L, "alpha beta gamma delta epsilon"),    // disjoint from bench
    (3L, "three four five six seven eight")    // shares a longer run
  ).toDF("doc_id", "text")
  private def bloomBench = Seq(
    (100L, "zero three four five six seven nine")
  ).toDF("doc_id", "text")

  test("bloom decontamination never misses a truly shared shingle (no false negatives)") {
    val exact = Decontaminate.contaminationScore(
        bloomCorpus, bloomBench, "text", "doc_id", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val bloom = Sketch.bloomDecontaminate(
        bloomCorpus, bloomBench, "text", "doc_id", n = 3, k = 3, m = 65536)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (doc, (nSh, nShared)) =>
      assert(bloom(doc)._1 === nSh, s"doc $doc shingle count")
      // one-sided error: flagged >= truly shared, always
      assert(bloom(doc)._2 >= nShared, s"doc $doc missed a shared shingle")
    }
    // at m=65536 with ~5 bench shingles the filter is near-empty: no FPs,
    // so the counts are EXACT here — pins the hash family like the CMS test
    assert(bloom(1L)._2 === exact(1L)._2)
    assert(bloom(2L)._2 === 0L)
    assert(bloom(3L)._2 === exact(3L)._2)
  }

  test("tiny bloom filter saturates into false positives but still never under-flags") {
    val exact = Decontaminate.contaminationScore(
        bloomCorpus, bloomBench, "text", "doc_id", n = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val bloom = Sketch.bloomDecontaminate(
        bloomCorpus, bloomBench, "text", "doc_id", n = 3, k = 2, m = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    bloom.foreach { case (doc, flagged) =>
      assert(flagged >= exact(doc), s"doc $doc under-flagged at tiny m")
    }
    // 2 arms × ~5 shingles into 8 bits: saturation must produce at least
    // one false positive somewhere (doc 2 shares nothing yet gets flags)
    assert(bloom(2L) > 0L, "expected saturation false positives at m=8")
  }
}
