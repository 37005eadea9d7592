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
}
