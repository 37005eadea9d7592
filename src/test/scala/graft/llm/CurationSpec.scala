package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("curationFunnel: every stage visible in the per-source report") {
    val good1 = "the query planner pushes each filter below the join so the scan reads fewer pages"
    val good2 = "a sort merge join shuffles both sides by key while a broadcast join ships the small table"
    // same first-8-token opening as good1, different tail → opening-fingerprint dup
    val dupOfGood1 = "the query planner pushes each filter below the join but then rewrites the residual predicate"
    val spam = "click here click here click here best price best price best price"
    val rows = Seq(
      (1L, good1, "a"), (2L, dupOfGood1, "a"), (3L, spam, "a"),
      (4L, good2, "b"), (5L, "", "b"))
      .toDF("doc_id", "text", "source")
    val out = Curation.curationFunnel(rows, "doc_id", "text", "source",
        QualityClassifier.DefaultModel, java.math.BigDecimal.ZERO)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // source a: 3 in, spam fails the gate, dup collapses onto doc 1
    val (_, aIn, aQ, aF, aTok) = out("a")
    assert(aIn === 3L && aQ === 2L && aF === 1L)
    assert(aTok === good1.split("\\s+").length.toLong) // keep-first wins → doc 1's tokens
    // source b: empty doc counts in n_in but can never pass the gate
    val (_, bIn, bQ, bF, _) = out("b")
    assert(bIn === 2L && bQ === 1L && bF === 1L)
  }

  test("curationFunnel: keep-first is by ascending id within a fingerprint") {
    val t1 = "the query planner pushes each filter below the join so the scan reads fewer pages"
    val t2 = "the query planner pushes each filter below the join and prunes columns early too"
    // higher id first in the data — survivor must still be the LOWER id
    val rows = Seq((9L, t2, "s"), (2L, t1, "s")).toDF("doc_id", "text", "source")
    val fin = Curation.curationFunnel(rows, "doc_id", "text", "source",
        QualityClassifier.DefaultModel, java.math.BigDecimal.ZERO)
      .as[(String, Long, Long, Long, Long)].collect()(0)
    assert(fin._4 === 1L) // one survivor
    assert(fin._5 === t1.split("\\s+").length.toLong) // doc 2 (lower id) kept
  }

  test("filterOverlapMatrix: pair intersections, only-counts, null conditions") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 10, true),   // fails A (x<20) and B (flag)
      (2L, 10, false),  // fails ONLY A
      (3L, 50, true),   // fails ONLY B
      (4L, 50, false),  // fails nothing → contributes nowhere
      (5L, 10, true)    // fails A and B
    ).toDF("id", "x", "flag")
    val got = Curation.filterOverlapMatrix(df, Seq(
        "A" -> (col("x") < 20),
        "B" -> col("flag"),
        "C" -> (col("x") > 1000)))        // never fires → absent entirely
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("A", "A")) === 3L)        // diagonal = total fails
    assert(got(("B", "B")) === 3L)
    assert(got(("A", "B")) === 2L)        // docs 1 and 5
    assert(got(("A", "__only__")) === 1L) // doc 2
    assert(got(("B", "__only__")) === 1L) // doc 3
    assert(!got.keys.exists(_._1 == "C") && !got.keys.exists(_._2 == "C"))
    assert(!got.contains(("B", "A")), "pairs keep declared order")
    // NULL condition values count as not-failing, not as errors
    val withNull = Seq((1L, Some(true)), (2L, None)).toDF("id", "f")
    val g2 = Curation.filterOverlapMatrix(withNull, Seq("N" -> col("f")))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(g2(("N", "N")) === 1L)
  }
}
