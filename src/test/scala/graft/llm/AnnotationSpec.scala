package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AnnotationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- cohenKappaPairs ----

  private def kappa(rows: Seq[(Long, Long, String)]) =
    Annotation.cohenKappaPairs(rows.toDF("it", "an", "lb"), "it", "an", "lb")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("perfect agreement yields kappa = 1e6 and po = 10000bp") {
    val m = kappa(Seq((1L, 0L, "x"), (1L, 1L, "x"), (2L, 0L, "y"),
      (2L, 1L, "y")))
    val (n, agree, po, k) = m((0L, 1L))
    assert(n === 2L && agree === 2L && po === 10000L)
    assert(k === Some(1000000L))
  }

  test("agreement exactly at chance yields kappa = 0") {
    // each annotator splits x/y 50-50, agreeing half the time:
    // po = 1/2, pe = 1/2 -> kappa = 0
    val m = kappa(Seq(
      (1L, 0L, "x"), (1L, 1L, "x"), (2L, 0L, "x"), (2L, 1L, "y"),
      (3L, 0L, "y"), (3L, 1L, "x"), (4L, 0L, "y"), (4L, 1L, "y")))
    val (n, agree, po, k) = m((0L, 1L))
    assert(n === 4L && agree === 2L && po === 5000L)
    assert(k === Some(0L))
  }

  test("systematic disagreement gives negative kappa") {
    // always-opposite on a balanced binary task: po = 0, pe = 1/2
    val m = kappa(Seq(
      (1L, 0L, "x"), (1L, 1L, "y"), (2L, 0L, "y"), (2L, 1L, "x")))
    val (_, agree, _, k) = m((0L, 1L))
    assert(agree === 0L)
    assert(k === Some(-1000000L))
  }

  test("both annotators constant on the same class: kappa undefined (NULL)") {
    val m = kappa(Seq((1L, 0L, "x"), (1L, 1L, "x"), (2L, 0L, "x"),
      (2L, 1L, "x")))
    val (_, _, po, k) = m((0L, 1L))
    assert(po === 10000L && k === None)
  }

  test("only co-annotated items count; every unordered pair appears once") {
    val m = kappa(Seq(
      (1L, 0L, "x"), (1L, 1L, "x"), (1L, 2L, "y"),
      (2L, 0L, "x"), (3L, 1L, "y"), (4L, 2L, "y")))
    assert(m.keySet === Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(m((0L, 1L))._1 === 1L) // item 1 only
    assert(m((0L, 2L))._1 === 1L && m((0L, 2L))._2 === 0L)
  }

  // ---- resolveLabels ----

  private def resolve(rows: Seq[(Long, Long, String)]) =
    Annotation.resolveLabels(rows.toDF("it", "an", "lb"), "it", "an", "lb")
      .as[(Long, String, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  test("majority wins; confidence is an exact truncated basis-point") {
    val m = resolve(Seq((1L, 0L, "a"), (1L, 1L, "a"), (1L, 2L, "b")))
    val (_, label, n, nd, top, conf, tied, unan) = m(1L)
    assert(label === "a" && n === 3L && nd === 2L && top === 2L)
    assert(conf === 6666L) // 10000*2 div 3, truncated
    assert(!tied && !unan)
  }

  test("ties break to the largest label and are flagged") {
    val m = resolve(Seq((1L, 0L, "a"), (1L, 1L, "b")))
    val (_, label, _, _, _, conf, tied, unan) = m(1L)
    assert(label === "b" && conf === 5000L && tied && !unan)
  }

  test("unanimous items are flagged with confidence 10000") {
    val m = resolve(Seq((2L, 0L, "z"), (2L, 1L, "z"), (2L, 2L, "z")))
    val (_, label, _, nd, _, conf, tied, unan) = m(2L)
    assert(label === "z" && nd === 1L && conf === 10000L && !tied && unan)
  }

  test("null labels/items/annotators are dropped, not resolved") {
    val df = Seq((Some(1L), Some(0L), Some("a")), (Some(1L), Some(1L), None),
      (None, Some(2L), Some("b"))).toDF("it", "an", "lb")
    val out = Annotation.resolveLabels(df, "it", "an", "lb").collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_votes") === 1L)
  }

  // ---- lengthBiasAudit ----

  private def audit(rows: Seq[(Long, Long)]) =
    Annotation.lengthBiasAudit(rows.toDF("cl", "rl"), "cl", "rl")
      .as[(Long, Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap

  test("overall row aggregates all pairs under bucket -1") {
    val m = audit(Seq((100L, 50L), (30L, 60L), (10L, 10L)))
    val (_, n, lc, bp, gap) = m(-1L)
    assert(n === 3L && lc === 1L)
    assert(bp === Some(5000L)) // 1 of 2 UNEQUAL pairs
    // (50 - 30 + 0) * 1000 div 3 = 6666
    assert(gap === 6666L)
  }

  test("all-equal lengths: rate is NULL, gap zero, near-equal bucket") {
    val m = audit(Seq((5L, 5L), (7L, 7L)))
    assert(m.keySet === Set(-1L, 9L))
    assert(m(9L)._4 === None && m(9L)._5 === 0L)
  }

  test("bucket is the exact ratio decile; extreme mismatch lands in 0") {
    val m = audit(Seq((1000L, 5L), (99L, 100L)))
    // 10000*5 div 1000 div 1000 = 0; 10000*99 div 100 div 1000 = 9
    assert(m.contains(0L) && m.contains(9L))
    assert(m(0L)._3 === 1L) // the longer (chosen) side won
  }

  test("negative mean gap truncates toward zero like the oracle") {
    val m = audit(Seq((10L, 15L), (10L, 16L)))
    // gap_sum = -11; 1000 * -11 div 2 = -5500
    assert(m(-1L)._5 === -5500L)
  }
}
