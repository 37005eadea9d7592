package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Exact Gini coefficient: closed-form fixtures, tie invariance, floor. */
class GiniSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def gini(rows: Seq[(String, Long)]): Map[String, (Long, Long, Option[Long])] =
    Stats.giniByGroup(rows.toDF("k", "v"), "k", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  test("closed forms: uniform 0, one-hot (n-1)/n, arithmetic ramp 1/4") {
    val g = gini(Seq("u" -> 5L, "u" -> 5L, "u" -> 5L, "u" -> 5L,
      "h" -> 0L, "h" -> 0L, "h" -> 0L, "h" -> 12L,
      "r" -> 1L, "r" -> 2L, "r" -> 3L, "r" -> 4L))
    assert(g("u") === ((4L, 20L, Some(0L))))
    assert(g("h") === ((4L, 12L, Some(750000L))))
    assert(g("r") === ((4L, 10L, Some(250000L))))
  }

  test("floor division and zero-total NULL") {
    val g = gini(Seq("f" -> 1L, "f" -> 1L, "f" -> 3L,
      "z" -> 0L, "z" -> 0L))
    assert(g("f") === ((3L, 5L, Some(266666L))))   // 4/15 floored
    assert(g("z") === ((2L, 0L, None)))
  }

  test("tie order cannot change the result") {
    // many tied values: any rank permutation among ties gives the same sum
    val a = gini(Seq("t" -> 7L, "t" -> 7L, "t" -> 7L, "t" -> 1L))
    val b = gini(Seq("t" -> 1L, "t" -> 7L, "t" -> 7L, "t" -> 7L))
    assert(a === b)
  }

  test("autocorr: alternating series lag signs, hand values, sign-split floor") {
    // x = 1,2,1,2,1,2: dev = 6x−9 = ±3; den = 54
    // lag1: 5 pairs of −9 → r = −floor(45e6/54) = −833333 (sign-split)
    // lag2: 4 pairs of +9 → r = floor(36e6/54) = 666666
    val df = (1L to 6L).map(t => ("A", t, if (t % 2 == 1) 1L else 2L))
      .toDF("k", "t", "x")
    val got = Stats.autocorr(df, "k", "t", "x", Seq(1, 2))
      .orderBy("lag").as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(("A", 1L, 5L, Some(-833333L)),
      ("A", 2L, 4L, Some(666666L))))
  }

  test("autocorr: time gaps shrink the pair set; constant series is NULL") {
    val df = Seq(("B", 1L, 5L), ("B", 2L, 7L), ("B", 4L, 9L),
      ("C", 1L, 3L), ("C", 2L, 3L)).toDF("k", "t", "x")
    val got = Stats.autocorr(df, "k", "t", "x", Seq(1))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("B")._3 === 1L, "only (1,2) pairs — never across the t=3 hole")
    assert(got("C")._4 === None, "zero variance → NULL")
  }
}
