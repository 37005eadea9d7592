package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class TheilSenSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    Stats.theilSen(rows.toDF("key", "t", "x"), "key", "t", "x")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("clean linear series recovers the exact slope") {
    // x = 3t: every pairwise slope is exactly 3
    val out = ts((0L to 4L).map(t => ("a", t, 3 * t)))
    assert(out("a") === (10L, 3000000L))
  }

  test("outlier-proof: one wild point cannot move the median slope (OLS would bend)") {
    // x = 2t except a massive spike at t=2
    val out = ts(Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 1000L),
      ("a", 3L, 6L), ("a", 4L, 8L)))
    // 10 pairs: 6 clean ones have slope exactly 2; the 4 spike pairs are
    // huge or hugely negative. Sorted, the lower median (rank 5) is 2.0
    assert(out("a") === (10L, 2000000L))
  }

  test("negative slopes floor symmetrically (sign-split, not toward -inf)") {
    // x = -3t: every slope is exactly -3; a div-floor toward -inf on
    // (-3*1e6 + remainder) would be caught by any non-integer pair
    val out = ts(Seq(("a", 0L, 9L), ("a", 2L, 3L), ("a", 3L, 0L)))
    assert(out("a") === (3L, -3000000L))
    // fractional negative: slope -1/3 → micro floor of abs = -333333
    val frac = ts(Seq(("b", 0L, 1L), ("b", 3L, 0L)))
    assert(frac("b") === (1L, -333333L))
  }

  test("even pair count takes the LOWER median; groups independent") {
    // 2 pairs with slopes 1 and 3 → lower median 1
    val out = ts(Seq(("a", 0L, 0L), ("a", 1L, 1L), ("a", 2L, 4L))
      .filterNot { case (_, t, _) => false } ++ Seq(("c", 0L, 5L), ("c", 1L, 5L)))
    // key a pairs: (0,1)=1, (0,2)=2, (1,2)=3 → 3 pairs, median 2
    assert(out("a") === (3L, 2000000L))
    assert(out("c") === (1L, 0L))
  }
}
