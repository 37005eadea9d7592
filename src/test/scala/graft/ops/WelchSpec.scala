package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class WelchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("welchOneVsRest flags a clearly-shifted group and not a homogeneous one") {
    // groups a/b/c ~ 100±small, group d shifted to ~200
    val rows =
      (1 to 30).map(i => ("a", 95L + (i % 11))) ++
      (1 to 30).map(i => ("b", 98L + (i % 7))) ++
      (1 to 30).map(i => ("c", 97L + (i % 9))) ++
      (1 to 30).map(i => ("d", 195L + (i % 11)))
    val got = Stats.welchOneVsRest(rows.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("d")._5, "shifted group must be significant")
    assert(got.size === 4)
    // the rest-mean seen from d is ~ the a/b/c level and vice versa
    assert(got("d")._3 > 190L * 1000000L && got("d")._4 < 110L * 1000000L)
    // a/b/c vs rest: their "rest" includes d, pulling the rest mean up —
    // each of them also differs from its rest (by construction of the
    // one-vs-rest design), so check against the exact scalar replay below
    // rather than asserting false here.
  }

  test("welchOneVsRest matches an exact BigInt replay of the inequality") {
    val rows = (1 to 25).map(i => ("x", (50 + 3 * (i % 5)).toLong)) ++
      (1 to 40).map(i => ("y", (60 + 2 * (i % 7)).toLong)) ++
      (1 to 15).map(i => ("z", (54 + (i % 3)).toLong))
    val df = rows.toDF("src", "v")
    val got = Stats.welchOneVsRest(df, "src", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    val all = rows.map { case (g, v) => (g, BigInt(v)) }
    def stats(p: ((String, BigInt)) => Boolean) = {
      val xs = all.filter(p).map(_._2)
      (BigInt(xs.size), xs.sum, xs.map(x => x * x).sum)
    }
    for (g <- Seq("x", "y", "z")) {
      val (na, sa, qa) = stats(_._1 == g)
      val (nb, sb, qb) = stats(_._1 != g)
      val diff = sa * nb - sb * na
      val lhs = diff * diff * (na - 1) * (nb - 1)
      val rhs = 4 * ((na * qa - sa * sa) * nb * nb * (nb - 1) +
        (nb * qb - sb * sb) * na * na * (na - 1))
      val expectSig = na >= 2 && nb >= 2 && lhs > rhs
      assert(got(g)._5 === expectSig, s"group $g flag")
      assert(BigInt(got(g)._2) === na)
      assert(BigInt(got(g)._3) === (sa * 1000000) / na, s"group $g mean_micro")
      assert(BigInt(got(g)._4) === (sb * 1000000) / nb, s"group $g rest mean")
    }
  }

  test("identical groups are not significant") {
    val rows = (1 to 40).flatMap(i => Seq(("p", (i % 10).toLong), ("q", (i % 10).toLong)))
    val got = Stats.welchOneVsRest(rows.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.forall(!_._5), "identical distributions must not flag")
  }

  // --- mannWhitneyOneVsRest ---

  test("mannWhitney matches an exact BigInt replay (doubled tie-averaged ranks)") {
    val rows = (1 to 25).map(i => ("x", (50 + 3 * (i % 5)).toLong)) ++
      (1 to 40).map(i => ("y", (60 + 2 * (i % 7)).toLong)) ++
      (1 to 15).map(i => ("z", (54 + (i % 3)).toLong))
    val got = Stats.mannWhitneyOneVsRest(rows.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    // reference: doubled average ranks over the sorted multiset
    val sorted = rows.map(_._2).sorted
    val r2ByValue = sorted.distinct.map { v =>
      val before = sorted.count(_ < v); val t = sorted.count(_ == v)
      v -> (BigInt(2) * before + t + 1)
    }.toMap
    val n = BigInt(rows.size)
    val ties = sorted.distinct.map { v =>
      val t = BigInt(sorted.count(_ == v)); t * t * t - t }.sum
    for (g <- Seq("x", "y", "z")) {
      val mine = rows.filter(_._1 == g).map(_._2)
      val na = BigInt(mine.size); val nb = n - na
      val u2 = mine.map(r2ByValue).sum - na * (na + 1)
      assert(BigInt(got(g)._3) === u2, s"group $g u2")
      val diff = u2 - na * nb
      val expectSig = na >= 2 && nb >= 2 &&
        3 * n * (n - 1) * diff * diff > 4 * na * nb * ((n * n * n - n) - ties)
      assert(got(g)._5 === expectSig, s"group $g flag")
      val num = (na * nb - u2) * 1000000
      val expectEffect = num / (na * nb) // BigInt / truncates toward zero
      assert(BigInt(got(g)._4) === expectEffect, s"group $g effect")
    }
  }

  test("mannWhitney: rank-shifted group flags with the right effect sign; identical does not") {
    val rows = (1 to 30).map(i => ("lo", (i % 10).toLong)) ++
      (1 to 30).map(i => ("hi", (100 + i % 10).toLong))
    val got = Stats.mannWhitneyOneVsRest(rows.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("hi")._5 && got("lo")._5)
    // hi stochastically dominates its rest: U large -> effect negative;
    // lo is dominated -> effect positive; complete separation -> |r| = 1
    assert(got("hi")._4 === -1000000L)
    assert(got("lo")._4 === 1000000L)
    val same = (1 to 40).flatMap(i => Seq(("p", (i % 10).toLong), ("q", (i % 10).toLong)))
    val z = Stats.mannWhitneyOneVsRest(same.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(z.forall(!_._5))
    assert(z.forall(_._4 === 0L), "identical ranks give zero effect")
  }

  test("olsTrend: exact fits, degenerate groups, day centering") {
    val dayUs = 86400000000L
    // "up": perfect line y = 2x + 3 over days 100..104 → slope 2, R² = 1
    // "flat": constant y = 7 → slope 0, deny = 0 → NULL R²
    // "one": a single day → den = 0 → NULL slope
    def ev(key: String, day: Long, n: Int) =
      (0 until n).map(i => (key, day * dayUs + i)) // i µs apart, same day
    val rows = (0 until 5).flatMap(d => ev("up", 100 + d, 3 + 2 * d)) ++
      (0 until 4).flatMap(d => ev("flat", 200 + d, 7)) ++
      ev("one", 300, 5)
    val df = rows.toDF("event_type", "ts_us")
    val got = Stats.olsTrend(df, "event_type", "ts_us")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("up") === (("up", 5L, Some(2000000L), Some(3000000L), Some(1000000L))))
    assert(got("flat") === (("flat", 4L, Some(0L), Some(7000000L), None)))
    assert(got("one") === (("one", 1L, None, None, None)))
    // negative slope floors toward −∞ consistently: y = −3x + 10
    val down = (0 until 4).flatMap(d => ev("down", 50 + d, 10 - 3 * d)).toDF("event_type", "ts_us")
    val gd = Stats.olsTrend(down, "event_type", "ts_us")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])].collect()(0)
    assert(gd._3 === Some(-3000000L) && gd._5 === Some(1000000L))
  }
}
