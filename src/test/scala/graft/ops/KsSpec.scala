package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Exact one-vs-rest Kolmogorov–Smirnov ([[Stats.ksOneVsRest]]). */
class KsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Dense BigInt replay of the KS definition: evaluate
    * |cumG(v)·n − cumTot(v)·ng| at EVERY pooled distinct value — the naive
    * O(groups × values) form the distributed operator provably shortcuts. */
  private def denseD(rows: Seq[(String, Long)]): Map[String, (BigInt, BigInt, BigInt)] = {
    val n = BigInt(rows.size)
    val pooled = rows.map(_._2).distinct.sorted
    rows.map(_._1).distinct.map { g =>
      val gs = rows.filter(_._1 == g).map(_._2)
      val ng = BigInt(gs.size)
      val dnum = pooled.map { v =>
        val cumG = BigInt(gs.count(_ <= v))
        val cumTot = BigInt(rows.count(_._2 <= v))
        (cumG * n - cumTot * ng).abs
      }.max
      g -> (ng, n - ng, dnum)
    }.toMap
  }

  private def run(rows: Seq[(String, Long)]): Map[String, (String, Long, Long, Boolean)] =
    Stats.ksOneVsRest(rows.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap

  test("sparse evaluation matches the dense D_num replay exactly (ties, gaps, heads/tails)") {
    // deliberately nasty: shared values (ties across groups), values unique
    // to one group, a group whose support starts after / ends before others
    val rows =
      (1 to 23).map(i => ("a", (i % 7).toLong * 3)) ++
      (1 to 31).map(i => ("b", (i % 11).toLong * 2 + 1)) ++
      (1 to 17).map(i => ("c", (i % 5).toLong + 40)) ++
      Seq(("a", 40L), ("b", 40L), ("c", 0L))
    val got = run(rows)
    val expect = denseD(rows)
    assert(got.keySet === expect.keySet)
    for ((g, (ng, nb, dnum)) <- expect) {
      assert(BigInt(got(g)._2) === ng, s"$g n")
      assert(BigInt(got(g)._3) === dnum * 1000000 / (ng * nb), s"$g d_micro")
      val expectSig = dnum * dnum * 1000000 > BigInt(1844440) * (ng + nb) * ng * nb
      assert(got(g)._4 === expectSig, s"$g flag")
    }
  }

  test("spread-only drift: equal means, wider spread — KS flags where Welch does not") {
    // group w: symmetric wide around 100; rest: tight around 100. Means are
    // identical by construction, so the location test (a22) stays quiet and
    // the ECDF test must fire — the scenario that motivates having both.
    val rows =
      (1 to 60).map(i => ("n1", 100L + (i % 3) - 1)) ++   // 99..101
      (1 to 60).map(i => ("n2", 100L + (i % 3) - 1)) ++
      (1 to 60).map(i => ("w", 100L + 40L * ((i % 3) - 1))) // 60/100/140
    val ks = run(rows)
    assert(ks("w")._4, "wide group must be KS-significant")
    val welch = Stats.welchOneVsRest(rows.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r._5).toMap
    assert(!welch("w"), "equal-mean spread change must NOT trip the location test")
  }

  test("identical groups are not significant and carry near-zero D") {
    val rows = (1 to 50).flatMap(i => Seq(("p", (i % 10).toLong), ("q", (i % 10).toLong)))
    val got = run(rows)
    assert(!got("p")._4 && !got("q")._4)
    assert(got("p")._3 === 0L && got("q")._3 === 0L)
  }

  test("single group: null d_micro, not significant (no rest exists)") {
    val row = Stats.ksOneVsRest((1 to 9).map(i => ("only", i.toLong)).toDF("src", "v"),
      "src", "v").collect().head
    assert(row.isNullAt(2) && !row.getBoolean(3))
    assert(row.getLong(1) === 9L)
  }
}
