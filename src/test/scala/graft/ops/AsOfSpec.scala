package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("as-of backward join picks nearest prior right row per key") {
    val trades = Seq((1L, 10L, "buy"), (1L, 20L, "sell"), (2L, 5L, "buy"))
      .toDF("acct", "t", "side")
    val quotes = Seq((1L, 8L, 1.00), (1L, 15L, 2.00), (1L, 20L, 3.00), (3L, 1L, 9.99))
      .toDF("acct", "t", "px")
    val out = AsOf.asofBackward(trades, quotes,
        col("acct"), col("acct"), col("t"), col("t"),
        Seq("qt" -> col("t"), "px" -> col("px")))
      .select($"acct", $"t", $"side", $"__asof.qt", $"__asof.px")
      .as[(Long, Long, String, Option[Long], Option[Double])].collect().toSet
    assert(out === Set(
      (1L, 10L, "buy", Some(8L), Some(1.00)),
      (1L, 20L, "sell", Some(20L), Some(3.00)),   // equal time qualifies (<=)
      (2L, 5L, "buy", None, None)))               // no prior quote
  }

  test("binned range join equals the naive theta join, without a nested loop") {
    val points = Seq((1L, 5L), (2L, 15L), (3L, 95L)).toDF("pid", "t")
    val intervals = Seq((10L, 1L, 9L), (20L, 10L, 30L), (30L, 12L, 16L)).toDF("iid", "s", "e")
    val out = AsOf.binnedRangeJoin(points, intervals, col("t"), col("s"), col("e"), binSize = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 20L), (2L, 30L)))  // t=95 matches nothing
    val plan = AsOf.binnedRangeJoin(points, intervals, col("t"), col("s"), col("e"), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("plan shuffles once on the key — no range cross-product") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = AsOf.asofBackward(l, r, col("k"), col("k"), col("t"), col("t"),
      Seq("v" -> col("v"))).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("nearest join picks the smaller |dt| in either direction, ties to the prior side") {
    val l = Seq((1L, 10L, "a"), (1L, 26L, "b"), (1L, 40L, "c"),
                (2L, 7L, "d"), (3L, 1L, "e"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 4L, 100L), (1L, 20L, 200L), (1L, 32L, 300L),
                (2L, 7L, 400L), (2L, 9L, 500L))
      .toDF("k", "t", "rid")
    val out = AsOf.nearestJoin(l, r, col("k"), col("k"), col("t"), col("t"),
        Seq("rid" -> col("rid")))
      .select($"tag", $"__near.rid", $"__dt")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(out === Set(
      ("a", Some(100L), Some(-6L)),   // 4 is 6 behind, 20 is 10 ahead → prior closer
      ("b", Some(200L), Some(-6L)),   // 20 is 6 behind, 32 is 6 ahead → TIE → prior wins
      ("c", Some(300L), Some(-8L)),   // only-behind fallback
      ("d", Some(400L), Some(0L)),    // exact-time hit, dt = 0 (backward frame)
      ("e", None, None)))             // key with no right rows
  }

  test("nearest join 'a' case is genuinely forward when forward is closer") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 2L, 9L), (1L, 13L, 7L)).toDF("k", "t", "rid")
    val out = AsOf.nearestJoin(l, r, col("k"), col("k"), col("t"), col("t"),
        Seq("rid" -> col("rid")))
      .select($"__near.rid", $"__dt").as[(Long, Long)].head()
    assert(out === ((7L, 3L)))
  }

  test("nearest join plans one shuffle, no nested loop, both frames in one sort") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = AsOf.nearestJoin(l, r, col("k"), col("k"), col("t"), col("t"),
      Seq("v" -> col("v"))).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan)
  }

  test("intervalOverlapJoin: reciprocal threshold, bin dedup, key separation") {
    // a1 [0,100) and b1 [50,150): ov=50 = 50% of both → kept at 5000 bp.
    // a2 [0,100) and b2 [90,100): ov=10 = 100% of b2 but 10% of a2 →
    //   RECIPROCAL test kills it.
    // a3 [200,210) and b3 [205,215): ov=5, 50% of both → kept; spans are
    //   within one bin.
    // b4 on key 2 overlaps a1's coordinates but not its key.
    val a = Seq((1L, 1L, 0L, 100L), (2L, 1L, 0L, 100L), (3L, 1L, 200L, 210L))
      .toDF("a_id", "ka", "sa", "ea")
    val b = Seq((1L, 1L, 50L, 150L), (2L, 1L, 90L, 100L), (3L, 1L, 205L, 215L),
      (4L, 2L, 0L, 100L)).toDF("b_id", "kb", "sb", "eb")
    def run(bin: Long) = AsOf.intervalOverlapJoin(
      a.filter($"a_id" =!= 2L), b, col("ka"), col("kb"),
      col("sa"), col("ea"), col("sb"), col("eb"),
      binSize = bin, minOverlapBp = 5000)
      .select($"a_id", $"b_id", $"overlap_len").as[(Long, Long, Long)]
      .collect().toSet
    val expected = Set((1L, 1L, 50L), (3L, 3L, 5L))
    // tiny bins: the (a1,b1) pair shares MANY bins — must still appear once
    assert(run(7L) === expected)
    assert(run(1000L) === expected)
    // a2 vs b2: one-sided containment fails the reciprocal test
    val asym = AsOf.intervalOverlapJoin(a.filter($"a_id" === 2L),
      b.filter($"b_id" === 2L), col("ka"), col("kb"),
      col("sa"), col("ea"), col("sb"), col("eb"), 50L, 5000L)
    assert(asym.count() === 0)
    // but at 10% reciprocal it passes
    val loose = AsOf.intervalOverlapJoin(a.filter($"a_id" === 2L),
      b.filter($"b_id" === 2L), col("ka"), col("kb"),
      col("sa"), col("ea"), col("sb"), col("eb"), 50L, 1000L)
    assert(loose.select($"overlap_len").as[Long].collect().toSeq === Seq(10L))
  }

  test("intervalOverlapJoin: touching half-open intervals do not overlap") {
    val a = Seq((1L, 1L, 0L, 10L)).toDF("a_id", "ka", "sa", "ea")
    val b = Seq((1L, 1L, 10L, 20L)).toDF("b_id", "kb", "sb", "eb")
    assert(AsOf.intervalOverlapJoin(a, b, col("ka"), col("kb"),
      col("sa"), col("ea"), col("sb"), col("eb"), 5L, 0L).count() === 0)
  }

  test("intervalCoverage: stacked depths, abutting intervals merge, per-key isolation") {
    // key 1: [0,10) [5,15) [5,8)  →  depth profile:
    //   [0,5)=1, [5,8)=3, [8,10)=2, [10,15)=1  ⇒ d1: 5+5=10, d2: 2, d3: 3
    // key 2: [0,5) [5,10) abut → ONE depth-1 run of 10, no zero-length seam
    val iv = Seq((1L, 0L, 10L), (1L, 5L, 15L), (1L, 5L, 8L),
      (2L, 0L, 5L), (2L, 5L, 10L)).toDF("k", "s", "e")
    val out = AsOf.intervalCoverage(iv, col("k"), col("s"), col("e"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map((1L, 1L) -> 10L, (1L, 2L) -> 2L, (1L, 3L) -> 3L,
      (2L, 1L) -> 10L))
  }

  test("intervalCoverage: identical intervals stack; disjoint gaps emit nothing") {
    val iv = Seq((1L, 3L, 7L), (1L, 3L, 7L), (1L, 20L, 22L)).toDF("k", "s", "e")
    val out = AsOf.intervalCoverage(iv, col("k"), col("s"), col("e"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // [3,7) at depth 2 (both copies), [20,22) at depth 1; the [7,20) gap
    // has depth 0 and must not appear
    assert(out === Map((1L, 2L) -> 4L, (1L, 1L) -> 2L))
  }

  test("mergeIntervals: overlap and touch coalesce, gaps split, contained spans absorb") {
    // key 1: [0,5] [5,9] touch-merge; [3,4] contained; [12,15] gap-split.
    // key 2: nested chain [0,100] [10,20] [30,40] — one island, 3 rows.
    val iv = Seq((1L, 0L, 5L), (1L, 5L, 9L), (1L, 3L, 4L), (1L, 12L, 15L),
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 30L, 40L)).toDF("k", "s", "e")
    val out = AsOf.mergeIntervals(iv, col("k"), col("s"), col("e"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 9L, 3L), (1L, 12L, 15L, 1L),
      (2L, 0L, 100L, 3L)))
  }

  test("mergeIntervals: a later interval inside an EARLIER long span does not restart an island") {
    // the running max must be over ALL preceding ends, not just the lag-1
    // neighbor: [0,50] [1,2] [3,4] — lag-1 end of [3,4] is 2, but 3 < 50
    val iv = Seq((7L, 0L, 50L), (7L, 1L, 2L), (7L, 3L, 4L)).toDF("k", "s", "e")
    val out = AsOf.mergeIntervals(iv, col("k"), col("s"), col("e"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((7L, 0L, 50L, 3L)))
  }

  test("mergeIntervals equals naive union-sweep on random keys") {
    val rng = new scala.util.Random(7)
    val iv = (0 until 400).map { _ =>
      val s = rng.nextInt(60).toLong
      (rng.nextInt(12).toLong, s, s + 1 + rng.nextInt(15))
    }
    val got = AsOf.mergeIntervals(iv.toDF("k", "s", "e"), col("k"), col("s"), col("e"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = iv.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity)
      val islands = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      sorted.foreach { case (s, e) =>
        if (islands.nonEmpty && s <= islands.last._2)
          islands(islands.size - 1) = (islands.last._1,
            math.max(islands.last._2, e), islands.last._3 + 1)
        else islands += ((s, e, 1L))
      }
      islands.map(i => (k, i._1, i._2, i._3))
    }.toSet
    assert(got === expected)
  }
}
