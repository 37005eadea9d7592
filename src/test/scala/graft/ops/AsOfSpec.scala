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
}
