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
}
