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

  test("plan shuffles once on the key — no range cross-product") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = AsOf.asofBackward(l, r, col("k"), col("k"), col("t"), col("t"),
      Seq("v" -> col("v"))).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
