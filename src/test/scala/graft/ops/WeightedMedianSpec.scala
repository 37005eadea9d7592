package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class WeightedMedianSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def wm(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long)] =
    Stats.weightedMedianByGroup(rows.toDF("g", "v", "w"), "g", "v", "w")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("lower weighted median: hand fixtures") {
    // equal weights → plain lower median
    assert(wm(Seq(("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 1L)))("a") === (3L, 3L, 20L))
    // even total mass crosses at the LOWER of the two middles
    assert(wm(Seq(("a", 10L, 1L), ("a", 20L, 1L)))("a") === (2L, 2L, 10L))
    // one heavy value dominates
    assert(wm(Seq(("a", 5L, 9L), ("a", 100L, 1L)))("a") === (2L, 10L, 5L))
    // weight matters: unweighted median of values would be 20
    assert(wm(Seq(("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 5L)))("a") === (3L, 7L, 30L))
  }

  test("ties share cumulative mass (RANGE frame): tie order cannot move the crossing") {
    // W(<=7) = 2 of 6 total: the median must be 9 no matter how the two
    // 7-rows are ordered internally
    assert(wm(Seq(("a", 7L, 1L), ("a", 7L, 1L), ("a", 9L, 4L)))("a") === (3L, 6L, 9L))
    // ties AT the crossing: both 7-rows sit at cum=4 of 6 → 7 wins
    assert(wm(Seq(("a", 7L, 2L), ("a", 7L, 2L), ("a", 9L, 2L)))("a") === (3L, 6L, 7L))
  }

  test("zero-weight rows never become the median; groups are independent") {
    val out = wm(Seq(
      ("a", 1L, 0L), ("a", 5L, 2L), ("a", 9L, 2L), // zero-weight 1 must not cross
      ("b", 42L, 3L)))
    assert(out("a") === (3L, 4L, 5L))
    assert(out("b") === (1L, 3L, 42L))
  }

  test("single shuffle for the window pair: total rides the same partitioning") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(org.apache.spark.sql.functions.col("l_returnflag").as("g"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("l_extendedprice") * 100).cast("long").as("v"),
        org.apache.spark.sql.functions.col("l_quantity").cast("long").as("w"))
    val out = Stats.weightedMedianByGroup(df, "g", "v", "w")
    val plan = out.queryExecution.executedPlan.toString
    // the value-ordered window and the group-total window must not each
    // demand their own exchange of the data side
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"too many shuffles ($exchanges):\n$plan")
    // sanity on real data: medians exist for the 3 flags and weights sum up
    val rows = out.as[(String, Long, Long, Long)].collect()
    assert(rows.length === 3)
    rows.foreach { case (_, n, tot, med) =>
      assert(n > 0 && tot > 0 && med > 0)
    }
  }
}
