package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class ModeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("modeByGroup: plain winner, smallest-value tie break, distinct count, group independence") {
    val df = Seq(
      ("a", 5L), ("a", 5L), ("a", 9L),             // clear winner 5
      ("b", 7L), ("b", 3L), ("b", 7L), ("b", 3L),  // tie 3/7 → smallest (3)
      ("c", 42L))                                  // singleton
      .toDF("g", "v")
    val out = Stats.modeByGroup(df, "g", "v")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 5L, 2L, 2L)))
    assert(out("b") === (("b", 3L, 2L, 2L)))
    assert(out("c") === (("c", 42L, 1L, 1L)))
    // no window sort: two hash aggregations only
    val plan = Stats.modeByGroup(df, "g", "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "mode must not plan a window sort")
  }

  test("modeByGroup: negative values tie-break correctly (struct order, not abs)") {
    val df = Seq(("a", -4L), ("a", -4L), ("a", 2L), ("a", 2L)).toDF("g", "v")
    val out = Stats.modeByGroup(df, "g", "v").as[(String, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(("a", -4L, 2L, 2L)))
  }
}
