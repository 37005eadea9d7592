package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Preference-pair construction (llm/Preference.scala). */
class PreferenceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long, Long)], minGap: Long = 1) =
    Preference.buildPairs(
        rows.toDF("prompt_id", "cid", "score"),
        "prompt_id", "cid", "score", minGap)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("best-vs-worst per prompt with gap and counts") {
    val m = pairs(Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 2L)))
    assert(m(1L) === ((1L, 11L, 12L, 9L, 2L, 7L, 3L)))
  }

  test("score ties break on highest/lowest candidate id deterministically") {
    val m = pairs(Seq((1L, 10L, 5L), (1L, 11L, 5L), (1L, 3L, 1L), (1L, 2L, 1L)))
    assert(m(1L)._2 === 11L) // chosen: tie at 5 → max cid
    assert(m(1L)._3 === 2L)  // rejected: tie at 1 → min cid
  }

  test("single-candidate prompts and sub-gap pairs are dropped") {
    val m = pairs(Seq((1L, 10L, 5L), (2L, 20L, 9L), (2L, 21L, 8L)), minGap = 5)
    assert(m.keySet === Set.empty[Long]) // p1: n=1; p2: gap 1 < 5
  }
}
