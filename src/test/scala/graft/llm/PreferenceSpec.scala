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

  private def adv(rows: Seq[(Long, Long, Long)]) =
    Preference.groupAdvantage(
        rows.toDF("prompt_id", "cid", "score"), "prompt_id", "cid", "score")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._2 -> r).toMap // keyed by cid (unique)

  test("groupAdvantage: exact micro-unit advantage vs the group mean") {
    // group mean of (5, 9, 2) = 16/3; floor(16e6/3) = 5333333
    val m = adv(Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 2L)))
    assert(m(10L) === ((1L, 10L, 5L, 3L, 5000000L - 5333333L, 4L, false)))
    assert(m(11L) === ((1L, 11L, 9L, 3L, 9000000L - 5333333L, 0L, true)))
    assert(m(12L) === ((1L, 12L, 2L, 3L, 2000000L - 5333333L, 7L, false)))
    // advantages telescope: sum = total·10⁶ − n·⌊total·10⁶/n⌋ ∈ [0, n−1]
    val s = m.values.map(_._5).sum
    assert(s >= 0L && s < 3L, s"advantage sum out of flooring band: $s")
  }

  test("groupAdvantage: chosen tie-break is (score, cid) struct-max; one chosen per group") {
    val m = adv(Seq((1L, 10L, 5L), (1L, 11L, 5L), (2L, 20L, 7L)))
    assert(!m(10L)._7 && m(11L)._7) // tie at 5 → max cid chosen
    assert(m(20L)._7)               // singleton group: chosen, adv 0, gap 0
    assert(m(20L)._5 === 0L && m(20L)._6 === 0L)
  }

  test("groupAdvantage matches buildPairs on the extremes") {
    val rows = (0L until 40L).map(i => (i % 4, i, (i * 7) % 23))
    val m = adv(rows)
    val p = pairs(rows, minGap = 1)
    p.foreach { case (prompt, pair) =>
      val chosen = m.values.filter(v => v._1 == prompt && v._7)
      assert(chosen.map(_._2).toSeq === Seq(pair._2)) // same chosen cid
      assert(chosen.head._6 === 0L)
      // the pair's gap equals the rejected candidate's gap_to_best
      assert(m(pair._3)._6 === pair._6)
    }
  }
}
