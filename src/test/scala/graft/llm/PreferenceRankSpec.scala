package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PreferenceRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def bt(rows: Seq[(String, String, Long)], rounds: Int = 6) =
    PreferenceRank.bradleyTerry(rows.toDF("w", "l", "n"), "w", "l", "n", rounds)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("a dominant item gets the highest weight, a pure loser the lowest") {
    val m = bt(Seq(("a", "b", 9L), ("b", "a", 1L),
      ("a", "c", 8L), ("c", "a", 2L), ("b", "c", 6L), ("c", "b", 4L)))
    val wA = m("a")._3; val wB = m("b")._3; val wC = m("c")._3
    assert(wA > wB && wB > wC, m.toString)
    assert(m("a")._1 === 17L && m("a")._2 === 3L) // wins / losses bookkeeping
  }

  test("perfect symmetry yields equal weights summing to ~1e6") {
    val m = bt(Seq(("x", "y", 5L), ("y", "x", 5L),
      ("y", "z", 5L), ("z", "y", 5L), ("x", "z", 5L), ("z", "x", 5L)))
    val ws = m.values.map(_._3).toSeq
    assert(ws.distinct.size === 1, m.toString)
    assert(math.abs(ws.sum - 1000000L) <= 3, s"sum ${ws.sum}")
  }

  test("a never-winner survives via the clamp (weight >= 1, no crash)") {
    val m = bt(Seq(("a", "b", 10L), ("a", "c", 10L), ("b", "c", 10L)))
    assert(m("c")._3 >= 1L && m("c")._1 === 0L && m("c")._2 === 20L)
    assert(m("a")._3 > m("b")._3 && m("b")._3 > m("c")._3)
  }

  test("weights are invariant to duplicate count rows (pre-aggregation)") {
    val once = bt(Seq(("a", "b", 6L), ("b", "a", 2L)))
    val split = bt(Seq(("a", "b", 4L), ("a", "b", 2L), ("b", "a", 1L), ("b", "a", 1L)))
    assert(once === split)
  }

  test("winner == loser self-pairs are rejected with a readable error") {
    val e = intercept[IllegalArgumentException] {
      bt(Seq(("a", "b", 3L), ("b", "b", 1L)))
    }
    assert(e.getMessage.contains("self-comparison"), e.getMessage)
  }

  test("distinct-item counts above maxItems fail fast before collecting") {
    val many = (1 to 30).map(i => (s"i$i", s"j$i", 1L)).toDF("w", "l", "n")
    val e = intercept[IllegalArgumentException] {
      PreferenceRank.bradleyTerry(many, "w", "l", "n", rounds = 2, maxItems = 10)
    }
    assert(e.getMessage.contains("maxItems=10"), e.getMessage)
    // and the same input passes once the ceiling admits it
    val ok = PreferenceRank.bradleyTerry(many, "w", "l", "n", rounds = 2, maxItems = 30)
    assert(ok.count() === 60L)
  }
}
