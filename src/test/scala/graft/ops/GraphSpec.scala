package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pageRankInt matches the hand-computed integer iteration on a 3-node graph") {
    // A -> B, B -> A, C -> A   (C is a source; A,B form a cycle)
    val e = Seq(("A", "B"), ("B", "A"), ("C", "A")).toDF("s", "d")
    val r1 = Graph.pageRankInt(e, "s", "d", iters = 1)
      .as[(String, Long)].collect().toMap
    // iter 1 from r0 = 1_000_000 each, outdeg 1 for all:
    //   A <- B(1_000_000) + C(1_000_000): 150000 + 85*2_000_000/100 = 1_850_000
    //   B <- A(1_000_000):                150000 + 850_000          = 1_000_000
    //   C <- nothing:                     150000
    assert(r1 === Map("A" -> 1850000L, "B" -> 1000000L, "C" -> 150000L))
    val r2 = Graph.pageRankInt(e, "s", "d", iters = 2)
      .as[(String, Long)].collect().toMap
    // iter 2: A <- B(1_000_000) + C(150_000) -> 150000 + 85*1_150_000/100 = 1_127_500
    //         B <- A(1_850_000)              -> 150000 + 1_572_500        = 1_722_500
    assert(r2 === Map("A" -> 1127500L, "B" -> 1722500L, "C" -> 150000L))
  }

  test("per-edge floor shares split an out-degree-2 node's rank") {
    // A -> B and A -> C: each edge carries floor(1_000_000 / 2)
    val e = Seq(("A", "B"), ("A", "C")).toDF("s", "d")
    val r = Graph.pageRankInt(e, "s", "d", iters = 1)
      .as[(String, Long)].collect().toMap
    assert(r("B") === 150000L + 85L * 500000L / 100L)
    assert(r("B") === r("C"))
    assert(r("A") === 150000L) // dangling-in: no in-links
  }

  test("a node everyone links outranks the rest, and ranks are deterministic") {
    val e = (1 to 50).map(i => (s"n$i", "hub")) ++ Seq(("hub", "n1"))
    val df = e.toDF("s", "d")
    val r = Graph.pageRankInt(df, "s", "d", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(r("hub") > r("n2") * 10, "hub must dominate")
    val again = Graph.pageRankInt(df, "s", "d", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(r === again)
  }
}
