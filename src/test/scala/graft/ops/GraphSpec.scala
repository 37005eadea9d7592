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

  test("triangleCounts: hand-computed triangles, clustering coefficients, degenerate cases") {
    import spark.implicits._
    // K4 minus edge {a,b}: triangles acd + bcd → a:1 b:1 c:2 d:2
    val k4m = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"))
      .toDF("s", "d")
    val got = Graph.triangleCounts(k4m, "s", "d")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 2L, 1L, 1000000L)))
    assert(got("b") === (("b", 2L, 1L, 1000000L)))
    assert(got("c") === (("c", 3L, 2L, 666666L)))
    assert(got("d") === (("d", 3L, 2L, 666666L)))
    // a path has no triangles; duplicate / reversed / self-loop edges
    // must not create any
    val path = Seq(("p", "q"), ("q", "p"), ("q", "r"), ("q", "r"), ("r", "r"))
      .toDF("s", "d")
    val pg = Graph.triangleCounts(path, "s", "d")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(pg.values.forall(_._3 === 0L))
    assert(pg("q")._2 === 2L && pg("p")._2 === 1L) // deduped degrees
    // K5: every node in C(4,2)=6 triangles at lcc exactly 1
    val k5 = (for { i <- 0 until 5; j <- i + 1 until 5 } yield (s"n$i", s"n$j"))
      .toDF("s", "d")
    val kg = Graph.triangleCounts(k5, "s", "d")
      .as[(String, Long, Long, Long)].collect()
    assert(kg.forall(r => r._2 == 4L && r._3 == 6L && r._4 == 1000000L))
  }

  test("ancestorClosure: deep chain closes completely with no duplicates") {
    import spark.implicits._
    // chain 1→2→3→…→13 (child points to child+1): node 1 has 12 ancestors
    val chain = (1 to 12).map(i => (i.toLong, i.toLong + 1)).toDF("c", "p")
    val cl = Graph.ancestorClosure(chain, "c", "p", maxDepth = 16)
      .as[(Long, Long, Long)].collect()
    // exact expectation: node i reaches ancestor j>i at dist j−i
    val expected = (for { i <- 1L to 12L; j <- i + 1 to 13L }
      yield (i, j, j - i)).toSet
    assert(cl.toSet === expected)
    assert(cl.length === expected.size, "no duplicate closure rows")
  }

  test("ancestorClosure: forest with multiple roots, maxDepth truncates") {
    import spark.implicits._
    val forest = Seq((10L, 1L), (11L, 1L), (20L, 2L), (21L, 20L), (22L, 21L))
      .toDF("c", "p")
    val cl = Graph.ancestorClosure(forest, "c", "p", maxDepth = 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(cl === Set((10L, 1L, 1L), (11L, 1L, 1L), (20L, 2L, 1L),
      (21L, 20L, 1L), (21L, 2L, 2L), (22L, 21L, 1L), (22L, 20L, 2L),
      (22L, 2L, 3L)))
    // maxDepth=2 drops only the dist-3 row
    val cut = Graph.ancestorClosure(forest, "c", "p", maxDepth = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(cut === cl.filter(_._3 <= 2L))
  }

  test("ancestorClosure: round count is logarithmic in maxDepth") {
    import spark.implicits._
    // depth 40 chain under maxDepth 64 → 6 doubling rounds must suffice
    val chain = (1 to 40).map(i => (i.toLong, i.toLong + 1)).toDF("c", "p")
    val cl = Graph.ancestorClosure(chain, "c", "p", maxDepth = 64)
    assert(cl.filter($"node" === 1L).count() === 40L)
    assert(cl.filter($"node" === 1L && $"dist" === 40L).count() === 1L)
  }
}
