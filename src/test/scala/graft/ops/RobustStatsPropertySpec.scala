package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/**
 * Randomized cross-checks: each robust-stats operator vs an independent
 * brute-force Scala reference on seeded random data (fixed seeds — the
 * suite is deterministic). The hand fixtures in the per-op specs pin the
 * tricky lanes; these sweeps pin everything else.
 */
class RobustStatsPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(20260815L)

  test("weightedMedianByGroup equals the brute-force cumulative-mass walk on 300 random groups") {
    val rows = (1 to 300).flatMap { g =>
      val n = 1 + rng.nextInt(12)
      (0 until n).map(_ => (s"g$g", rng.nextInt(21).toLong - 5L, rng.nextInt(4).toLong))
    }
    val got = Stats.weightedMedianByGroup(rows.toDF("g", "v", "w"), "g", "v", "w")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val want = sorted.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= tot } => v
      }.get
      assert(got(g) === want, s"group $g: ${sorted.mkString(",")}")
    }
  }

  test("modeByGroup equals brute-force (max count, smallest value) on 300 random groups") {
    val rows = (1 to 300).flatMap { g =>
      (0 until 1 + rng.nextInt(15)).map(_ => (s"g$g", rng.nextInt(6).toLong - 2L))
    }
    val got = Stats.modeByGroup(rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val counts = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val maxC = counts.values.max
      val want = counts.filter(_._2 == maxC).keys.min
      assert(got(g) === (want, maxC), s"group $g: $counts")
    }
  }

  test("trimmedMeanByGroup equals the brute-force sort-trim-average on 200 random groups") {
    val trimBp = 1200L
    val rows = (1 to 200).flatMap { g =>
      (0 until 1 + rng.nextInt(20)).map(_ => (s"g$g", rng.nextInt(2001).toLong - 1000L))
    }
    val got = Stats.trimmedMeanByGroup(rows.toDF("g", "v"), "g", "v", trimBp)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val k = (sorted.length * trimBp / 10000L).toInt
      val kept = sorted.slice(k, sorted.length - k)
      val sum = kept.map(BigInt(_)).sum * 1000000
      val want = (if (sum >= 0) sum / kept.length
                  else -((-sum) / kept.length)).toLong
      assert(got(g) === want, s"group $g: $sorted")
    }
  }

  test("mixtureInterleave positions equal a real global sort on random weights and totals") {
    val weights = Map("a" -> (1 + rng.nextInt(6)), "b" -> (1 + rng.nextInt(6)),
      "c" -> (1 + rng.nextInt(6)))
    val docs = Seq("a", "b", "c").flatMap { s =>
      (0 until rng.nextInt(40)).map(i => (s.hashCode.toLong * 1000 + i, s))
    }
    val out = graft.llm.Packing.mixtureInterleave(
        docs.toDF("doc_id", "source"), "doc_id", "source", weights)
      .as[(Long, String, Long, Long, Long)].collect()
    val si = Seq("a", "b", "c").zipWithIndex.toMap
    out.sortBy(r => (r._4, si(r._2), r._1)).zipWithIndex.foreach { case (r, i) =>
      assert(r._5 === i.toLong, s"weights $weights row $r expected position $i")
    }
    assert(out.map(_._5).sorted.toSeq === (0L until out.length.toLong))
  }
}
