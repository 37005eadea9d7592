package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Randomized cross-checks for the sweep/series operators: each vs a
 * deliberately naive reference (per-base counting, full pairwise
 * enumeration) that is O(too-slow) at scale but trivially correct on
 * seeded small data.
 */
class SweepCrossCheckSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(815L)

  test("intervalCoverage equals naive per-base depth counting on 60 random keys") {
    val iv = (1 to 60).flatMap { k =>
      (0 until 1 + rng.nextInt(8)).map { _ =>
        val s = rng.nextInt(50).toLong
        (k.toLong, s, s + 1 + rng.nextInt(20))
      }
    }
    val got = AsOf.intervalCoverage(iv.toDF("k", "s", "e"), col("k"), col("s"), col("e"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = iv.groupBy(_._1).flatMap { case (k, rs) =>
      // depth of every integer base, the O(bases) way
      val depth = (0L until 80L).map(p => p -> rs.count(r => r._2 <= p && p < r._3).toLong)
      depth.filter(_._2 > 0).groupBy(_._2).map { case (d, ps) => (k, d) -> ps.size.toLong }
    }
    assert(got === want)
  }

  test("theilSen equals full pairwise-median enumeration on 50 random series") {
    val pts = (1 to 50).map { k =>
      val n = 3 + rng.nextInt(8)
      // distinct times, arbitrary values (negatives included)
      val ts = rng.shuffle((0L to 40L).toVector).take(n)
      k.toString -> ts.map(t => (t, rng.nextInt(41).toLong - 20L))
    }
    val rows = pts.flatMap { case (k, s) => s.map { case (t, x) => (k, t, x) } }
    val got = Stats.theilSen(rows.toDF("key", "t", "x"), "key", "t", "x")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    pts.foreach { case (k, s) =>
      val slopes = for {
        (ta, xa) <- s; (tb, xb) <- s if tb > ta
      } yield {
        val dy = xb - xa; val dt = tb - ta
        if (dy >= 0) dy * 1000000L / dt else -((-dy) * 1000000L / dt)
      }
      val sorted = slopes.sorted
      val want = sorted((sorted.length + 1) / 2 - 1)
      assert(got(k) === (slopes.length.toLong, want), s"key $k")
    }
  }

  test("seasonalProfile equals per-season recomputation on 50 random series") {
    val rows = (1 to 50).flatMap { k =>
      rng.shuffle((0L to 30L).toVector).take(5 + rng.nextInt(20))
        .map(t => (s"k$k", t, rng.nextInt(100).toLong))
    }
    val got = Anomaly.seasonalProfile(rows.toDF("key", "t", "x"), "key", "t", "x", period = 7)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (k, t, x, season, sm, rm) =>
      assert(season === t % 7)
      val peers = rows.filter(r => r._1 == k && r._2 % 7 == season)
      assert(sm === 1000000L * peers.map(_._3).sum / peers.size, s"$k t=$t")
      assert(rm === x * 1000000L - sm)
    }
    assert(got.length === rows.length, "one output row per input point")
  }

  test("keysetPage over random tables equals drop-sort-take for random cursors") {
    val rows = (0 until 200).map(_ => (rng.nextInt(20).toLong, rng.nextInt(1000000).toLong))
      .distinct // unique (a, b) tuples: the documented total-order contract
    val df = rows.toDF("a", "b")
    (0 until 10).foreach { _ =>
      val cur = (rng.nextInt(20).toLong, rng.nextInt(1000000).toLong)
      val got = Paging.keysetPage(df, Seq("a" -> lit(cur._1), "b" -> lit(cur._2)), 17)
        .as[(Long, Long)].collect().toSeq
      val want = rows.sorted.dropWhile(r =>
        Ordering[(Long, Long)].lteq(r, cur)).take(17)
      assert(got === want, s"cursor $cur")
    }
  }

  test("transitionMatrix equals naive per-user pair counting on random event streams") {
    val ev = (0 until 800).map { i =>
      (rng.nextInt(20).toLong, rng.nextInt(50).toLong, i.toLong,
        s"t${rng.nextInt(5)}")
    }
    val got = Funnel.transitionMatrix(ev.toDF("u", "ts", "id", "t"),
        "u", "ts", "id", "t")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val bySrc = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val want = counts.map { case ((s, d), n) =>
      (s, d) -> ((n, n * 1000000L / bySrc(s))) }
    assert(got === want)
  }

  test("skewReport equals naive counting over random skewed keys") {
    val keys = (0 until 600).map(_ =>
      if (rng.nextInt(10) < 4) 7L else rng.nextInt(40).toLong)
    val got = JoinOps.skewReport(keys.toDF("k"), "k", topK = 4)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val counts = keys.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val total = keys.size.toLong
    val mx = counts.values.max
    val factor = mx * 1000000L * counts.size / total
    val want = counts.toSeq.sortBy { case (k, n) => (-n, k) }.take(4)
      .zipWithIndex.map { case ((k, n), i) =>
        (i + 1L, k, n, n * 1000000L / total, factor) }
    assert(got === want)
  }

  test("readabilityStats equals a naive per-doc computation on random word soup") {
    val words = Seq("the", "zzz", "analysis", "a", "grr", "pipeline", "io", "qt")
    val docs = (0L until 60L).map { id =>
      val n = 1 + rng.nextInt(12)
      val ws = Seq.fill(n)(words(rng.nextInt(words.size)))
      val punct = if (rng.nextBoolean()) "." else "!"
      (id, ws.mkString(" ") + punct)
    }
    val got = graft.llm.CorpusStats.readabilityStats(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    docs.foreach { case (id, text) =>
      val t = text.toLowerCase.trim
      val toks = t.split("\\s+").toSeq
      val w = toks.size.toLong
      val sArr = "[.!?]+".r.findAllIn(t).size.toLong
      val s = math.max(1L, sArr)
      val y = "[aeiouy]+".r.findAllIn(t).size.toLong +
        toks.count(x => !x.exists("aeiouy".contains(_)))
      def signDiv(num: Long, den: Long) = if (num < 0) -((-num) / den) else num / den
      val g = signDiv(390000L * w * w + 11800000L * y * s - 15590000L * s * w, s * w)
      val e = signDiv(206835000L * s * w - 1015000L * w * w - 84600000L * y * s, s * w)
      assert(got(id) === ((id, w, s, y, g, e)), s"doc $id '$text'")
    }
  }
}
