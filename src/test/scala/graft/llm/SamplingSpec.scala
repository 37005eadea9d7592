package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("deterministic: identical keep-set across runs; different seeds differ") {
    val a = Sampling.deterministicSample(events, "event_id", 30).select("event_id")
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(events, "event_id", 30).select("event_id")
      .as[Long].collect().toSet
    assert(a === b)
    val c = Sampling.deterministicSample(events, "event_id", 30, seed = "other")
      .select("event_id").as[Long].collect().toSet
    assert(a !== c)
    // nesting property: the 10% sample is a subset of the 30% sample
    // (same seed — rates only move the threshold)
    val d = Sampling.deterministicSample(events, "event_id", 10).select("event_id")
      .as[Long].collect().toSet
    assert(d.subsetOf(a))
  }

  test("rates land near nominal; absent strata drop entirely") {
    val totals = events.groupBy("event_type").count().as[(String, Long)].collect().toMap
    val out = Sampling.stratifiedSample(events, "event_id", "event_type",
      rates = Map("click" -> 25, "purchase" -> 100))
    val byType = out.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(!byType.contains("view") && !byType.contains("signup") && !byType.contains("error"))
    // rate 100 keeps EVERY row of the stratum — exact, not statistical
    assert(byType("purchase") === totals("purchase"))
    val n = totals("click").toDouble
    assert(math.abs(byType("click") - n * 0.25) <= n * 0.15)
  }

  test("balanceToShares: output weight shares land near targets, binding stratum stays whole") {
    import org.apache.spark.sql.functions._
    // deterministic weights: stratum a 60k, b 30k, c 10k total chars;
    // target 20/40/40 → c binds (10k/0.4=25k cap), a keeps 5k/60k, b 10k/30k
    val rows = (0 until 3000).map { i =>
      val (s, w) = i % 3 match {
        case 0 => ("a", 60L); case 1 => ("b", 30L); case _ => ("c", 10L)
      }
      (i.toLong, s, w)
    }.toDF("id", "stratum", "w")
    val out = Sampling.balanceToShares(rows, "id", "stratum", "w",
      targetPct = Map("a" -> 20, "b" -> 40, "c" -> 40))
    val got = out.groupBy("stratum").agg(sum("w").as("w"))
      .as[(String, Long)].collect().toMap
    val total = got.values.sum.toDouble
    // c binds → kept ~whole; shares within a few points of target (hash
    // sampling is exact-in-expectation, 1000 keys/stratum keeps noise small)
    assert(got("c") >= 9000L, s"binding stratum over-sampled: $got")
    assert(math.abs(got("a") / total - 0.2) < 0.05, s"share a off: $got")
    assert(math.abs(got("b") / total - 0.4) < 0.05, s"share b off: $got")
    assert(math.abs(got("c") / total - 0.4) < 0.05, s"share c off: $got")
    // determinism: same input, same keep-set
    assert(out.select("id").as[Long].collect().toSet ===
      Sampling.balanceToShares(rows, "id", "stratum", "w",
        targetPct = Map("a" -> 20, "b" -> 40, "c" -> 40))
        .select("id").as[Long].collect().toSet)
  }

  test("balanceToShares rejects unknown strata and bad shares") {
    val rows = Seq((1L, "a", 10L)).toDF("id", "stratum", "w")
    intercept[IllegalArgumentException] {
      Sampling.balanceToShares(rows, "id", "stratum", "w", Map("zz" -> 50))
    }
    intercept[IllegalArgumentException] {
      Sampling.balanceToShares(rows, "id", "stratum", "w", Map("a" -> 60, "b" -> 60))
    }
  }

  test("the sample filter reaches the scan stage (no shuffle, no RNG node)") {
    val plan = Sampling.deterministicSample(events, "event_id", 30)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    assert(!plan.contains("Sample"), plan.take(500)) // not RNG-based df.sample
  }

  test("epochShuffle: exact partition into shards, dense 1-based positions, seeded determinism") {
    import spark.implicits._
    val rows = (0L until 200L).toDF("id")
    val out = Sampling.epochShuffle(rows, "id", nShards = 4, seed = "e1")
      .as[(Long, Long, Long)].collect()
    // every input row appears exactly once
    assert(out.map(_._1).sorted.toSeq === (0L until 200L).toSeq)
    // positions are dense 1..count within each shard
    out.groupBy(_._2).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 4)
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq, s"shard $shard")
    }
    // identical rerun, different seed → different permutation
    val again = Sampling.epochShuffle(rows, "id", nShards = 4, seed = "e1")
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    val other = Sampling.epochShuffle(rows, "id", nShards = 4, seed = "e2")
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq !== other.sortBy(_._1).toSeq)
    // unstable key types are rejected (cross-engine rendering contract)
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(rows.selectExpr("CAST(id AS DOUBLE) AS id"), "id", 4)
    }
  }

  test("capPerGroup: hard ceiling, pass-through under cap, stable survivor set") {
    import spark.implicits._
    // 3 groups: 40, 10, and 3 rows — cap at 10
    val rows = ((0L until 40L).map(i => (i, "big")) ++
      (100L until 110L).map(i => (i, "mid")) ++
      (200L until 203L).map(i => (i, "tiny"))).toDF("id", "grp")
    val out = Sampling.capPerGroup(rows, "id", "grp", maxPerGroup = 10)
      .as[(Long, String, Long)].collect()
    val byGrp = out.groupBy(_._2)
    assert(byGrp("big").length === 10)
    assert(byGrp("mid").map(_._1).sorted.toSeq === (100L until 110L).toSeq)
    assert(byGrp("tiny").map(_._1).sorted.toSeq === (200L until 203L).toSeq)
    // dense 1-based positions inside every group
    byGrp.foreach { case (g, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq, s"group $g")
    }
    // deterministic rerun; raising the cap only ADDS survivors (hash order
    // is a fixed total order per group, so prefixes nest)
    val again = Sampling.capPerGroup(rows, "id", "grp", maxPerGroup = 10)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    val wider = Sampling.capPerGroup(rows, "id", "grp", maxPerGroup = 20)
      .as[(Long, String, Long)].collect()
    assert(out.map(_._1).toSet.subsetOf(wider.map(_._1).toSet))
  }

  test("isqrt: exact floor(sqrt) across boundaries and large values") {
    def ref(w: Long): Long = {
      var r = BigInt(0); var hi = BigInt(w)
      while (r < hi) { val m = (r + hi + 1) / 2; if (m * m <= w) r = m else hi = m - 1 }
      r.toLong
    }
    val probes = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L,
      999999L, 1000000L, 1000001L,
      (1L << 31) - 1, 1L << 31, (1L << 40) + 12345L,
      4000000000000000L, 3999999999999999L) ++
      (0 until 200).map(i => i.toLong * i * i + i)
    probes.foreach { w =>
      assert(Sampling.isqrt(w) === ref(w), s"isqrt($w)")
      val r = Sampling.isqrt(w)
      assert(r * r <= w && (r + 1) * (r + 1) > w, s"floor property at $w")
    }
  }

  test("temperedMixture: shares flatten toward sqrt-proportional, binding stratum whole") {
    // heavy:light = 90:1 by weight → tempered target ratio √9000·k : √100·k ≈ 9.5:1
    val rows = ((0L until 900L).map(i => (i, "heavy", 10L)) ++
      (10000L until 10010L).map(i => (i, "light", 10L))).toDF("id", "src", "w")
    val out = Sampling.temperedMixture(rows, "id", "src", "w", seed = "tx")
      .as[(Long, String, Long)].collect()
    val byStr = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // binding stratum (smallest w/isqrt(w)) is light → kept whole
    assert(byStr("light") === 100L)
    // heavy down-sampled to ≈ w_l·r_h/r_l = 100·94/10 = 940 chars (±
    // hash-sampling noise at rate 1044bp over 900 rows)
    val expectHeavy = 100.0 * Sampling.isqrt(9000L) / Sampling.isqrt(100L)
    assert(math.abs(byStr("heavy") - expectHeavy) / expectHeavy < 0.35,
      s"heavy=${byStr("heavy")} expected≈$expectHeavy")
    // deterministic
    val again = Sampling.temperedMixture(rows, "id", "src", "w", seed = "tx")
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // equal strata: both kept whole (rates all 10000)
    val eq = ((0L until 50L).map(i => (i, "a", 7L)) ++
      (100L until 150L).map(i => (i, "b", 7L))).toDF("id", "src", "w")
    assert(Sampling.temperedMixture(eq, "id", "src", "w").count() === 100L)
  }

  test("tokenBudgetPlan: sqrt shares, exact floored allocation, repeat factors") {
    // strata token totals 4 / 9 / 1 -> r = 2 / 3 / 1, rsum = 6
    val df = Seq(
      (1L, "a", 4L), (2L, "b", 9L), (3L, "c", 1L)
    ).toDF("id", "src", "w")
    val got = Sampling.tokenBudgetPlan(df, "src", "w", budget = 600L)
      .select("stratum", "tokens_available", "r", "allocated_tokens", "repeat_factor")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "a" -> ((4L, 2L, 200L, 50.0)),
      "b" -> ((9L, 3L, 300L, 33.333333)),
      "c" -> ((1L, 1L, 100L, 100.0))))
  }

  test("tokenBudgetPlan: isqrt fix-up at non-square totals, floor division") {
    // w = 15 -> r = 3 (16 > 15); w = 16 -> r = 4; rsum = 7, budget 100
    val df = Seq((1L, "x", 15L), (2L, "y", 16L)).toDF("id", "src", "w")
    val got = Sampling.tokenBudgetPlan(df, "src", "w", budget = 100L)
      .select("stratum", "r", "allocated_tokens")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("x" -> ((3L, 42L)), "y" -> ((4L, 57L))))
  }

  // --- curriculumSchedule ---

  test("curriculumSchedule: thresholds partition phases; positions dense per (phase, shard)") {
    val df = Seq(
      (1L, 0.9), (2L, 0.8), (3L, 0.5),  // phase 1 (>= 0.5, boundary in)
      (4L, 0.4), (5L, 0.25),            // phase 2 (>= 0.25)
      (6L, 0.1), (7L, 0.0)              // phase 3
    ).toDF("id", "score")
    val got = Sampling.curriculumSchedule(df, "id", "score",
        thresholds = Seq(0.5, 0.25), nShards = 2, seed = "cu1")
      .as[(Long, Long, Long, Long)].collect()
    val phaseOf = got.map(r => r._1 -> r._2).toMap
    assert(phaseOf === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 3L, 7L -> 3L))
    // dense 1-based positions within each (phase, shard)
    got.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).map(_.toLong))
    }
    assert(got.forall(r => r._3 >= 0 && r._3 < 2))
    // deterministic
    val again = Sampling.curriculumSchedule(df, "id", "score",
      Seq(0.5, 0.25), 2, "cu1").as[(Long, Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("curriculumSchedule: rejects non-descending thresholds and bad shard counts") {
    val df = Seq((1L, 0.5)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      Sampling.curriculumSchedule(df, "id", "score", Seq(0.25, 0.5), 2)
    }
    intercept[IllegalArgumentException] {
      Sampling.curriculumSchedule(df, "id", "score", Seq(0.5), 0)
    }
  }

  /** JVM replay of the A-ES score: md5-hash60("<seed>\u001f<key>"), +1,
    * /2^60, ln, /w, 6-dp HALF_UP. */
  private def jvmScore(seed: String, key: Long, w: Long): BigDecimal = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed\u001f$key".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 1152921504606846976.0
    BigDecimal(math.log(u) / w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  test("weightedSample matches the exact A-ES replay (scores, order, cut)") {
    val rows = (1L to 200L).map(k => (k, 1L + k % 17))
    val got = Sampling.weightedSample(rows.toDF("k", "w"), "k", "w", k = 25, seed = "t1")
      .as[(Long, Long, Double)].collect().toSeq
    val expect = rows.map { case (k, w) => (k, w, jvmScore("t1", k, w)) }
      .sortBy { case (k, _, sc) => (-sc, k) }.take(25)
      .map { case (k, w, sc) => (k, w, sc.toDouble) }
    assert(got === expect)
  }

  test("weightedSample: inclusion follows weight; zero weights excluded; seeds independent") {
    // 10 heavy keys (w=1e9) vs 200 light (w=1): ln(u)/1e9 is within a
    // hair of 0 for ANY u, so every heavy key outranks every light key
    // unless a light key draws u astronomically close to 1
    val rows = (1L to 10L).map(k => (k, 1000000000L)) ++
      (100L to 299L).map(k => (k, 1L)) ++ Seq((999L, 0L))
    val top = Sampling.weightedSample(rows.toDF("k", "w"), "k", "w", k = 10, seed = "t2")
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    assert(top === (1L to 10L).toSet)
    val other = Sampling.weightedSample(rows.toDF("k", "w"), "k", "w", k = 50, seed = "t3")
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    assert(!other.contains(999L), "zero-weight key must never be sampled")
    val same = Sampling.weightedSample(rows.toDF("k", "w"), "k", "w", k = 50, seed = "t2")
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    assert(other != same, "different seeds must pick different light-key tails")
  }

  private def jvmPriority(seed: String, key: Long, w: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed\u001f$key".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) + 1) / w
  }

  test("weightedSamplePriority matches the exact integer replay (priorities, order, cut)") {
    val rows = (1L to 200L).map(k => (k, 1L + k % 17))
    val got = Sampling.weightedSamplePriority(rows.toDF("k", "w"), "k", "w", k = 25, seed = "t1")
      .as[(Long, Long, Long)].collect().toSeq
    val expect = rows.map { case (k, w) => (k, w, jvmPriority("t1", k, w)) }
      .sortBy { case (k, _, p) => (p, k) }.take(25)
    assert(got === expect)
  }

  test("weightedSamplePriority: inclusion follows weight; zero weights excluded; seeded") {
    // priority = u_int div w: a 10¹²-weight key lands in [0, ~1.15·10⁶]
    // while a unit-weight key needs u_int below that — odds ~10⁻¹²
    val rows = (1L to 10L).map(k => (k, 1000000000000L)) ++
      (100L to 299L).map(k => (k, 1L)) ++ Seq((999L, 0L))
    val top = Sampling.weightedSamplePriority(rows.toDF("k", "w"), "k", "w", k = 10, seed = "t2")
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(top === (1L to 10L).toSet)
    val other = Sampling.weightedSamplePriority(rows.toDF("k", "w"), "k", "w", k = 50, seed = "t3")
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(!other.contains(999L), "zero-weight key must never be sampled")
    val same = Sampling.weightedSamplePriority(rows.toDF("k", "w"), "k", "w", k = 50, seed = "t3")
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(other === same, "same seed must replay the same sample")
  }

  test("weightedSamplePriority: fractional weights in (0,1) floor to 0 and are excluded, never dominate") {
    // pre-fix, 0.5 passed the raw `> 0` filter, cast to BIGINT 0, and the
    // div-by-0 either threw under ANSI or produced NULL priorities that
    // sort FIRST — sub-1-weight rows silently filling every sample slot
    val rows = (1L to 20L).map(k => (k, 10.0)) ++ (100L to 119L).map(k => (k, 0.5))
    val got = Sampling.weightedSamplePriority(
        rows.toDF("k", "w"), "k", "w", k = 15, seed = "t4")
      .as[(Long, Double, Long)].collect().map(_._1).toSet
    assert(got.forall(_ <= 20L), s"fractional-weight keys must be excluded: $got")
    assert(got.size === 15)
  }

  test("leakageSafeSplit: exact dups share a split; ratios and determinism hold") {
    val distinct = (1L to 300L).map(i => (i, s"unique document number $i with words"))
    // ids 1001/1002/1003 are byte-identical copies of doc 7's text
    val dups = Seq(1001L, 1002L, 1003L).map(id => (id, distinct(6)._2))
    val df = (distinct ++ dups).toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(df, "doc_id", "text",
      trainPct = 90, valPct = 5)
    val rows = out.as[(Long, Long, String)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    // all copies carry doc 7's fingerprint AND its split
    val (fp7, sp7) = (byId(7L)._2, byId(7L)._3)
    Seq(1001L, 1002L, 1003L).foreach { id =>
      assert(byId(id)._2 === fp7 && byId(id)._3 === sp7, s"dup $id leaked")
    }
    // rough ratios over the 300 distinct docs (hash-uniform, wide bounds)
    val splits = distinct.map(d => byId(d._1)._3)
    val train = splits.count(_ == "train")
    assert(train > 240 && train < 295, s"train=$train of 300")
    assert(splits.toSet === Set("train", "val", "test"))
    // deterministic per seed; a different seed moves some docs
    val again = Sampling.leakageSafeSplit(df, "doc_id", "text", 90, 5)
      .as[(Long, Long, String)].collect().toSet
    assert(again === rows.toSet)
    val reseeded = Sampling.leakageSafeSplit(df, "doc_id", "text", 90, 5,
      seed = "sp2").as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(distinct.exists(d => reseeded(d._1) != byId(d._1)._3))
  }

  test("bottomKSample: MERGE LAW — bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))") {
    val a = (0L until 500L).map(i => (i, s"t${i % 3}"))
    val b = (400L until 1000L).map(i => (i, s"t${i % 3}")) // overlapping shards
    def bk(rows: Seq[(Long, String)]) = Sampling.bottomKSample(
        rows.toDF("event_id", "event_type"), "event_id", "event_type", k = 10)
      .select("stratum", "key", "rk").as[(String, Long, Long)].collect().toSet
    val whole = bk(a ++ b)
    val shardA = bk(a).map { case (st, k, _) => (k, st) }
    val shardB = bk(b).map { case (st, k, _) => (k, st) }
    val remerged = bk((shardA ++ shardB).toSeq.map { case (k, st) => (k, st) })
    assert(whole === remerged)
  }

  test("bottomKSample: fixed panel size, duplicate-row insensitive, deterministic") {
    val rows = (0L until 300L).map(i => (i, "t"))
    val once = Sampling.bottomKSample(rows.toDF("event_id", "event_type"),
      "event_id", "event_type", k = 25).select("key").as[Long].collect().toSet
    assert(once.size === 25)
    val dup = Sampling.bottomKSample((rows ++ rows).toDF("event_id", "event_type"),
      "event_id", "event_type", k = 25).select("key").as[Long].collect().toSet
    assert(once === dup)
    // a different seed draws a different panel
    val other = Sampling.bottomKSample(rows.toDF("event_id", "event_type"),
      "event_id", "event_type", k = 25, seed = "other")
      .select("key").as[Long].collect().toSet
    assert(once !== other)
  }

  test("bottomKSample: ranks are 1..min(k, stratum size), smallest hash first") {
    val rows = (0L until 5L).map(i => (i, "t"))
    val out = Sampling.bottomKSample(rows.toDF("event_id", "event_type"),
      "event_id", "event_type", k = 10)
      .orderBy("rk").select("key", "rk").as[(Long, Long)].collect()
    assert(out.map(_._2).toSeq === (1L to 5L))
    // rank order must equal the portable-hash order recomputed independently
    val byHash = rows.map(_._1).sortBy(id =>
      spark.range(1).select(graft.llm.TextOps.portableHash60(
        lit("s1" + Sampling.SeedSep + id.toString))).as[Long].collect().head)
    assert(out.map(_._1).toSeq === byHash)
  }

  test("kmvDistinctEstimate: under-k strata are exact; at-k strata estimate within 3 rsd") {
    val rows = (0L until 5000L).map(i => (i, "big")) ++ (0L until 10L).map(i => (i, "small"))
    val m = Sampling.kmvDistinctEstimate(
        rows.toDF("event_id", "event_type"), "event_id", "event_type", k = 256)
      .select("stratum", "n_panel", "est_distinct")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(m("small") === (("small", 10L, 10L))) // saw everything → exact
    assert(m("big")._2 === 256L)
    // rsd ≈ 1/sqrt(k-2) ≈ 6.3%; assert within 3 rsd of 5000
    val err = math.abs(m("big")._3 - 5000L) / 5000.0
    assert(err < 0.19, s"KMV estimate ${m("big")._3} off by ${err * 100}%%")
  }

  test("kmvDistinctEstimate is a pure function of the bottom-k panel (duplicate-insensitive)") {
    val rows = (0L until 2000L).map(i => (i, "t"))
    def est(data: Seq[(Long, String)]) = Sampling.kmvDistinctEstimate(
        data.toDF("event_id", "event_type"), "event_id", "event_type", k = 64)
      .select("est_distinct").as[Long].collect().head
    assert(est(rows) === est(rows ++ rows ++ rows))
  }
}
