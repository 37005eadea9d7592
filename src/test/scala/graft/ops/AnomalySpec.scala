package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Rolling integer-arithmetic anomaly monitor (ops/Anomaly.scala). */
class AnomalySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val HourUs = 3600000000L

  /** one event row per unit of `cnt`, in hour `h` for key `k`. */
  private def series(k: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)((k, h * HourUs + 1L))
    }

  private def run(rows: Seq[(String, Long)], w: Int = 24, z: Int = 3) =
    Anomaly.rollingCountAnomaly(
        rows.toDF("event_type", "ts_us"), "event_type", "ts_us", w, z)
      .select("key", "hour_idx", "cnt", "baseline_n", "is_anomaly")
      .as[(String, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("flat baseline then a spike: spike flagged, steady hours not") {
    // 10,10,10,10,10,11 — baseline var>0 needs a wobble: use 10,12 mix
    val m = run(series("a", Seq(10, 12, 10, 12, 10, 40)))
    assert(m(("a", 5L)) === ((40L, 5L, 1L)))   // 40 vs mean 10.8, sd ~1.1
    assert(m(("a", 4L))._3 === 0L)             // 10 within baseline
  }

  test("first two hours have short baselines and are never flagged") {
    val m = run(series("a", Seq(100, 1, 1)))
    assert(m(("a", 0L)) === ((100L, 0L, 0L)))  // no baseline
    assert(m(("a", 1L)) === ((1L, 1L, 0L)))    // n=1 < 2
  }

  test("zero-variance baseline: any deviation flags, exact repeat does not") {
    val m = run(series("a", Seq(5, 5, 5, 5, 6)) ++ series("b", Seq(5, 5, 5, 5, 5)))
    assert(m(("a", 4L))._3 === 1L) // sd=0, dev≠0 → infinite z
    assert(m(("b", 4L))._3 === 0L) // sd=0, dev=0
  }

  test("baseline window slides: only trailing W hours count") {
    // w=2: hour 3's baseline is hours 1-2 (100s), so 100 is normal there
    val m = run(series("a", Seq(1, 100, 100, 100)), w = 2)
    assert(m(("a", 1L))._3 === 0L) // n=1, unflagged by guard
    assert(m(("a", 3L))._3 === 0L) // baseline {100,100}, dev=0
  }

  test("keys are independent series") {
    val m = run(series("a", Seq(10, 12, 10, 12, 40)) ++ series("b", Seq(40, 40, 40, 40, 40)))
    assert(m(("a", 4L))._3 === 1L)
    assert(m(("b", 4L))._3 === 0L)
  }

  test("chiSquareDrift: exact floor micro-units match a BigInt replay; independence -> 0") {
    import spark.implicits._
    // dependent table: row r1 concentrates in col c1
    val rows = Seq.fill(30)(("r1", "c1")) ++ Seq.fill(5)(("r1", "c2")) ++
      Seq.fill(5)(("r2", "c1")) ++ Seq.fill(30)(("r2", "c2"))
    val got = Anomaly.chiSquareDrift(rows.toDF("rk", "ck"), "rk", "ck")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val counts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = BigInt(rows.size)
    def rt(r: String) = BigInt(rows.count(_._1 == r))
    def ct(c: String) = BigInt(rows.count(_._2 == c))
    for (((r, c), (o, eMicro, contribMicro)) <- got) {
      assert(o === counts((r, c)))
      assert(BigInt(eMicro) === rt(r) * ct(c) * 1000000 / n)
      val num = n * o - rt(r) * ct(c)
      assert(BigInt(contribMicro) === num * num * 1000000 / (n * rt(r) * ct(c)),
        s"cell ($r,$c)")
    }
    // the dependent fixture's statistic is large (exact: chi2 ~ 25.7)
    assert(got.values.map(_._3).sum > 20L * 1000000L)
    // an exactly-independent table scores 0 in every cell
    val indep = (for (r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 10)
      yield (r, c)).toDF("rk", "ck")
    val z = Anomaly.chiSquareDrift(indep, "rk", "ck")
      .as[(String, String, Long, Long, Long)].collect()
    assert(z.forall(_._5 === 0L))
  }

  test("BenfordMicro partitions one million exactly (the log telescope)") {
    assert(Anomaly.BenfordMicro.sum === 1000000L)
    assert(Anomaly.BenfordMicro.size === 9)
  }

  test("benfordAudit matches a BigInt replay; absent digits emit o=0; non-positives drop") {
    // digits present: 1 (×5: 1,10,12,150,19), 2 (×2: 2, 25), 7 (×1: 700);
    // no 3,4,5,6,8,9; zero and negative values must be ignored
    val vals = Seq(1L, 10L, 12L, 150L, 19L, 2L, 25L, 700L, 0L, -5L)
    val got = Anomaly.benfordAudit(vals.toDF("v"), "v")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val counts = Map(1L -> 5L, 2L -> 2L, 7L -> 1L)
    val n = BigInt(8)
    assert(got.map(_._1) === (1L to 9L))
    got.foreach { case (d, o, eMicro, contrib) =>
      val p = BigInt(Anomaly.BenfordMicro(d.toInt - 1))
      assert(o === counts.getOrElse(d, 0L), s"digit $d count")
      assert(BigInt(eMicro) === n * p, s"digit $d e_micro")
      val diff = BigInt(1000000) * o - n * p
      // micro-unit contribution: diff = 10⁶·(o−e), so (o−e)²/e in micro
      // units divides by n·p_micro only (not 10⁶·n·p_micro)
      assert(BigInt(contrib) === diff * diff / (n * p), s"digit $d chi2")
    }
    // the whole-unit chi² recovered from the micro contributions is
    // non-trivial for this drifted fixture (the round-9 bug floored it to 0)
    val chi2Whole = got.map(_._4).sum / 1000000.0
    assert(chi2Whole > 1.0, s"chi2 $chi2Whole should register drift")
  }

  test("ewmaTrend: hand recursion at alpha=0.5, seed row, drop-to-zero") {
    val df = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 3L, 20L), ("A", 4L, 0L))
      .toDF("k", "t", "x")
    val got = Anomaly.ewmaTrend(df, "k", "t", "x", alphaBp = 5000L)
      .orderBy("t").as[(String, Long, Long, Long, Long)].collect().toSeq
    // s1=10e6 dev 0; s2=(.5·20e6+.5·10e6)=15e6 dev +10e6;
    // s3=17.5e6 dev +5e6; s4=8.75e6 dev −17.5e6
    assert(got === Seq(
      ("A", 1L, 10L, 10000000L, 0L),
      ("A", 2L, 20L, 15000000L, 10000000L),
      ("A", 3L, 20L, 17500000L, 5000000L),
      ("A", 4L, 0L, 8750000L, -17500000L)))
  }

  test("ewmaTrend: per-step floor matches the integer recursion exactly") {
    val df = Seq(("B", 1L, 10L), ("B", 2L, 20L)).toDF("k", "t", "x")
    val got = Anomaly.ewmaTrend(df, "k", "t", "x", alphaBp = 3333L)
      .orderBy("t").as[(String, Long, Long, Long, Long)].collect()
    // (3333·20e6 + 6667·10e6) div 10⁴ = 13333000
    assert(got(1)._4 === 13333000L)
    // keys are independent series; pre-aggregation sums same-t values
    val multi = df.unionByName(Seq(("C", 1L, 3L), ("C", 1L, 4L)).toDF("k", "t", "x"))
    val c = Anomaly.ewmaTrend(multi, "k", "t", "x", alphaBp = 3333L)
      .filter($"key" === "C").as[(String, Long, Long, Long, Long)].collect()
    assert(c.toSeq === Seq(("C", 1L, 7L, 7000000L, 0L)))
  }

  test("cusum: accumulates only sustained exceedance, floors at zero, alarms past h") {
    // x = 10,10,10,20,20 → ref = 14e6; slack 10% = 1.4e6
    val df = Seq(("A", 1L, 10L), ("A", 2L, 10L), ("A", 3L, 10L),
      ("A", 4L, 20L), ("A", 5L, 20L)).toDF("k", "t", "x")
    val got = Anomaly.cusum(df, "k", "t", "x", slackBp = 1000L,
        thresholdBp = 5000L)
      .orderBy("t").as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // c: 0,0,0, max(0, 20e6−14e6−1.4e6)=4.6e6, 9.2e6; h = 7e6 → alarm last
    assert(got === Seq(
      ("A", 1L, 10L, 14000000L, 0L, 0L),
      ("A", 2L, 10L, 14000000L, 0L, 0L),
      ("A", 3L, 10L, 14000000L, 0L, 0L),
      ("A", 4L, 20L, 14000000L, 4600000L, 0L),
      ("A", 5L, 20L, 14000000L, 9200000L, 1L)))
  }

  test("cusum: a single spike decays back to zero instead of alarming") {
    // x = 10,25,10,10 → ref = 13.75e6, slack 0
    val df = Seq(("B", 1L, 10L), ("B", 2L, 25L), ("B", 3L, 10L), ("B", 4L, 10L))
      .toDF("k", "t", "x")
    val got = Anomaly.cusum(df, "k", "t", "x", slackBp = 0L, thresholdBp = 10000L)
      .orderBy("t").as[(String, Long, Long, Long, Long, Long)].collect()
    // c2 = 25e6−13.75e6 = 11.25e6 (no alarm at h=13.75e6); c3 = max(0,
    // 11.25e6 + 10e6 − 13.75e6) = 7.5e6; c4 = 3.75e6 — decays, never alarms
    assert(got.map(_._5).toSeq === Seq(0L, 11250000L, 7500000L, 3750000L))
    assert(got.forall(_._6 === 0L))
  }

  test("seasonalProfile: per-season exact micro means, residuals, period wrap") {
    import spark.implicits._
    // period 3: t=0,3 share season 0 (x 10, 16 → mean 13); t=1,4 season 1
    // (x 7, 8 → floor-mean 7.5 → 7500000); t=2 season 2 alone
    val pts = Seq(("k", 0L, 10L), ("k", 1L, 7L), ("k", 2L, 99L),
      ("k", 3L, 16L), ("k", 4L, 8L)).toDF("key", "t", "x")
    val out = Anomaly.seasonalProfile(pts, "key", "t", "x", period = 3)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(out(0L) === (("k", 0L, 10L, 0L, 13000000L, -3000000L)))
    assert(out(3L) === (("k", 3L, 16L, 0L, 13000000L, 3000000L)))
    assert(out(1L) === (("k", 1L, 7L, 1L, 7500000L, -500000L)))
    assert(out(4L) === (("k", 4L, 8L, 1L, 7500000L, 500000L)))
    assert(out(2L) === (("k", 2L, 99L, 2L, 99000000L, 0L)))
  }

  test("ohlcBars: open/close by (time, id), duplicate-timestamp ties deterministic, one agg") {
    import spark.implicits._
    val df = Seq(
      // key a, bucket 0 (t in [0, 10)): open at t=1 id=2 (5.0), close at
      // t=9 (1.0); high 9.0 low 1.0. The two t=1 rows tie: smaller id wins open
      ("a", 1L, 2L, 5.0), ("a", 1L, 3L, 7.0), ("a", 4L, 1L, 9.0), ("a", 9L, 5L, 1.0),
      // key a, bucket 1: singleton
      ("a", 12L, 6L, 4.0),
      // key b, bucket 0: close tie at t=5 → larger id wins close
      ("b", 5L, 10L, 2.0), ("b", 5L, 11L, 8.0))
      .toDF("k", "t", "id", "v")
    val out = Anomaly.ohlcBars(df, "k", "t", "id", "v", bucketSize = 10L)
    val rows = out.as[(String, Long, Double, Double, Double, Double, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(rows(("a", 0L)) === (("a", 0L, 5.0, 9.0, 1.0, 1.0, 4L, 22.0)))
    assert(rows(("a", 1L)) === (("a", 1L, 4.0, 4.0, 4.0, 4.0, 1L, 4.0)))
    assert(rows(("b", 0L)) === (("b", 0L, 2.0, 8.0, 2.0, 8.0, 2L, 10.0)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "bars must not plan a window sort")
  }
}
