package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class FunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val steps = Seq("signup", "view", "click", "purchase")

  // (user, ts, id, type) — planted to exercise every semantic edge
  private def fixture = Seq(
    // user 1: view BEFORE signup must not count; click at the SAME ts as
    // the stage-reaching view must not advance (strict >); later click does
    (1L, 5L, 100L, "view"), (1L, 10L, 101L, "signup"),
    (1L, 20L, 102L, "view"), (1L, 20L, 103L, "click"),
    (1L, 30L, 104L, "click"),
    // user 2: no signup — stage 0 despite later-step events
    (2L, 1L, 200L, "view"), (2L, 2L, 201L, "click"),
    // user 3: full clean funnel + a non-step event that must be ignored
    (3L, 1L, 300L, "signup"), (3L, 2L, 301L, "view"),
    (3L, 3L, 302L, "click"), (3L, 4L, 303L, "purchase"),
    // user 4: skips middle steps — purchase without view/click stays stage 1
    (4L, 5L, 400L, "signup"), (4L, 6L, 401L, "purchase")
  ).toDF("user_id", "ts_us", "event_id", "event_type")
    .union(Seq((3L, 2L, 304L, "error"))
      .toDF("user_id", "ts_us", "event_id", "event_type"))

  test("funnelStages: strict ordering, skipped steps, pre-step events") {
    val got = Funnel.funnelStages(fixture, "user_id", "ts_us", "event_id",
        "event_type", steps)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got(1L) === ((3L, Some(30L)))) // same-ts click rejected, later one advances
    assert(got(2L) === ((0L, None)))
    assert(got(3L) === ((4L, Some(4L))))
    assert(got(4L) === ((1L, Some(5L))))
  }

  test("funnelReport: cumulative counts and rates over the planted fixture") {
    val got = Funnel.funnelReport(fixture, "user_id", "ts_us", "event_id",
        "event_type", steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.map(t => (t._1, t._3)).toSeq ===
      Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 1L)))
    assert(got.map(_._4).toSeq === Seq(0.75, 0.5, 0.5, 0.25))
    assert(got.map(_._2).toSeq === steps)
  }

  test("funnelStages on real events matches the chained per-step-min form") {
    val e = graft.queries.Registry.tdEventsUs(spark,
      "/root/testdata/sf0.001")
    val got = Funnel.funnelStages(e, "user_id", "ts_us", "event_id",
        "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local replay: sequential per-step min with strict >
    val rows = e.select("user_id", "ts_us", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .filter(t => steps.contains(t._4))
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      var stage = 0
      var tlast = Long.MinValue
      var advanced = true
      while (advanced && stage < steps.size) {
        val next = evs.filter(t => t._4 == steps(stage) && t._2 > tlast)
        if (next.isEmpty) advanced = false
        else { tlast = next.map(_._2).min; stage += 1 }
      }
      u -> stage.toLong
    }
    assert(got === expected)
  }

  test("transitionMatrix: per-user lead pairs, exact micro-unit row normalization") {
    // user 1: a→b→a→c ; user 2: a→b ; transitions: a→b ×2, b→a, a→c
    val ev = Seq((1L, 10L, 0L, "a"), (1L, 20L, 1L, "b"),
      (1L, 30L, 2L, "a"), (1L, 40L, 3L, "c"),
      (2L, 10L, 4L, "a"), (2L, 20L, 5L, "b")).toDF("u", "ts", "id", "t")
    val out = Funnel.transitionMatrix(ev, "u", "ts", "id", "t")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out === Map(
      ("a", "b") -> ((2L, 666666L)),  // 2 of 3 from 'a'
      ("a", "c") -> ((1L, 333333L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  test("transitionMatrix: same-timestamp ties order by id; single-event users emit nothing") {
    val ev = Seq((1L, 10L, 2L, "x"), (1L, 10L, 1L, "y"), (3L, 5L, 9L, "z"))
      .toDF("u", "ts", "id", "t")
    val out = Funnel.transitionMatrix(ev, "u", "ts", "id", "t")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out === Set(("y", "x", 1L, 1000000L)))
  }
}
