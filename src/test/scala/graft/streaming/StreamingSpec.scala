package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, tSec: Long, user: Long, typ: String = "click", v: Double = 1.0) =
    Event(id, new java.sql.Timestamp(tSec * 1000), user, typ, v)

  test("windowed counts run identically as a stream (watermark) and a batch") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(1, 10, 1), ev(2, 20, 1), ev(3, 70, 2), ev(4, 80, 2, "view"), ev(5, 130, 1))

    // stream
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = Streaming.windowedCounts(mem.toDS(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Update()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("wc")
      .select("window_start", "event_type", "n", "value_sum")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    // batch, same plan
    val batch = Streaming.windowedCounts(events.toDS(), "1 minute", "10 seconds")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    assert(streamed === batch)
    assert(batch.exists { case (_, t, n, _) => t == "click" && n == 2 }) // 0-60s window, user1
  }

  test("stateful sessionization emits on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.sessionize(
        mem.toDS().withWatermark("ts", "0 seconds"), gapMs = 60000)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()

    // session 1: user 1, events at 5s & 35s (NOT t=0 — the initial watermark
    // is epoch 0 and the stateful-op late filter is strict `ts > watermark`);
    // then a 10-minute jump advances the watermark past session_end+gap →
    // timeout fires
    mem.addData(ev(1, 5, 1), ev(2, 35, 1))
    q.processAllAvailable()
    mem.addData(ev(3, 600, 99))
    q.processAllAvailable()
    mem.addData(ev(4, 1800, 99)) // push watermark again so user 99 session 1 can close
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess")
      .select("user_id", "n_events", "value_sum").as[(Long, Long, Double)].collect()
    assert(sessions.contains((1L, 2L, 2.0)), sessions.mkString(","))
    assert(sessions.exists(_._1 == 99L))
  }

  test("streaming dedup within watermark drops repeated keys") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.dedupWithinWatermark(mem.toDS(), Seq("event_id"), "1 minute")
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append()).start()
    mem.addData(ev(1, 5, 1), ev(1, 6, 1), ev(2, 7, 2))  // id 1 duplicated
    q.processAllAvailable()
    mem.addData(ev(1, 8, 1), ev(3, 9, 3))               // id 1 again, still in state
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("batch run of the stateful sessionizer emits trailing open sessions") {
    // single-session user: before the batch-mode flush, the only session was
    // parked in state and silently dropped (no timeout fires after a batch)
    val events = Seq(
      ev(1, 0, 1), ev(2, 30, 1),      // user 1, one open session
      ev(3, 300, 2), ev(4, 500, 2))   // user 2, gap-closed + trailing session
    val out = Streaming.sessionize(events.toDS(), gapMs = 60000)
      .collect().map(s => (s.user_id, s.n_events)).toSeq.sorted
    assert(out === Seq((1L, 2L), (2L, 1L), (2L, 1L)))
    // batch stateful path now agrees with the window-function batch path
    val wf = Streaming.sessionizeBatch(events.toDS(), gapMs = 60000)
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq.sorted
    assert(out === wf)
  }

  test("batch sessionization (window-function path) splits on gaps") {
    val events = Seq(
      ev(1, 0, 1), ev(2, 30, 1),      // session A
      ev(3, 300, 1), ev(4, 310, 1),   // session B (gap 270s > 60s)
      ev(5, 100, 2))                  // session C
    val out = Streaming.sessionizeBatch(events.toDS(), gapMs = 60000)
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 2L), (1L, 2L), (2L, 1L)))
  }
}
