package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.Streaming
import Registry.td

/**
 * Streaming-surface queries in their batch shape (the identical plans run
 * under readStream — see graft.streaming.StreamingSpec for the stream-mode
 * proofs with MemoryStream + watermarks).
 */
object StreamingQueries {

  val all: Seq[(String, Q)] = Seq(

    // gap-based sessionization (window-function batch path; the stateful
    // flatMapGroupsWithState twin is exercised in StreamingSpec)
    "w3_sessionize_batch" -> Q(
      (s, dir) => {
        val events = Streaming.asEvents(td(s, dir, "events"))
        Streaming.sessionizeBatch(events, gapMs = 30 * 60 * 1000)
          .select(col("user_id"),
            unix_micros(col("session_start")).as("start_us"),
            unix_micros(col("session_end")).as("end_us"),
            col("n_events").cast("long").as("n_events"),
            col("value_sum"))
      },
      Some("""WITH t AS (SELECT user_id, ts, value,
             |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events),
             |s AS (SELECT user_id, ts, value,
             |  SUM(CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
             |      THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY ts
             |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM t)
             |SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
             |CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
             |CAST(count(*) AS BIGINT) AS n_events,
             |CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS value_sum
             |FROM s GROUP BY user_id, sid""".stripMargin)),

    // w16 — NATIVE session_window (Spark's built-in session operator,
    // the engine-level twin of the hand-rolled w3 sessionization; in
    // streaming it runs on merging session state with watermark
    // eviction). Boundary semantics measured and spec'd (StreamingSpec):
    // TOUCHING windows merge — an event EXACTLY gap after the previous
    // stays in the session, same islands boundary as w3 (> for a new
    // session) — and end = last event + gap (w3 reports the last event)
    "w16_native_session_window" -> Q(
      (s, dir) => {
        val events = Streaming.asEvents(td(s, dir, "events")).toDF()
        events
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).cast("long").as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("start_us"),
            unix_micros(col("session_window.end")).as("end_us"),
            col("n_events"))
      },
      Some("""WITH t AS (SELECT user_id, ts,
             |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events),
             |s AS (SELECT user_id, ts,
             |  SUM(CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
             |      THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY ts
             |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM t)
             |SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
             |CAST(max(epoch_us(ts)) + 1800000000 AS BIGINT) AS end_us,
             |CAST(count(*) AS BIGINT) AS n_events
             |FROM s GROUP BY user_id, sid""".stripMargin)),

    // w12 — stream-static dimension enrichment (events × customer
    // segment dim, LEFT join, dim BROADCAST so the stream side never
    // shuffles): only custkey < 100 enters the dim, so users 100+ land
    // in the null quarantine lane the left join keeps visible. Batch
    // twin of the StreamingSpec stream-equivalence proof; rolled up per
    // segment lane with exact integer cents
    "w12_stream_static_enrich" -> Q(
      (s, dir) => {
        val events = Streaming.asEvents(td(s, dir, "events"))
        val dim = td(s, dir, "customer").filter(col("c_custkey") < 100)
          .select(col("c_custkey").cast("long").as("user_key"),
            col("c_mktsegment").as("segment"))
        Streaming.enrichWithDim(events, dim, "user_key", Seq("segment"))
          .groupBy(coalesce(col("segment"), lit("UNMATCHED")).as("segment"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            countDistinct(col("user_id")).cast("long").as("n_users"),
            sum(round(col("value") * 100).cast("long")).cast("long").as("value_cents"))
      },
      Some("""WITH d AS (SELECT c_custkey AS user_key, c_mktsegment AS segment
             |  FROM customer WHERE c_custkey < 100),
             |j AS (SELECT COALESCE(d.segment, 'UNMATCHED') AS segment,
             |    e.user_id, CAST(round(e.value*100) AS BIGINT) AS cents
             |  FROM events e LEFT JOIN d ON e.user_id = d.user_key)
             |SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  CAST(sum(cents) AS BIGINT) AS value_cents
             |FROM j GROUP BY 1""".stripMargin))
  )
}
