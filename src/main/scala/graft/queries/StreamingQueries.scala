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
             |    OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM t)
             |SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
             |CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
             |CAST(count(*) AS BIGINT) AS n_events,
             |CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS value_sum
             |FROM s GROUP BY user_id, sid""".stripMargin))
  )
}
