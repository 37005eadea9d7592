package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event in the stream (mirrors the testdata `events` table, with the
  * ns-long `ts` already converted to a timestamp). */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** One closed user session produced by [[Streaming.sessionize]]. */
final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                             session_end: java.sql.Timestamp, n_events: Long,
                             value_sum: Double)

private final case class SessionBuf(start: Long, end: Long, n: Long, sum: Double)

/** One document flowing through the streaming near-dup detector. */
final case class StreamDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** One finalized hourly bucket flowing into [[Streaming.anomalyStream]]
  * (the shape [[Streaming.windowedCounts]] emits, hour-bucketed). */
final case class HourlyCount(key: String, hour_idx: Long, cnt: Long)

/** Verdict for one hourly bucket against its trailing baseline. */
final case class AnomalyVerdict(key: String, hour_idx: Long, cnt: Long,
                                baseline_n: Long, is_anomaly: Long)

/** A near-dup verdict: `doc_id` shares an LSH bucket with the earlier
  * keeper `dup_of` (whose event time is `dup_of_ts`). One event per
  * matching bucket — aggregate min by (dup_of_ts, dup_of) per doc for a
  * single verdict that matches the batch twin's earliest-keeper
  * attribution. */
final case class NearDupEvent(doc_id: Long, ts: java.sql.Timestamp,
                              dup_of: Long, dup_of_ts: java.sql.Timestamp)

/**
 * Structured Streaming surface (engine extension; the reference is batch-only
 * per SURVEY §1.1, so this extends the engine to the streaming shapes a
 * training-data pipeline needs). Every transform below is
 * batch/stream-agnostic: the same plan runs under `spark.read` and
 * `spark.readStream`.
 *
 * Scale: windowed aggregation is an incremental stateful hash-agg keyed on
 * (window, event_type); the watermark bounds state. Sessionization keeps one
 * small state object per active user and emits on gap timeout.
 */
object Streaming {

  /** Convert the testdata events frame to typed events, accepting `ts` as
    * either a ns-precision LONG (timestamp[ns] parquet under nanosAsLong)
    * or a timestamp column (timestamp[us] parquet). */
  def asEvents(raw: DataFrame): Dataset[Event] = {
    import raw.sparkSession.implicits._
    // `div` (integral): ns epochs overflow double's exact-integer range, so
    // `/ 1000` + cast would be off by ±1 µs.
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.select(col("event_id"), tsCol.as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }

  /**
   * Event-time tumbling-window counts with a watermark: late events beyond
   * `watermarkDelay` are dropped from state. Works identically on a batch
   * frame (watermark is a no-op there).
   */
  def windowedCounts(events: Dataset[Event], windowLength: String,
                     watermarkDelay: String): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / lit(100.0)).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  /**
   * Stream-STREAM interval join: pair each click with every view
   * impression by the same user inside the attribution window
   * `(click.ts − windowMs, click.ts]` — the ad-tech/funnel primitive
   * Structured Streaming runs with BOTH sides unbounded. The equi key
   * (user) drives the shuffle; the time-range predicate plus the two
   * watermarks bound each side's join state, so it runs indefinitely:
   * a view older than `click watermark − windowMs` can never match a
   * future click and is evicted. Last-touch selection stays downstream
   * (batch w11 does max-by; a streaming consumer picks per click id) —
   * inner pair emission is what append mode supports without dropping
   * late re-pairings.
   *
   * Batch/stream-agnostic like every transform here: the same plan runs
   * under `spark.read`, where the watermarks are no-ops (the w11 batch
   * twin is this join + last-touch, DuckDB-oracled).
   */
  def attributionPairs(views: Dataset[Event], clicks: Dataset[Event],
                       windowMs: Long, watermarkDelay: String): DataFrame = {
    val v = views.toDF()
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    val c = clicks.toDF()
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    c.join(v, expr(
        s"""v_user = c_user AND view_ts <= click_ts
           |AND view_ts > click_ts - INTERVAL $windowMs MILLISECONDS""".stripMargin))
      .select(col("click_id"), col("c_user").as("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /**
   * LEFT-OUTER stream-stream attribution (the w11/[[attributionPairs]]
   * pair join with the UNATTRIBUTED lane kept): every click emits — with
   * its matching in-window views when they exist, or ONCE with a NULL
   * view after the watermark proves no view can still arrive (Spark's
   * outer stream-stream join holds the unmatched row in state until the
   * other side's watermark passes the join bound, then releases it).
   * That null lane is the conversion-funnel denominator a monitor needs;
   * the inner form silently drops it. State stays watermark-bounded on
   * both sides, exactly like the inner join.
   */
  def attributionPairsLeftOuter(views: Dataset[Event], clicks: Dataset[Event],
                                windowMs: Long, watermarkDelay: String): DataFrame = {
    val v = views.toDF()
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    val c = clicks.toDF()
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    c.join(v, expr(
        s"""v_user = c_user AND view_ts <= click_ts
           |AND view_ts > click_ts - INTERVAL $windowMs MILLISECONDS""".stripMargin),
        "left_outer")
      .select(col("click_id"), col("c_user").as("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /**
   * Stream-static dimension enrichment — the lookup-join every streaming
   * ingest runs (events × user/account/catalog dimension): a LEFT join so
   * unmatched events survive into a quarantine-visible null lane instead
   * of silently dropping, with the dimension BROADCAST so the stream
   * never shuffles (per micro-batch the static side ships to executors;
   * the stateless join keeps no store, needs no watermark, and runs
   * indefinitely). Batch/stream-agnostic: the same plan under
   * `spark.read` is the w12 DuckDB-oracled twin; the streaming run is
   * proven batch-equivalent in StreamingSpec.
   */
  def enrichWithDim(events: Dataset[Event], dim: DataFrame, dimKey: String,
                    dimCols: Seq[String]): DataFrame = {
    val d = dim.select(col(dimKey).as("_dk") +: dimCols.map(col): _*)
    events.toDF().join(broadcast(d), col("user_id") === col("_dk"), "left")
      .drop("_dk")
  }

  /**
   * Streaming exact dedup: drop events whose key was already seen, with
   * watermark-bounded state (`dropDuplicatesWithinWatermark`) — the
   * streaming twin of the batch exact-dedup operator; state for keys older
   * than the watermark is evicted, so it runs indefinitely.
   */
  def dedupWithinWatermark(events: Dataset[Event], keyCols: Seq[String],
                           watermarkDelay: String): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Streaming MinHash-LSH near-dup DETECTION over a document stream — the
   * crawl-dedup shape: each doc's signature is banded (stateless,
   * expression-only); per (band_id, band_hash) bucket ONE small keeper
   * (earliest (ts, doc_id) seen) lives in state; a doc landing in a bucket
   * with an earlier keeper emits a [[NearDupEvent]]. When a doc PRECEDES
   * the current keeper (out-of-order within the watermark), the old keeper
   * is emitted as the dup and the new doc takes over — so dup MEMBERSHIP
   * (which docs are flagged) matches the batch twin for any disorder the
   * watermark admits (property-tested over randomized arrival orders).
   * ATTRIBUTION is best-effort in append mode: a verdict already emitted
   * against a since-displaced keeper cannot be retracted, so the
   * min-(dup_of_ts, dup_of) aggregated keeper may be non-minimal when
   * arrivals interleave — it is always a genuine earlier bucket-sharer.
   * Keeper state expires `retentionMs` after the LATEST doc the
   * bucket has ever seen (tracked in state, so an out-of-order arrival can
   * never shrink the horizon), bounding state size: this runs indefinitely.
   * Batch twin: [[graft.llm.Dedup.nearDupDetectBatch]] (relational;
   * oracle-checked with the portable family). Callers must
   * `withWatermark("ts", …)` the input in streaming mode.
   */
  def nearDupDetectStream(docs: Dataset[StreamDoc], retentionMs: Long,
                          shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                          family: graft.llm.MinHashFamily = graft.llm.Xx64Family)
      : Dataset[NearDupEvent] = {
    import docs.sparkSession.implicits._
    val banded = graft.llm.Dedup.lshBands(docs.toDF(), "text", "doc_id",
        shingleSize, k, bands, family, carry = Seq("ts"))
      .as[(Long, java.sql.Timestamp, Int, Long)]
    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[(Long, Long, Long), NearDupEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupEvent]
            // (keeperId, keeperTsMillis, maxTsMillisSeen)
            var keeper = state.getOption.map { case (id, t, _) => (id, t) }
            var maxTs = state.getOption.map(_._3).getOrElse(0L)
            // event-time order within the batch; across batches the
            // keeper-displacement branch repairs watermark-bounded disorder
            rows.toSeq.sortBy(r => (r._2.getTime, r._1)).foreach { r =>
              val (id, t) = (r._1, r._2.getTime)
              maxTs = math.max(maxTs, t)
              keeper match {
                case None => keeper = Some((id, t))
                case Some((kid, kts)) =>
                  if (t < kts || (t == kts && id < kid)) {
                    // doc precedes the keeper: old keeper becomes the dup
                    out += NearDupEvent(kid, new java.sql.Timestamp(kts), id, r._2)
                    keeper = Some((id, t))
                  } else if (id != kid) {
                    out += NearDupEvent(id, r._2, kid, new java.sql.Timestamp(kts))
                  }
              }
            }
            keeper.foreach { case (id, t) => state.update((id, t, maxTs)) }
            // 'timeout before watermark' must not be swallowed: a bucket
            // whose last-seen event time already trails the watermark by
            // more than retentionMs would otherwise keep keeper state with
            // no (or a stale) timeout — a slow state leak. Its retention
            // has expired by definition, so drop the state now.
            try state.setTimeoutTimestamp(maxTs + retentionMs)
            catch { case _: IllegalArgumentException => state.remove() }
            out.iterator
          }
      }
  }

  /**
   * Streaming twin of [[graft.ops.Anomaly.rollingCountAnomaly]]: live
   * volume-spike monitoring over a feed of finalized hourly buckets (the
   * watermark-closed output of [[windowedCounts]]). One tiny state object
   * per key — the trailing `windowHours` (hour, count) pairs, ≤ W entries,
   * so state is bounded by key-cardinality × W regardless of stream
   * length. The z-test is the SAME integer arithmetic as the batch
   * operator (BigInt here, DECIMAL there): for in-order feeds the verdicts
   * are bit-identical to the batch plan over the same buckets
   * (spec-checked). An out-of-order bucket inside the watermark is judged
   * against whatever baseline hours are in state — the honest live-monitor
   * semantics (a monitor cannot retract a page) — and then joins the
   * baseline for later hours.
   */
  def anomalyStream(buckets: Dataset[HourlyCount], windowHours: Int,
                    zThresh: Int): Dataset[AnomalyVerdict] = {
    import buckets.sparkSession.implicits._
    val z2 = BigInt(zThresh.toLong * zThresh)
    buckets.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[(Long, Long)], AnomalyVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[HourlyCount], state: GroupState[Seq[(Long, Long)]]) =>
          var baseline = state.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyVerdict]
          it.toSeq.sortBy(b => (b.hour_idx, b.cnt)).foreach { b =>
            // ROW-based trailing frame (last W observed buckets), matching
            // the batch operator's ROWS BETWEEN W PRECEDING AND 1 PRECEDING
            val frame = baseline.filter(_._1 < b.hour_idx).takeRight(windowHours)
            val n = frame.size.toLong
            val flag = if (n >= 2) {
              val s = BigInt(frame.map(_._2).sum)
              val q = frame.map(c => BigInt(c._2) * c._2).sum
              val dev = BigInt(b.cnt) * n - s
              val varN = q * n - s * s
              if (dev * dev * (n - 1) > z2 * n * varN) 1L else 0L
            } else 0L
            out += AnomalyVerdict(key, b.hour_idx, b.cnt, n, flag)
            // insert + evict hours the widest future frame can never use
            baseline = (baseline.filterNot(_._1 == b.hour_idx) :+ (b.hour_idx, b.cnt))
              .sortBy(_._1).takeRight(windowHours)
          }
          state.update(baseline)
          out.iterator
      }
  }

  /**
   * Gap-based sessionization with `flatMapGroupsWithState` +
   * EventTimeTimeout: one small state object per active user; a session is
   * emitted when a later event arrives past the gap, or when the watermark
   * passes `session_end + gap` (timeout). Callers must `withWatermark` the
   * input in streaming mode.
   */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._

    def close(userId: Long, b: SessionBuf): UserSession =
      UserSession(userId, new java.sql.Timestamp(b.start), new java.sql.Timestamp(b.end),
        b.n, b.sum)

    // Batch mode sees each user's FULL history in one group call and no
    // timeout ever fires afterwards — parking the trailing session in state
    // would silently drop it. Streaming mode must park it (a later batch or
    // the event-time timeout closes it).
    val streaming = events.isStreaming

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionBuf]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          if (state.hasTimedOut) {
            state.getOption.foreach(b => out += close(userId, b))
            state.remove()
          } else {
            // Sort within the batch slice; split on gaps > gapMs.
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var buf = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              val cents = math.round(e.value * 100).toDouble / 100.0
              if (buf == null) buf = SessionBuf(t, t, 1, cents)
              else if (t - buf.end > gapMs) {
                out += close(userId, buf)
                buf = SessionBuf(t, t, 1, cents)
              } else buf = SessionBuf(buf.start, t, buf.n + 1, buf.sum + cents)
            }
            if (buf != null) {
              if (streaming) {
                state.update(buf)
                // fire once the watermark passes the session's gap horizon;
                // when the horizon ALREADY trails the watermark the timeout
                // can never be set — the session is final now, so emit it
                // instead of parking it in state with no timeout (leak)
                try state.setTimeoutTimestamp(buf.end + gapMs)
                catch { case _: IllegalArgumentException =>
                  out += close(userId, buf)
                  state.remove()
                }
              } else {
                // batch: input is complete — the open session IS final
                out += close(userId, buf)
              }
            }
          }
          out.iterator
      }
  }

  /**
   * Batch-mode sessionization oracle shape: the same gap-split computed with
   * window functions (lag + cumulative session ids) — used to cross-check
   * the stateful path and as the catch-up path for backfills.
   */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events.toDF()
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > gapMs * 1000L)
          .cast("int"))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / lit(100.0)).as("value_sum"))
      .drop("session_id")
  }
}
