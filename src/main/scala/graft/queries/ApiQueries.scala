package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.Sources
import graft.io.{Catalog, Io}
import graft.ops.Filters
import Registry.td

/**
 * SURVEY §2.1 S8–S17 / §2.4 A12 / §2.6 O4 — catalog ops, export, and the
 * driver-side API-source surface. The remote fetch is injected (here: local
 * deterministic page functions over testdata), the pagination/drift/retry
 * machinery is the real engine code.
 */
object ApiQueries {

  private val FixtureRoot = "/root/repo/target/io_fixtures"

  val all: Seq[(String, Q)] = Seq(

    // S8 — view creation + SQL over it (create_modify.py:306-336)
    "s8_view_query" -> Q(
      (s, dir) => {
        Catalog.createView(s, "v_orders_graft", td(s, dir, "orders"))
        s.sql("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
                 FROM v_orders_graft GROUP BY o_orderstatus""")
      },
      Some("SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY o_orderstatus")),

    // S9 — table copy (create_modify.py:355-380)
    "s9_table_copy" -> Q(
      (s, dir) => {
        val src = s"$FixtureRoot/s9src_${new java.io.File(dir).getName}"
        val dst = s"$FixtureRoot/s9dst_${new java.io.File(dir).getName}"
        td(s, dir, "nation").write.mode("overwrite").parquet(src)
        Io.copyTable(s, src, dst)
        s.read.parquet(dst)
      },
      Some("SELECT * FROM nation"), eager = true),

    // S10 — table delete / dataset create: idempotent drop + recreate; the
    //   post-drop definition must win (create_modify.py:339-352, 383-410)
    "s10_view_drop_recreate" -> Q(
      (s, dir) => {
        Catalog.createDatabase(s, "graft_s10_db")
        Catalog.createView(s, "v_s10_region", td(s, dir, "region"))
        require(Catalog.dropViewIfExists(s, "v_s10_region"),
          "dropping an existing view must report true")
        require(!Catalog.dropViewIfExists(s, "v_s10_region"),
          "a second drop must be an idempotent no-op")
        Catalog.createView(s, "v_s10_region",
          td(s, dir, "region").filter(col("r_regionkey") < 3))
        s.sql("SELECT r_regionkey, r_name FROM v_s10_region")
      },
      Some("SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 3")),

    // S12 — object-store I/O: stage binary objects, pull them with the
    //   executor-parallel puller, read back DISTRIBUTED via the binaryFile
    //   source and content-hash every object (support.py:661-752)
    "s12_object_store_roundtrip" -> Q(
      (s, dir) => {
        val src = s"$FixtureRoot/s12src_${new java.io.File(dir).getName}"
        val dst = s"$FixtureRoot/s12dst_${new java.io.File(dir).getName}"
        // clean both fixture dirs: stale obj_*.bin from a prior (possibly
        // interrupted or different-fixture) run would leak into the
        // binaryFile glob and diverge from the oracle's current-table rows
        for (d <- Seq(src, dst); f <- Option(new java.io.File(d).listFiles).getOrElse(Array.empty))
          f.delete()
        new java.io.File(src).mkdirs()
        td(s, dir, "nation").select("n_nationkey", "n_name").collect().foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$src/obj_${r.get(0)}.bin"),
            r.getString(1).getBytes("UTF-8"))
        }
        val pullList = td(s, dir, "nation")
          .select(concat(lit(s"$src/obj_"), col("n_nationkey"), lit(".bin")).as("uri"))
        Sources.pullToDir(pullList, "uri", dst,
          uri => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(uri)))
        s.read.format("binaryFile").load(s"$dst/*.bin")
          .select(
            regexp_extract(col("path"), "obj_([0-9]+)\\.bin", 1).cast("int").as("n_nationkey"),
            length(col("content")).cast("long").as("byte_len"),
            md5(col("content")).as("content_md5"))
      },
      Some("""SELECT n_nationkey, CAST(octet_length(encode(n_name)) AS BIGINT) AS byte_len,
             |md5(n_name) AS content_md5 FROM nation""".stripMargin), eager = true),

    // S11 — export table → TSV with header (support.py:434-470), read back
    "s11_export_tsv" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s11_${new java.io.File(dir).getName}"
        Catalog.exportTsv(td(s, dir, "region"), path)
        Io.readTsvTyped(s, path, StructType(Seq(
          StructField("r_regionkey", IntegerType), StructField("r_name", StringType))))
      },
      Some("SELECT r_regionkey, r_name FROM region"), eager = true),

    // S13/A12 — offset/limit paginated source with drift detection + retry
    //   (pdc_helpers.py:26-168): pages served locally from customer
    "s13_paginated_source" -> Q(
      (s, dir) => {
        val all = td(s, dir, "customer").select("c_custkey", "c_name")
          .orderBy("c_custkey").collect().toSeq
        var failedOnce = false
        val rows = Sources.fetchPaged[Row](pageSize = 100) { (offset, limit) =>
          // one transient failure exercises the retry path
          if (offset == 100 && !failedOnce) { failedOnce = true; sys.error("transient 503") }
          (all.slice(offset, offset + limit), all.size)
        }
        Sources.toDataFrame(s, rows, StructType(Seq(
          StructField("c_custkey", LongType), StructField("c_name", StringType))))
      },
      Some("SELECT c_custkey, c_name FROM customer"), eager = true),

    // S14 — cursor-walk source (rel="next" pagination,
    //   quant_data_matrix_pdc.py:49-131): cursor is the last-seen key
    "s14_cursor_source" -> Q(
      (s, dir) => {
        val all = td(s, dir, "supplier").select("s_suppkey", "s_name")
          .orderBy("s_suppkey").collect().toSeq
        val rows = Sources.fetchCursor[Row] { cursor =>
          val from = cursor.map(_.toLong).getOrElse(-1L)
          val page = all.filter(_.getLong(0) > from).take(3)
          val next = if (page.size < 3) None else Some(page.last.getLong(0).toString)
          (page, next)
        }
        Sources.toDataFrame(s, rows, StructType(Seq(
          StructField("s_suppkey", LongType), StructField("s_name", StringType))))
      },
      Some("SELECT s_suppkey, s_name FROM supplier"), eager = true),

    // S15 — manifest source: filter-dict → manifest rows (support.py:503-573)
    "s15_manifest_source" -> Q(
      (s, dir) => td(s, dir, "part")
        .filter(Filters.configFilter(Seq(
          "p_type" -> Filters.In(Seq("ECONOMY", "PROMO")),
          "p_size" -> Filters.Eq(1))))
        .select(col("p_partkey").as("file_id"), col("p_name").as("file_name")),
      Some("""SELECT p_partkey AS file_id, p_name AS file_name FROM part
             |WHERE p_type IN ('ECONOMY','PROMO') AND p_size = 1""".stripMargin)),

    // S16 — bucket puller: executor-parallel fetch of a pull-list
    //   (support.py:661-752); fetch injected as local file reads
    "s16_bucket_puller" -> Q(
      (s, dir) => {
        val src = s"$FixtureRoot/s16src_${new java.io.File(dir).getName}"
        val dst = s"$FixtureRoot/s16dst_${new java.io.File(dir).getName}"
        // stage "remote" objects: one file per region
        new java.io.File(src).mkdirs()
        td(s, dir, "region").collect().foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$src/region_${r.get(0)}.txt"),
            r.getString(1).getBytes("UTF-8"))
        }
        val pullList = td(s, dir, "region")
          .select(concat(lit(s"$src/region_"), col("r_regionkey"), lit(".txt")).as("uri"))
        Sources.pullToDir(pullList, "uri", dst,
          uri => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(uri)))
        // inventory of pulled objects, loaded back distributed
        s.read.option("wholetext", "true").text(s"$dst/*.txt")
          .select(input_file_name().as("f"), col("value"))
          .select(regexp_extract(col("f"), "region_([0-9]+)\\.txt", 1).cast("int").as("r_regionkey"),
            col("value").as("r_name"))
      },
      Some("SELECT r_regionkey, r_name FROM region"), eager = true),

    // S17 — zip extraction source → normalized TSV read (extract_from_tsv.py:44-99)
    "s17_zip_extract" -> Q(
      (s, dir) => {
        val root = s"$FixtureRoot/s17_${new java.io.File(dir).getName}"
        new java.io.File(root).mkdirs()
        val rows = td(s, dir, "nation").select("n_nationkey", "n_name")
          .orderBy("n_nationkey").collect()
        val (a, b) = rows.splitAt(rows.length / 2)
        val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(s"$root/data.zip"))
        def entry(name: String, part: Array[Row]): Unit = {
          zip.putNextEntry(new java.util.zip.ZipEntry(name))
          val body = ("n_nationkey\tn_name" +: part.map(r => s"${r.get(0)}\t${r.getString(1)}").toSeq).mkString("\n")
          zip.write(body.getBytes("UTF-8")); zip.closeEntry()
        }
        entry("part1.tsv", a); entry("part2.tsv", b)
        zip.putNextEntry(new java.util.zip.ZipEntry("empty.tsv")); zip.closeEntry() // skipped
        zip.close()
        val extracted = Sources.extractZip(s"$root/data.zip", s"$root/out")
          .filter(_.endsWith(".tsv"))
        extracted.map(p => Io.readTsv(s, p)).reduce(_ unionByName _)
          .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"))
      },
      Some("SELECT n_nationkey, n_name FROM nation"), eager = true),

    // O4 — driver-side top-N display cutoff via take(n)
    //   (compare_and_publish_tables.py:101-104)
    "o4_top_n_display" -> Q(
      (s, dir) => {
        val top = td(s, dir, "customer").orderBy(col("c_acctbal").desc, col("c_custkey"))
          .select("c_custkey", "c_acctbal").take(5)
        Sources.toDataFrame(s, top.toIndexedSeq, StructType(Seq(
          StructField("c_custkey", LongType), StructField("c_acctbal", DoubleType))))
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |ORDER BY c_acctbal DESC, c_custkey LIMIT 5""".stripMargin), eager = true),

    // event-time window aggregation over the events table
    //   (streaming-compatible shape: same plan works under readStream +
    //   watermark; here batch, grouped on the hour window)
    "w2_event_time_window" -> Q(
      (s, dir) => {
        val e = Registry.tdEventsUs(s, dir)
          .withColumn("ts_us", timestamp_micros(col("ts_us")))
        e.groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            (sum(round(col("value") * 100).cast("long")) / lit(100.0)).as("value_sum"))
          .select(col("window.start").cast("long").as("hour_epoch"),
            col("event_type"), col("n"), col("value_sum"))
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
             |CAST(count(*) AS BIGINT) AS n,
             |CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS value_sum
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // time-series gap filling + LOCF: per user, every hour between first
    // and last activity exists in the output — gaps carry the last
    // observed hourly total forward (the dashboard/feature-store densify
    // step). All-integer hour index (µs div) and exact cents, so the fill
    // is engine-exact; per-user grid is bounded by the time span, the
    // join and window share one hash partitioning on user
    "w7_gap_fill_locf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // FLOOR division, not `div` (truncates toward zero): DuckDB's `//`
        // floors, and the two diverge on pre-epoch timestamps — latent on
        // this fixture but a real-data trap
        val hrFloor = expr("ts_us div 3600000000") -
          when(expr("ts_us % 3600000000") < 0, 1L).otherwise(0L)
        val actual = Registry.tdEventsUs(s, dir)
          .select(col("user_id"), hrFloor.as("hr"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("user_id", "hr").agg(sum(col("cents")).as("cents"))
        val grid = actual.groupBy("user_id")
          .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
          .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("hr"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(actual, Seq("user_id", "hr"), "left")
          .withColumn("_locf", last(col("cents"), ignoreNulls = true).over(w))
          .select(col("user_id"), col("hr"),
            (col("_locf") / lit(100.0)).as("value_filled"),
            col("cents").isNull.as("was_gap"))
      },
      Some("""WITH a AS (
             |  SELECT user_id, epoch_us(ts)//3600000000 AS hr,
             |    SUM(CAST(round(value*100) AS BIGINT)) AS cents
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM a GROUP BY 1),
             |g AS (SELECT user_id, unnest(range(mn, mx+1)) AS hr FROM b),
             |j AS (SELECT g.user_id, g.hr, a.cents
             |  FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.hr = a.hr)
             |SELECT user_id, CAST(hr AS BIGINT) AS hr,
             |  last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS value_filled,
             |  cents IS NULL AS was_gap
             |FROM j""".stripMargin)),

    // ordered event-sequence funnel over the real events table: per-user
    // greedy earliest-advance through signup→view→click→purchase (step
    // i+1 strictly after step i), reported as cumulative conversion.
    // ONE shuffle + expression fold — no k-pass self-joins; the oracle
    // replays the equivalent chained per-step-min formulation
    "w8_event_funnel" -> Q(
      (s, dir) => graft.ops.Funnel.funnelReport(
        Registry.tdEventsUs(s, dir), "user_id", "ts_us", "event_id",
        "event_type", Seq("signup", "view", "click", "purchase")),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu
             |  FROM events
             |  WHERE event_type IN ('signup','view','click','purchase')),
             |u1 AS (SELECT user_id, min(tsu) AS t1 FROM e
             |  WHERE event_type = 'signup' GROUP BY 1),
             |u2 AS (SELECT e.user_id, min(tsu) AS t2 FROM e
             |  JOIN u1 USING (user_id)
             |  WHERE event_type = 'view' AND tsu > t1 GROUP BY 1),
             |u3 AS (SELECT e.user_id, min(tsu) AS t3 FROM e
             |  JOIN u2 USING (user_id)
             |  WHERE event_type = 'click' AND tsu > t2 GROUP BY 1),
             |u4 AS (SELECT e.user_id, min(tsu) AS t4 FROM e
             |  JOIN u3 USING (user_id)
             |  WHERE event_type = 'purchase' AND tsu > t3 GROUP BY 1),
             |b AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM e),
             |c AS (
             |  SELECT 1 AS step, 'signup' AS step_name,
             |    (SELECT count(*) FROM u1) AS n_reached
             |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM u2)
             |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM u3)
             |  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM u4))
             |SELECT CAST(step AS BIGINT) AS step, step_name,
             |  CAST(n_reached AS BIGINT) AS n_reached,
             |  round(CAST(n_reached AS DOUBLE) / n_users, 6) AS conv_rate
             |FROM c, b""".stripMargin)),

    // cohort retention triangle over the events table: users grouped by
    // first-activity day, each later active day counted as day-N
    // retention. Two user-keyed hash-aggs + a broadcastable cohort-size
    // join; all-integer day arithmetic (floor-safe µs division)
    "w9_retention_cohorts" -> Q(
      (s, dir) => graft.ops.Retention.cohortRetention(
        Registry.tdEventsUs(s, dir), "user_id", "ts_us"),
      Some("""WITH ud AS (SELECT DISTINCT user_id,
             |    epoch_us(ts)//86400000000 AS day FROM events),
             |f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1),
             |cs AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_cohort
             |  FROM f GROUP BY 1),
             |act AS (SELECT f.cohort_day, ud.day - f.cohort_day AS day_offset,
             |    CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_active
             |  FROM ud JOIN f USING (user_id) GROUP BY 1, 2)
             |SELECT CAST(act.cohort_day AS BIGINT) AS cohort_day,
             |  CAST(day_offset AS BIGINT) AS day_offset, n_active, n_cohort,
             |  round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
             |FROM act JOIN cs USING (cohort_day)""".stripMargin)),

    // w10 — rolling-window volume-anomaly monitor: hourly counts per
    // event_type vs a trailing-24h baseline, 3-sigma z-test evaluated in
    // INTEGER arithmetic (dev²·(n−1) > 9·n·(n·Σc²−(Σc)²)) so the flag is
    // bit-identical across engines. The window runs over the AGGREGATED
    // hourly series, never the raw events (ops/Anomaly.scala).
    "w10_rolling_anomaly" -> Q(
      (s, dir) => graft.ops.Anomaly.rollingCountAnomaly(
        Registry.tdEventsUs(s, dir), "event_type", "ts_us",
        windowHours = 24, zThresh = 3),
      Some("""WITH h AS (SELECT event_type AS key,
             |    epoch_us(ts)//3600000000 AS hour_idx,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |w AS (SELECT key, hour_idx, cnt,
             |    CAST(count(*) OVER win AS BIGINT) AS baseline_n,
             |    CAST(coalesce(sum(cnt) OVER win, 0) AS BIGINT) AS baseline_sum,
             |    CAST(coalesce(sum(cnt * cnt) OVER win, 0) AS BIGINT) AS baseline_sumsq
             |  FROM h
             |  WINDOW win AS (PARTITION BY key ORDER BY hour_idx
             |                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
             |d AS (SELECT *,
             |    CAST(cnt * baseline_n - baseline_sum AS HUGEINT) AS dev,
             |    CAST(baseline_n AS HUGEINT) * baseline_sumsq
             |      - CAST(baseline_sum AS HUGEINT) * baseline_sum AS varn
             |  FROM w)
             |SELECT key, CAST(hour_idx AS BIGINT) AS hour_idx, cnt, baseline_n,
             |  baseline_sum, baseline_sumsq,
             |  CAST(CASE WHEN baseline_n >= 2
             |         AND dev * dev * (baseline_n - 1) > 9 * CAST(baseline_n AS HUGEINT) * varn
             |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
             |FROM d""".stripMargin)),

    // w13 — EWMA trend smoothing (Roberts 1959 control chart) per
    // event_type over DAILY counts: the drift detector next to w10's
    // spike test (a small persistent level shift moves the EWMA long
    // before any hour trips 3-sigma). Integer micro-unit per-step floor
    // recursion s_k = (α·x_k·10⁶ + (10⁴−α)·s_{k−1}) div 10⁴ replayed by
    // an ordered recursive CTE; per-key array fold is calendar-bounded
    // w14 — OHLC resample bars (Anomaly.ohlcBars): per (event_type, hour)
    // candles over the raw value stream in ONE hash aggregation —
    // open/close ride min_by/max_by over a (ts, event_id) struct, so
    // colliding timestamps still resolve deterministically (first()'s
    // scan-order trap). Selections are bit-exact; the sum is decimal.
    // The oracle replays open/close with rank-1 window rows
    "w14_ohlc_bars" -> Q(
      (s, dir) => graft.ops.Anomaly.ohlcBars(
        Registry.tdEventsUs(s, dir)
          .select(col("event_type"), col("ts_us"), col("event_id"), col("value")),
        "event_type", "ts_us", "event_id", "value",
        bucketSize = 3600L * 1000000L),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id, value
             |  FROM events),
             |r AS (SELECT event_type,
             |    ts_us // 3600000000 AS bucket, value,
             |    row_number() OVER (PARTITION BY event_type, ts_us // 3600000000
             |      ORDER BY ts_us, event_id) AS ra,
             |    row_number() OVER (PARTITION BY event_type, ts_us // 3600000000
             |      ORDER BY ts_us DESC, event_id DESC) AS rd
             |  FROM e)
             |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
             |  max(CASE WHEN ra = 1 THEN value END) AS open,
             |  max(value) AS high, min(value) AS low,
             |  max(CASE WHEN rd = 1 THEN value END) AS close,
             |  CAST(count(*) AS BIGINT) AS volume,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vsum
             |FROM r GROUP BY 1, 2""".stripMargin)),

    // w15 — first-order Markov transition matrix over per-user event
    // sequences (Funnel.transitionMatrix): lead() pairs in (ts, id) order
    // → (src,dst) hash-agg → row-normalized probability in exact integer
    // micro-units; the per-src totals window runs over the |types|²
    // aggregated matrix, never the event stream
    "w15_markov_transitions" -> Q(
      (s, dir) => graft.ops.Funnel.transitionMatrix(
        Registry.tdEventsUs(s, dir), "user_id", "ts_us", "event_id", "event_type"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             |    event_type FROM events),
             |p AS (SELECT event_type AS src,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id) AS dst
             |  FROM e),
             |c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
             |  FROM p WHERE dst IS NOT NULL GROUP BY 1, 2)
             |SELECT src, dst, n,
             |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY src) AS BIGINT)
             |    AS p_micro
             |FROM c""".stripMargin)),

    "w13_ewma_trend" -> Q(
      (s, dir) => graft.ops.Anomaly.ewmaTrend(
        Registry.tdEventsUs(s, dir)
          .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
            lit(1L).as("one")),
        "event_type", "day", "one", alphaBp = 3000L),
      Some("""WITH RECURSIVE pt AS (SELECT event_type AS key,
             |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS t,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |e AS (SELECT key, t, x,
             |    row_number() OVER (PARTITION BY key ORDER BY t) AS rn FROM pt),
             |r AS (
             |  SELECT key, t, x, rn, x * 1000000 AS ewma,
             |    CAST(0 AS BIGINT) AS dev
             |  FROM e WHERE rn = 1
             |  UNION ALL
             |  SELECT e.key, e.t, e.x, e.rn,
             |    (3000 * e.x * 1000000 + 7000 * r.ewma) // 10000,
             |    e.x * 1000000 - r.ewma
             |  FROM r JOIN e ON e.key = r.key AND e.rn = r.rn + 1)
             |SELECT key, t, x, ewma AS ewma_micro, dev AS dev_micro
             |FROM r""".stripMargin)),

    // a30 — CUSUM change-point detection (Page 1954) per event_type over
    // daily counts: accumulates exceedance above mean+slack, floors at
    // zero, alarms past h — the sustained-shift test beside w10 (spikes)
    // and w13 (drift). Series-relative integer thresholds in basis
    // points of the key's own mean; ordered recursive-CTE oracle
    "a30_cusum" -> Q(
      (s, dir) => graft.ops.Anomaly.cusum(
        Registry.tdEventsUs(s, dir)
          .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
            lit(1L).as("one")),
        "event_type", "day", "one", slackBp = 1000L, thresholdBp = 5000L),
      Some("""WITH RECURSIVE pt AS (SELECT event_type AS key,
             |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS t,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |ref AS (SELECT key,
             |    CAST((sum(x) * 1000000) // count(*) AS BIGINT) AS ref_micro
             |  FROM pt GROUP BY 1),
             |e AS (SELECT pt.key, t, x, ref_micro,
             |    row_number() OVER (PARTITION BY pt.key ORDER BY t) AS rn
             |  FROM pt JOIN ref USING (key)),
             |r AS (
             |  SELECT key, t, x, ref_micro, rn,
             |    CAST(greatest(0, x * 1000000 - ref_micro
             |      - (1000 * ref_micro) // 10000) AS BIGINT) AS c
             |  FROM e WHERE rn = 1
             |  UNION ALL
             |  SELECT e.key, e.t, e.x, e.ref_micro, e.rn,
             |    CAST(greatest(0, r.c + e.x * 1000000 - e.ref_micro
             |      - (1000 * e.ref_micro) // 10000) AS BIGINT)
             |  FROM r JOIN e ON e.key = r.key AND e.rn = r.rn + 1)
             |SELECT key, t, x, ref_micro, c AS cusum_micro,
             |  CAST(CASE WHEN c > (5000 * ref_micro) // 10000
             |       THEN 1 ELSE 0 END AS BIGINT) AS alarm
             |FROM r""".stripMargin)),

    // w11 — last-touch click attribution: each click joins the views of
    // the SAME user inside the trailing 30-min window (equi key user_id
    // drives the shuffle, the time range is a post-join filter — SMJ,
    // never a cross product), then ONE hash-agg picks the latest view
    // (max struct (view_us, view_id): deterministic ts→id tiebreak).
    // Unattributed clicks keep a NULL view (left join). The streaming
    // form of the same pair join — both sides unbounded, watermark-
    // bounded state — is Streaming.attributionPairs, spec'd in
    // StreamingSpec; exact µs integer arithmetic throughout
    "w11_click_attribution" -> Q(
      (s, dir) => {
        val e = Registry.tdEventsUs(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts_us").as("click_us"))
        val views = e.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
            col("ts_us").as("view_us"))
        val windowUs = 30L * 60 * 1000000
        clicks.join(views,
            col("user_id") === col("v_user") &&
              col("view_us") <= col("click_us") &&
              col("view_us") > col("click_us") - windowUs,
            "left")
          .groupBy("click_id", "user_id", "click_us")
          .agg(max(struct(col("view_us"), col("view_id"))).as("_best"))
          .select(col("click_id"), col("user_id"),
            col("_best.view_id").as("view_id"),
            (col("click_us") - col("_best.view_us")).as("gap_us"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type
             |  FROM events),
             |c AS (SELECT event_id AS click_id, user_id, us AS click_us
             |  FROM ev WHERE event_type = 'click'),
             |v AS (SELECT event_id AS view_id, user_id, us AS view_us
             |  FROM ev WHERE event_type = 'view'),
             |j AS (SELECT c.click_id, c.user_id, c.click_us, v.view_id, v.view_us
             |  FROM c LEFT JOIN v ON c.user_id = v.user_id
             |    AND v.view_us <= c.click_us
             |    AND v.view_us > c.click_us - 1800000000),
             |r AS (SELECT click_id, user_id, view_id, click_us - view_us AS gap_us,
             |    row_number() OVER (PARTITION BY click_id
             |      ORDER BY view_us DESC NULLS LAST, view_id DESC) AS rn
             |  FROM j)
             |SELECT click_id, user_id, view_id, gap_us FROM r WHERE rn = 1""".stripMargin))
  )
}
