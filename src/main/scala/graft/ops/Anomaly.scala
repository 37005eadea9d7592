package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rolling-window anomaly detection over an event stream — the ingest
 * data-quality monitor shape: bucket events into hourly counts per key,
 * compare each hour against the trailing-window mean/variance of the SAME
 * key, and flag hours whose z-score exceeds a threshold (volume spikes,
 * dead feeds). The reference's QC layer diffs whole table versions
 * (ops/Diff.scala / C4); this is the streaming-era equivalent for
 * append-only logs.
 *
 * Exactness: the z-test is evaluated in INTEGER arithmetic only —
 * `(n·c − s)² · (n−1) > z²·n·(n·q − s²)` with s = Σcount, q = Σcount²
 * over the trailing frame — so the flag is bit-identical across engines
 * (no double accumulation order, no sqrt). The frame excludes the current
 * row (classic trailing baseline) and needs ≥ 2 baseline hours.
 *
 * Scale shape: ONE shuffle to the (key, hour) hash-agg — the raw events
 * never hit a window. The windowed pass runs over the AGGREGATED series
 * (rows = keys × hours, e.g. a year of hourly buckets is 8 760 rows per
 * key), so per-key partitions stay tiny no matter how many raw events
 * back them; a key with pathological hour-cardinality is still bounded by
 * wall-clock time itself.
 */
object Anomaly {

  /**
   * @param events      input rows
   * @param keyCol      series key (e.g. event_type)
   * @param tsUsCol     epoch-microseconds BIGINT column
   * @param windowHours trailing baseline width W (frame = W previous hours
   *                    present in the series, current hour excluded)
   * @param zThresh     integer z threshold (e.g. 3 = 3-sigma)
   *
   * Output: (key, hour_idx, cnt, baseline_n, baseline_sum, baseline_sumsq,
   * is_anomaly∈{0,1}) — all BIGINT; is_anomaly is null-safe 0 when the
   * baseline is too short (n < 2) or has zero variance with zero deviation.
   */
  def rollingCountAnomaly(
      events: DataFrame,
      keyCol: String,
      tsUsCol: String,
      windowHours: Int,
      zThresh: Int): DataFrame = {
    val hourly = events
      // `div` (integral), not `/`: long ÷ long is a DOUBLE divide in the
      // column DSL, and µs epochs are near double's exact-integer edge
      .groupBy(col(keyCol).as("key"),
        expr(s"`$tsUsCol` div 3600000000").as("hour_idx"))
      .agg(count(lit(1)).cast("long").as("cnt"))

    val w = Window.partitionBy("key").orderBy("hour_idx")
      .rowsBetween(-windowHours, -1)
    val n = count(lit(1)).over(w).cast("long")
    val s = sum(col("cnt")).over(w).cast("long")
    val q = sum(col("cnt") * col("cnt")).over(w).cast("long")

    def anomaly(n: Column, s: Column, q: Column): Column = {
      // widen to DECIMAL(38,0) before squaring: hourly counts in the
      // billions would overflow BIGINT squares (ANSI mode throws); the
      // oracle side widens to HUGEINT for the same reason
      val dec = "decimal(38,0)"
      val dev = (col("cnt") * n - s).cast(dec)      // n·(c − mean), scaled
      val varN = (n * q).cast(dec) - (s.cast(dec) * s.cast(dec))
      // (c − mean)² > z²·var_samp  ⇔  dev²·(n−1) > z²·n·varN
      (dev * dev * (n - 1).cast(dec) >
        lit(zThresh.toLong * zThresh).cast(dec) * n.cast(dec) * varN)
        .cast("long")
    }

    hourly
      .withColumn("baseline_n", n)
      .withColumn("baseline_sum", coalesce(s, lit(0L)))
      .withColumn("baseline_sumsq", coalesce(q, lit(0L)))
      .withColumn("is_anomaly",
        when(col("baseline_n") >= 2,
          anomaly(col("baseline_n"), col("baseline_sum"), col("baseline_sumsq")))
          .otherwise(lit(0L)))
      .select(col("key"), col("hour_idx"), col("cnt"), col("baseline_n"),
        col("baseline_sum"), col("baseline_sumsq"), col("is_anomaly"))
  }

  /**
   * Chi-square independence/drift table over a two-way contingency — "is
   * the event-type mix independent of the day-of-week?" / "did this
   * week's category distribution drift from the corpus baseline?" — the
   * categorical complement to [[rollingAnomaly]]'s volume z-test and
   * a22's location test.
   *
   * Exactness: each cell's chi² contribution (O−E)²/E is algebraically
   * (N·O − rT·cT)² / (N·rT·cT) with rT/cT the row/column totals — the
   * numerator and denominator are INTEGER products, so the contribution
   * is emitted as exact floor micro-units `(num·10⁶) div den` in
   * DECIMAL(38,0) (numerators reach ~10²⁴ at sf1 — past BIGINT, exact in
   * 128-bit). No float division anywhere ⇒ bit-identical on any engine;
   * the statistic itself is Σ contrib_micro / 10⁶.
   *
   * Scale shape: ONE scan to the (row, col) cell hash-agg; row totals,
   * column totals, and N all derive from the TINY cell table (|rows|·|cols|
   * entries) via broadcast joins — the raw data is never touched again.
   *
   * Output: (rowKey, colKey, o, e_micro, contrib_micro), one row per
   * observed cell. (Unobserved cells contribute rT·cT/N each; a drift
   * gate sums the observed table — document the structural-zero caveat.)
   */
  def chiSquareDrift(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.groupBy(col(rowCol).as("rk"), col(colCol).as("ck"))
      .agg(count(lit(1)).cast("long").as("o"))
    val rowTot = cells.groupBy("rk").agg(sum("o").cast("long").as("rt"))
    val colTot = cells.groupBy("ck").agg(sum("o").cast("long").as("ct"))
    // N rides a NON-FOLDABLE-key one-row broadcast (xxhash64 % 1): a
    // foldable key would fold into a cross-join condition and plan a
    // BroadcastNestedLoopJoin (Ann.joinedCellScores trick, plan-audited)
    val nTot = cells.agg(sum("o").cast("long").as("n"))
      .withColumn("_k", pmod(xxhash64(col("n")), lit(1)))
    cells.join(broadcast(rowTot), "rk")
      .join(broadcast(colTot), "ck")
      .withColumn("_k", pmod(xxhash64(col("o")), lit(1)))
      .join(broadcast(nTot), "_k")
      .withColumn("_num",
        (col("n").cast(dec) * col("o") - col("rt").cast(dec) * col("ct")))
      .select(col("rk").as(rowCol), col("ck").as(colCol), col("o"),
        expr(s"CAST((CAST(rt AS $dec) * ct * 1000000) div (CAST(n AS $dec)) AS LONG)")
          .as("e_micro"),
        expr(s"CAST((_num * _num * 1000000) div (CAST(n AS $dec) * rt * ct) AS LONG)")
          .as("contrib_micro"))
  }

  /** Benford micro-proportions: ⌊10⁶·log₁₀(1+1/d)⌋ rounded — the nine
    * values sum to EXACTLY 10⁶ (the log telescopes to log₁₀(10)), so the
    * expected counts partition n with no remainder drift. */
  val BenfordMicro: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /**
   * Benford's-law first-digit audit (Newcomb 1881; Benford 1938; the
   * standard forensic screen for fabricated or truncated numeric feeds):
   * the leading significant digit of a naturally-spread positive measure
   * follows P(d) = log₁₀(1+1/d). A data feed whose amounts were invented,
   * clipped, or unit-mangled shows digit-1 excess or digit-9 holes long
   * before summary stats move.
   *
   * Exactness: values enter as positive integers (the caller pre-scales —
   * e.g. cents), the leading digit is the first character of the decimal
   * string (identical on any engine), expected counts are n·p_micro with
   * the micro-proportions above (they sum to exactly 10⁶), and each
   * chi-square contribution is the cleared-denominator integer
   * ((10⁶·o − n·p_micro)²) div (n·p_micro) in DECIMAL(38,0). That IS the
   * micro-unit contribution: with _d = 10⁶·(o−e), (o−e)²/e =
   * _d²/(10⁶·n·p_micro) in whole units, so micro-units divide by
   * n·p_micro only — a gate summing contrib_micro/10⁶ recovers the
   * textbook chi² (the round-9 advisor caught an extra 10⁶ here that
   * floored every mild-drift contribution to zero).
   *
   * Scale shape: ONE hash-agg over the measure (9 output groups); the
   * digit frame (1..9) EXPLODES from the one-row total (no join), and the
   * observed counts broadcast back onto it so absent digits still emit
   * rows (o = 0).
   *
   * Output: (digit, o, e_micro, contrib_micro), 9 rows.
   */
  def benfordAudit(df: DataFrame, valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val obs = df.select(col(valCol).cast("long").as("_v"))
      .filter(col("_v") > 0)
      .select(substring(col("_v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).cast("long").as("o"))
    val digits = obs.agg(sum("o").cast("long").as("n"))
      .select(col("n"), explode(sequence(lit(1L), lit(9L))).as("digit"))
      .withColumn("p_micro",
        element_at(array(BenfordMicro.map(lit(_)): _*), col("digit").cast("int")))
    digits.join(broadcast(obs), Seq("digit"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("_d", expr(s"CAST(1000000 AS $dec) * o - CAST(n AS $dec) * p_micro"))
      .select(col("digit"), col("o"),
        (col("n") * col("p_micro")).cast("long").as("e_micro"),
        expr(s"CAST((_d * _d) div (CAST(n AS $dec) * p_micro) AS LONG)")
          .as("contrib_micro"))
  }

  /**
   * EWMA trend smoothing per series (Roberts 1959, the EWMA control
   * chart; Hunter 1986) — the trend companion to [[rollingCountAnomaly]]:
   * where the rolling z flags spikes against a FLAT trailing window, the
   * exponentially weighted mean tracks drifting levels (its whole point:
   * small persistent shifts move the EWMA long before any single hour
   * trips a z test).
   *
   * Exactness contract: the recursion runs in integer MICRO-UNITS with a
   * per-step floor — s₁ = x₁·10⁶, then
   * s_k = (α_bp·x_k·10⁶ + (10⁴−α_bp)·s_{k−1}) div 10⁴ — so any engine
   * replaying the same ordered recursion (a DuckDB recursive CTE with
   * `//`) matches bit for bit; `dev_micro = x_k·10⁶ − s_{k−1}` is the
   * surprise vs the PRIOR smoothed level (0 for the seed row).
   *
   * Scale shape: one hash-agg to per-(key, t) values, then a per-key
   * sorted-array fold (`aggregate` HOF — the kaplanMeier convention):
   * the fold state is one long, the array is the series' time axis —
   * calendar-bounded, never event-bounded. No driver state.
   *
   * Output: (key, t, x, ewma_micro, dev_micro), all BIGINT.
   */
  def ewmaTrend(df: DataFrame, keyCol: String, timeCol: String,
                valueCol: String, alphaBp: Long): DataFrame = {
    require(alphaBp > 0 && alphaBp <= 10000,
      s"alphaBp must be in (0, 10000], got $alphaBp")
    val perT = df.groupBy(col(keyCol).as("key"),
        col(timeCol).cast("long").as("t"))
      .agg(sum(col(valueCol).cast("long")).as("x"))
    val accT = "struct<last:bigint,out:array<struct<t:bigint,x:bigint," +
               "ewma_micro:bigint,dev_micro:bigint>>>"
    perT.groupBy("key")
      .agg(array_sort(collect_list(struct(col("t"), col("x")))).as("steps"))
      .select(col("key"), explode(aggregate(
        col("steps"),
        expr(s"cast(named_struct('last', -1L, 'out', array()) as $accT)"),
        (acc, s) => {
          val xm = s.getField("x") * 1000000L
          val seeded = acc.getField("last") >= 0L
          val num = lit(alphaBp) * xm +
            lit(10000L - alphaBp) * acc.getField("last")
          val next = when(seeded,
            ((num - pmod(num, lit(10000L))) / 10000L).cast("long"))
            .otherwise(xm)
          val dev = when(seeded, xm - acc.getField("last")).otherwise(lit(0L))
          struct(next.as("last"),
            concat(acc.getField("out"), array(struct(
              s.getField("t").as("t"), s.getField("x").as("x"),
              next.as("ewma_micro"), dev.as("dev_micro")))).as("out"))
        },
        acc => acc.getField("out"))).as("step"))
      .select(col("key"), col("step.t").as("t"), col("step.x").as("x"),
        col("step.ewma_micro").as("ewma_micro"),
        col("step.dev_micro").as("dev_micro"))
  }

  /**
   * One-sided upper CUSUM change-point detection per series (Page 1954)
   * — the third leg of the monitoring stack: [[rollingCountAnomaly]]
   * catches spikes, [[ewmaTrend]] tracks drifting levels, CUSUM is the
   * sequential test that ACCUMULATES small exceedances and alarms on a
   * sustained shift with provably minimal detection delay (its whole
   * design goal): c_k = max(0, c_{k−1} + x_k·10⁶ − ref − slack).
   *
   * Reference and thresholds are series-relative and exactly integer:
   * ref_micro = (Σx·10⁶) div n over the key's own time buckets,
   * slack = slackBp·ref div 10⁴, alarm when c_k > thresholdBp·ref div
   * 10⁴ (classic k = 0.5σ / h = 4σ tunings translate to basis points of
   * the mean here — σ would need a sqrt, which no engine replays
   * exactly). Per-step max(0, ·) floors are replayed by an ordered
   * recursive CTE.
   *
   * Non-negative inputs assumed (counts). Same scale shape as
   * [[ewmaTrend]]: per-(key, t) hash-agg, key-mean join, calendar-
   * bounded per-key array fold.
   *
   * Output: (key, t, x, ref_micro, cusum_micro, alarm∈{0,1}).
   */
  def cusum(df: DataFrame, keyCol: String, timeCol: String,
            valueCol: String, slackBp: Long, thresholdBp: Long): DataFrame = {
    require(slackBp >= 0 && thresholdBp > 0,
      s"need slackBp >= 0 and thresholdBp > 0, got $slackBp/$thresholdBp")
    val perT = df.groupBy(col(keyCol).as("key"),
        col(timeCol).cast("long").as("t"))
      .agg(sum(col(valueCol).cast("long")).as("x"))
    val ref = perT.groupBy("key")
      .agg(expr(graft.ops.Stats.microMeanSql("sum(x)", "count(1)")).as("ref_micro"))
    val accT = "struct<last:bigint,out:array<struct<t:bigint,x:bigint," +
               "cusum_micro:bigint>>>"
    perT.join(ref, "key")
      .groupBy("key", "ref_micro")
      .agg(array_sort(collect_list(struct(col("t"), col("x")))).as("steps"))
      .select(col("key"), col("ref_micro"), explode(aggregate(
        col("steps"),
        expr(s"cast(named_struct('last', 0L, 'out', array()) as $accT)"),
        (acc, s) => {
          val slack = expr(s"($slackBp * ref_micro) div 10000")
          val next = greatest(lit(0L),
            acc.getField("last") + s.getField("x") * 1000000L -
              col("ref_micro") - slack)
          struct(next.as("last"),
            concat(acc.getField("out"), array(struct(
              s.getField("t").as("t"), s.getField("x").as("x"),
              next.as("cusum_micro")))).as("out"))
        },
        acc => acc.getField("out"))).as("step"))
      .select(col("key"), col("step.t").as("t"), col("step.x").as("x"),
        col("ref_micro"),
        col("step.cusum_micro").as("cusum_micro"),
        (col("step.cusum_micro") >
          expr(s"($thresholdBp * ref_micro) div 10000")).cast("long").as("alarm"))
  }

  /**
   * Seasonal profile + residual — the de-seasonalizing first step every
   * calendar-rhythmed monitor needs: per (key, season = t mod period)
   * the exact integer-micro mean over the series' history, and each
   * point's residual against its own season. Weekly traffic has a
   * built-in dow rhythm that w10's trailing z-test and a30's CUSUM read
   * as perpetual drift; subtracting the season mean first is the
   * standard fix (period 7 for daily data with a weekly cycle).
   *
   * Exact arithmetic throughout: season_micro = ⌊10⁶·Σx / n⌋ (counts are
   * non-negative, floor division replays in any engine), residual in
   * micro units. One exchange on the key side: both season windows ride
   * the same (key, season) partitioning.
   *
   * Input: pre-aggregated (key, t, x) series points (the a30/a32 shape).
   * Output: (key, t, x, season, season_micro, resid_micro).
   */
  def seasonalProfile(df: DataFrame, keyCol: String, timeCol: String,
                      valCol: String, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val w = Window.partitionBy(col(keyCol), col("season"))
    df.select(col(keyCol), col(timeCol).cast("long").as("t"),
        col(valCol).cast("long").as("x"))
      .withColumn("season", pmod(col("t"), lit(period.toLong)))
      .withColumn("_sx", sum(col("x")).over(w))
      .withColumn("_n", count(lit(1)).over(w))
      // integer `div`, never Column./ (double division floors differently
      // at ulp boundaries than DuckDB's `//` on big sums)
      .withColumn("season_micro", expr("(1000000L * _sx) div _n"))
      .withColumn("resid_micro", col("x") * 1000000L - col("season_micro"))
      .drop("_sx", "_n")
  }

  /**
   * OHLC resample bars — the classic time-series downsample (tick →
   * candle; metric → hourly bar): per (key, bucket) the first value
   * (open), extremes (high/low), last value (close), row count (volume)
   * and an exact decimal sum. ONE hash aggregation, no window sort:
   * open/close ride `min_by`/`max_by` over a `(time, id)` struct, which
   * stays deterministic when timestamps collide (the id breaks the tie) —
   * the property a raw `first()` never has under parallel scan order.
   * High/low/open/close are pure selections (bit-exact doubles); the sum
   * accumulates in DECIMAL so it is order-independent.
   */
  def ohlcBars(df: DataFrame, keyCol: String, timeCol: String, idCol: String,
               valCol: String, bucketSize: Long): DataFrame = {
    require(bucketSize > 0)
    val t = col(timeCol)
    val ord = struct(t, col(idCol))
    df.groupBy(col(keyCol), expr(s"$timeCol div ${bucketSize}L").as("bucket"))
      .agg(
        min_by(col(valCol), ord).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), ord).as("close"),
        count(lit(1)).as("volume"),
        sum(col(valCol).cast("decimal(18,6)")).cast("double").as("vsum"))
  }
}
