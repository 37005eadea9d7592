package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import GraftSqlSurface.{longArg, plan, strArg, tableArg, tvf, tvfColsIn}

/**
 * Round-13 breadth of the SQL table-function surface: the as-of/interval
 * join family, the LSH/MinHash dedup family, sessionization, funnels,
 * percentile selection, time-series monitors, and the expectation gate —
 * so a SQL-only user reaches the SAME analyzed plans the registry rows
 * splice (never a reimplementation). Installed by
 * [[GraftSqlSurface.install]]; argument conventions follow the core
 * surface (tables and columns as string literals, numbers as integer
 * literals, thresholds in basis points, lists as CSV strings).
 */
object SqlSurfaceMacros {

  def install(ext: SparkSessionExtensions): Unit = {
    def tvfCols(name: String, usage: String, nCols: Int)
               (build: (org.apache.spark.sql.DataFrame, Seq[String]) => org.apache.spark.sql.DataFrame): Unit =
      tvfColsIn(ext)(name, usage, nCols)(build)

    // ---- as-of / nearest joins (j14/j18 plans) ---------------------------
    // output = left.* + the named right payload column (as-of: last right
    // row with rt <= lt per key; nearest: minimal |rt - lt|, plus `dt`)
    tvf(ext)("graft_asof_join",
      "graft_asof_join(left, right, leftKey, rightKey, leftTime, rightTime, payloadCol)",
      7 to 7) { args =>
      val fn = "graft_asof_join"
      val left = tableArg(fn, args(0), "left")
      val right = tableArg(fn, args(1), "right")
      val Seq(lk, rk, lt, rt, payload) = (2 to 6).map(i =>
        strArg(fn, args(i), s"column argument ${i - 1}"))
      plan(graft.ops.AsOf.asofBackward(left, right,
          col(lk), col(rk), col(lt), col(rt), Seq(payload -> col(payload)))
        .select(left.columns.map(col).toSeq :+
          col(s"__asof.$payload").as(payload): _*))
    }
    tvf(ext)("graft_asof_join_forward",
      "graft_asof_join_forward(left, right, leftKey, rightKey, leftTime, rightTime, payloadCol)",
      7 to 7) { args =>
      val fn = "graft_asof_join_forward"
      val left = tableArg(fn, args(0), "left")
      val right = tableArg(fn, args(1), "right")
      val Seq(lk, rk, lt, rt, payload) = (2 to 6).map(i =>
        strArg(fn, args(i), s"column argument ${i - 1}"))
      plan(graft.ops.AsOf.asofForward(left, right,
          col(lk), col(rk), col(lt), col(rt), Seq(payload -> col(payload)))
        .select(left.columns.map(col).toSeq :+
          col(s"__asof.$payload").as(payload): _*))
    }
    tvf(ext)("graft_nearest_event",
      "graft_nearest_event(left, right, leftKey, rightKey, leftTime, rightTime, payloadCol)",
      7 to 7) { args =>
      val fn = "graft_nearest_event"
      val left = tableArg(fn, args(0), "left")
      val right = tableArg(fn, args(1), "right")
      val Seq(lk, rk, lt, rt, payload) = (2 to 6).map(i =>
        strArg(fn, args(i), s"column argument ${i - 1}"))
      plan(graft.ops.AsOf.nearestJoin(left, right,
          col(lk), col(rk), col(lt), col(rt), Seq(payload -> col(payload)))
        .select(left.columns.map(col).toSeq ++
          Seq(col(s"__near.$payload").as(payload), col("__dt").as("dt")): _*))
    }

    // ---- interval algebra (j19/j22/j23/j25 plans) ------------------------
    tvfCols("graft_interval_merge",
      "graft_interval_merge(table, keyCol, startCol, endCol)", 3) { (df, c) =>
      graft.ops.AsOf.mergeIntervals(df, col(c(0)), col(c(1)), col(c(2))) }
    tvfCols("graft_interval_gaps",
      "graft_interval_gaps(table, keyCol, startCol, endCol)", 3) { (df, c) =>
      graft.ops.AsOf.intervalGaps(df, col(c(0)), col(c(1)), col(c(2))) }
    tvfCols("graft_interval_coverage",
      "graft_interval_coverage(table, keyCol, startCol, endCol)", 3) { (df, c) =>
      graft.ops.AsOf.intervalCoverage(df, col(c(0)), col(c(1)), col(c(2))) }
    tvf(ext)("graft_interval_overlap",
      "graft_interval_overlap(a, b, keyA, keyB, startA, endA, startB, endB, binSize, minOverlapBp)",
      10 to 10) { args =>
      val fn = "graft_interval_overlap"
      val a = tableArg(fn, args(0), "a")
      val b = tableArg(fn, args(1), "b")
      val Seq(ka, kb, sa, ea, sb, eb) = (2 to 7).map(i =>
        strArg(fn, args(i), s"column argument ${i - 1}"))
      plan(graft.ops.AsOf.intervalOverlapJoin(a, b, col(ka), col(kb),
        col(sa), col(ea), col(sb), col(eb),
        binSize = longArg(fn, args(8), "binSize"),
        minOverlapBp = longArg(fn, args(9), "minOverlapBp")))
    }

    // ---- LSH / MinHash dedup family (l5p/l113/l6p plans) -----------------
    // thresholds in basis points (5000 = Jaccard 0.5), like trimBp
    def pairsTvf(name: String,
                 build: (org.apache.spark.sql.DataFrame, String, String, Int, Int, Int)
                   => org.apache.spark.sql.DataFrame): Unit =
      tvf(ext)(name, s"$name(table, textCol, idCol, shingleSize, k, bands)",
        6 to 6) { args =>
        val df = tableArg(name, args(0), "table")
        val text = strArg(name, args(1), "textCol")
        val id = strArg(name, args(2), "idCol")
        plan(build(df, text, id,
          longArg(name, args(3), "shingleSize").toInt,
          longArg(name, args(4), "k").toInt,
          longArg(name, args(5), "bands").toInt))
      }
    pairsTvf("graft_minhash_pairs", (df, t, i, n, k, b) =>
      graft.llm.Dedup.minhashCandidatePairs(df, t, i, n, k, b))
    pairsTvf("graft_minhash_pairs_portable", (df, t, i, n, k, b) =>
      graft.llm.Dedup.minhashCandidatePairs(df, t, i, n, k, b,
        family = graft.llm.PortableFamily))
    pairsTvf("graft_oph_minhash_pairs", (df, t, i, n, k, b) =>
      graft.llm.Dedup.ophCandidatePairs(df, t, i, n, k, b,
        family = graft.llm.PortableFamily))
    def nearDupTvf(name: String, family: graft.llm.MinHashFamily): Unit =
      tvf(ext)(name,
        s"$name(table, textCol, idCol, thresholdBp, shingleSize, k, bands)",
        7 to 7) { args =>
        val df = tableArg(name, args(0), "table")
        val bp = longArg(name, args(3), "thresholdBp")
        require(bp >= 0 && bp <= 10000,
          s"$name: thresholdBp must be in [0, 10000], got $bp")
        plan(graft.llm.Dedup.nearDupPairs(df,
          strArg(name, args(1), "textCol"), strArg(name, args(2), "idCol"),
          threshold = bp / 10000.0,
          shingleSize = longArg(name, args(4), "shingleSize").toInt,
          k = longArg(name, args(5), "k").toInt,
          bands = longArg(name, args(6), "bands").toInt,
          family = family))
      }
    nearDupTvf("graft_near_dup_pairs", graft.llm.Xx64Family)
    nearDupTvf("graft_near_dup_pairs_portable", graft.llm.PortableFamily)

    // ---- sessionization / funnel (w3/w8 plans) ---------------------------
    tvf(ext)("graft_sessionize", "graft_sessionize(table, gapMs)", 2 to 2) { args =>
      val fn = "graft_sessionize"
      // validate the scalar argument BEFORE building the plan: a bad gapMs
      // must error as gapMs even when the table also lacks event columns
      val gapMs = longArg(fn, args(1), "gapMs")
      val events = graft.streaming.Streaming.asEvents(tableArg(fn, args(0), "table"))
      plan(graft.streaming.Streaming
        .sessionizeBatch(events, gapMs = gapMs)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events").cast("long").as("n_events"),
          col("value_sum")))
    }
    tvf(ext)("graft_funnel",
      "graft_funnel(table, userCol, tsCol, idCol, typeCol, stepsCsv)",
      6 to 6) { args =>
      val fn = "graft_funnel"
      val df = tableArg(fn, args(0), "table")
      val Seq(u, ts, id, tpe) = (1 to 4).map(i =>
        strArg(fn, args(i), s"column argument $i"))
      val steps = strArg(fn, args(5), "stepsCsv")
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(graft.ops.Funnel.funnelReport(df, u, ts, id, tpe, steps))
    }

    // ---- exact selection / monitors (a14/a28/a32/a36 plans) --------------
    tvf(ext)("graft_percentiles",
      "graft_percentiles(table, groupCol, valCol, spec 'name:p,...')",
      4 to 4) { args =>
      val fn = "graft_percentiles"
      val ps = strArg(fn, args(3), "spec").split(',').map(_.trim).map { s =>
        s.split(':') match {
          case Array(name, p) => (name, p.toDouble)
          case _ => throw new IllegalArgumentException(
            s"$fn: spec entries are 'name:p' (e.g. 'p50:0.5'), got '$s'")
        }
      }.toSeq
      require(ps.forall { case (_, p) => p >= 0 && p <= 1 },
        s"$fn: percentiles must be in [0, 1]")
      plan(graft.ops.HistogramSelect.percentilesByGroup(
        tableArg(fn, args(0), "table"), strArg(fn, args(1), "groupCol"),
        col(strArg(fn, args(2), "valCol")), ps))
    }
    tvfCols("graft_kaplan_meier",
      "graft_kaplan_meier(table, groupCol, timeCol, eventCol)", 3) { (df, c) =>
      graft.clinical.Survival.kaplanMeier(df, c(0), c(1), c(2)) }
    tvf(ext)("graft_autocorr",
      "graft_autocorr(table, keyCol, timeCol, valCol, lagsCsv)", 5 to 5) { args =>
      val fn = "graft_autocorr"
      val lags = strArg(fn, args(4), "lagsCsv").split(',').map(_.trim.toInt).toSeq
      plan(graft.ops.Stats.autocorr(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "keyCol"), strArg(fn, args(2), "timeCol"),
        strArg(fn, args(3), "valCol"), lags))
    }
    tvf(ext)("graft_seasonal_profile",
      "graft_seasonal_profile(table, keyCol, timeCol, valCol, period)",
      5 to 5) { args =>
      val fn = "graft_seasonal_profile"
      plan(graft.ops.Anomaly.seasonalProfile(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "keyCol"), strArg(fn, args(2), "timeCol"),
        strArg(fn, args(3), "valCol"),
        period = longArg(fn, args(4), "period").toInt))
    }

    // ---- round-13 additions: preference rank, diversity, range select ----
    tvf(ext)("graft_bradley_terry",
      "graft_bradley_terry(table, winnerCol, loserCol, nCol, rounds)",
      5 to 5) { args =>
      val fn = "graft_bradley_terry"
      plan(graft.llm.PreferenceRank.bradleyTerry(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "winnerCol"), strArg(fn, args(2), "loserCol"),
        strArg(fn, args(3), "nCol"),
        rounds = longArg(fn, args(4), "rounds").toInt))
    }
    tvf(ext)("graft_ngram_diversity",
      "graft_ngram_diversity(table, groupCol, textCol, n)", 4 to 4) { args =>
      val fn = "graft_ngram_diversity"
      plan(graft.llm.Diversity.ngramDiversity(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "groupCol"), strArg(fn, args(2), "textCol"),
        n = longArg(fn, args(3), "n").toInt))
    }
    tvf(ext)("graft_percentiles_rangepart",
      "graft_percentiles_rangepart(table, groupCol, valCol, spec 'name:p,...', nRanges)",
      5 to 5) { args =>
      val fn = "graft_percentiles_rangepart"
      val ps = strArg(fn, args(3), "spec").split(',').map(_.trim).map { s =>
        s.split(':') match {
          case Array(name, p) => (name, p.toDouble)
          case _ => throw new IllegalArgumentException(
            s"$fn: spec entries are 'name:p' (e.g. 'p50:0.5'), got '$s'")
        }
      }.toSeq
      plan(graft.ops.RangeSelect.exactPercentilesByGroup(
        tableArg(fn, args(0), "table"), strArg(fn, args(1), "groupCol"),
        col(strArg(fn, args(2), "valCol")), ps,
        nRanges = longArg(fn, args(4), "nRanges").toInt))
    }

    // ---- round-14 additions: annotation QC (l131/l132/l133 plans) --------
    tvf(ext)("graft_cohen_kappa",
      "graft_cohen_kappa(table, itemCol, annotatorCol, labelCol)",
      4 to 4) { args =>
      val fn = "graft_cohen_kappa"
      plan(graft.llm.Annotation.cohenKappaPairs(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "itemCol"), strArg(fn, args(2), "annotatorCol"),
        strArg(fn, args(3), "labelCol")))
    }
    tvf(ext)("graft_resolve_labels",
      "graft_resolve_labels(table, itemCol, annotatorCol, labelCol)",
      4 to 4) { args =>
      val fn = "graft_resolve_labels"
      plan(graft.llm.Annotation.resolveLabels(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "itemCol"), strArg(fn, args(2), "annotatorCol"),
        strArg(fn, args(3), "labelCol")))
    }
    tvf(ext)("graft_length_bias",
      "graft_length_bias(table, chosenLenCol, rejectedLenCol)",
      3 to 3) { args =>
      val fn = "graft_length_bias"
      plan(graft.llm.Annotation.lengthBiasAudit(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "chosenLenCol"), strArg(fn, args(2), "rejectedLenCol")))
    }

    // ---- expectation gate (c24 plan) -------------------------------------
    // rulesSpec: ';'-separated `id:kind:col[:extra]` —
    //   not_null | unique | in_range:lo,hi | matches:regex | in_set:a|b|c
    // (the regex tail is NOT re-split on ':', so patterns may contain it)
    tvf(ext)("graft_expectation_gate",
      "graft_expectation_gate(table, rulesSpec 'id:kind:col[:extra];...')",
      2 to 2) { args =>
      val fn = "graft_expectation_gate"
      import graft.ops.Expectations._
      val rules = strArg(fn, args(1), "rulesSpec").split(';').map(_.trim)
        .filter(_.nonEmpty).map { r =>
          r.split(":", 4) match {
            case Array(id, "not_null", c) => ExpectNotNull(id, c)
            case Array(id, "unique", c) => ExpectUnique(id, c)
            case Array(id, "in_range", c, range) => range.split(',') match {
              case Array(lo, hi) => ExpectInRange(id, c, lo.trim.toLong, hi.trim.toLong)
              case _ => throw new IllegalArgumentException(
                s"$fn: in_range needs 'lo,hi', got '$range'")
            }
            case Array(id, "matches", c, pattern) => ExpectMatches(id, c, pattern)
            case Array(id, "in_set", c, set) =>
              ExpectInSet(id, c, set.split('|').map(_.trim).toSeq)
            case _ => throw new IllegalArgumentException(
              s"$fn: rule '$r' is not id:kind:col[:extra] with kind in " +
                "{not_null, unique, in_range, matches, in_set}")
          }
        }.toSeq
      plan(gate(tableArg(fn, args(0), "table"), rules))
    }
  }
}
