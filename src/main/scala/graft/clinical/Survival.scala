package graft.clinical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Kaplan-Meier survival estimation — the clinical-outcomes operator the
 * reference's case pipelines feed (clinical tables carry
 * `days_to_death` / `vital_status` shapes per case; see reference
 * clinical field groups, e.g. NextGenETL's GDC clinical builds). The
 * estimator itself is the public product-limit formula (Kaplan & Meier
 * 1958): at each distinct event time t_k with n_k subjects still at risk
 * and d_k events, S(t_k) = Π_{j≤k} (n_j − d_j) / n_j; censored subjects
 * leave the risk set without stepping the curve.
 *
 * Exactness contract: the curve is computed in integer MICRO-UNITS with
 * a per-step floor — S_0 = 1,000,000 and
 * S_k = floor(S_{k−1} · (n_k − d_k) / n_k) — so every engine that
 * replays the same recursion over the same ordered steps produces
 * bit-identical BIGINTs (a DuckDB recursive CTE with `//` is the oracle
 * twin). Raw double products are order-sensitive and engine-divergent;
 * exp(Σ ln) is worse. Long-range check: S ≤ 10⁶ and n_k ≤ ~10¹² keeps
 * S·(n−d) < 10¹⁸ — no overflow for any realistic cohort.
 *
 * Scale shape: one hash-aggregate on (group, time) — map-side partials,
 * corpus-linear — then two window passes over the PER-TIME table (whose
 * size is bounded by |groups| × |distinct times|, i.e. the calendar
 * resolution, NOT subject count), then a per-group sorted fold done as
 * an `aggregate` HOF over a collected struct array. The fold state is
 * one long; the array is the group's event-time steps — curves are
 * small by nature (a 30-year daily follow-up is ~11 k steps), so the
 * per-group array is bounded and never corpus-proportional. No driver
 * collect anywhere.
 */
object Survival {

  /** Exact floor-division of nonneg longs as a Column: (a − a mod b) / b.
    * The subtraction makes the numerator exactly divisible, so the double
    * division is exact (quotient ≤ 2^53) — unlike `floor(a / b)`, which
    * trusts a correctly-rounded but inexact quotient. */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /**
   * Per-group Kaplan-Meier curve.
   *
   * @param df       one row per subject
   * @param groupCol stratum (trial arm, cohort) — curve per group
   * @param timeCol  follow-up duration (integer-valued; cast to long)
   * @param eventCol 1 = event observed at `time`, 0 = censored at `time`
   * @return (grp, t, n_risk, d_events, surv_micro) — one row per distinct
   *         EVENT time per group, surv_micro the product-limit estimate
   *         in millionths after the step at t
   */
  def kaplanMeier(df: DataFrame, groupCol: String, timeCol: String,
                  eventCol: String): DataFrame = {
    val perTime = df
      .filter(col(timeCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(timeCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("d"),
           count(lit(1)).as("c"))
    // risk set at t = subjects whose follow-up reaches t: group total minus
    // everyone who exited strictly before t. Computed over ALL times
    // (censor-only rows shrink later risk sets) BEFORE filtering to event
    // times (the only rows where the curve steps).
    val wGrp  = Window.partitionBy("grp")
    val wPrev = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = perTime
      .withColumn("n_risk",
        sum("c").over(wGrp) - coalesce(sum("c").over(wPrev), lit(0L)))
      .filter(col("d") > 0)

    val stepT = "array<struct<t:bigint,n_risk:bigint,d:bigint>>"
    val accT  = "struct<last:bigint,out:array<struct<t:bigint,n_risk:bigint," +
                "d_events:bigint,surv_micro:bigint>>>"
    val folded = risk
      .groupBy("grp")
      .agg(array_sort(collect_list(struct(col("t"), col("n_risk"), col("d"))))
        .cast(stepT).as("steps"))
      .select(col("grp"), explode(aggregate(
        col("steps"),
        expr(s"cast(named_struct('last', 1000000L, 'out', array()) as $accT)"),
        (acc, s) => {
          val surv = floorDiv(
            acc.getField("last") * (s.getField("n_risk") - s.getField("d")),
            s.getField("n_risk"))
          struct(
            surv.as("last"),
            concat(acc.getField("out"), array(struct(
              s.getField("t").as("t"),
              s.getField("n_risk").as("n_risk"),
              s.getField("d").as("d_events"),
              surv.as("surv_micro")))).as("out"))
        },
        acc => acc.getField("out"))).as("step"))
    folded.select(col("grp"),
      col("step.t").as("t"),
      col("step.n_risk").as("n_risk"),
      col("step.d_events").as("d_events"),
      col("step.surv_micro").as("surv_micro"))
  }

  /**
   * Log-rank test (Mantel 1966; Peto & Peto 1972) — the hypothesis test
   * that goes with [[kaplanMeier]]: does arm `armA`'s survival differ
   * from everyone else's? At each event time t_k with n_k at risk
   * (n1_k in arm A), d_k events (d1_k in arm A), the arm-A expectation
   * under H₀ is d_k·n1_k/n_k and the hypergeometric variance is
   * d_k·(n_k−d_k)·n1_k·(n_k−n1_k) / (n_k²·(n_k−1)); the statistic is
   * (O₁−E₁)²/V ~ χ²(1).
   *
   * Exactness contract: every per-time term is a floor-divided integer in
   * MICRO-UNITS — e_k = (d·n1·10⁶) div n (fits a long),
   * v_k = (d·(n−d)·n1·(n−n1)·10⁶) div (n²·(n−1)) computed in
   * DECIMAL(38,0) (the intermediate reaches ~10²¹; DuckDB replays it in
   * HUGEINT with `//`), v_k ≡ 0 at n ≤ 1 on both engines. Sums of exact
   * longs are order-free, so unlike the KM curve NO sequential recursion
   * is needed: one hash-agg + one calendar-bounded window + one final
   * agg — fully distributed.
   *
   * Output (single row): o1, e1_micro, v_micro, chi2_micro, n_times.
   */
  def logRank(df: DataFrame, groupCol: String, timeCol: String,
              eventCol: String, armA: String): DataFrame = {
    val a1 = (col(groupCol) === armA).cast("long")
    val perTime = df
      .filter(col(timeCol).isNotNull)
      .groupBy(col(timeCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("d"),
           count(lit(1)).as("c"),
           sum(col(eventCol).cast("long") * a1).as("d1"),
           sum(a1).as("c1"))
    val wAll  = Window.partitionBy(lit(1))
    val wPrev = Window.partitionBy(lit(1)).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = perTime
      .withColumn("n",
        sum("c").over(wAll) - coalesce(sum("c").over(wPrev), lit(0L)))
      .withColumn("n1",
        sum("c1").over(wAll) - coalesce(sum("c1").over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .select(
        col("d1"),
        expr(
          // DECIMAL product (the v_micro pattern): d·n1·10⁶ passes 2⁶³
          // once at-risk counts reach ~10⁹ rows — same value, no overflow
          "(CAST(d AS DECIMAL(19,0)) * n1 * 1000000) div n").as("e_micro"),
        when(col("n") > 1, expr(
          """(CAST(d AS DECIMAL(19,0)) * (n - d) * n1 * (n - n1) * 1000000)
            | div (CAST(n AS DECIMAL(19,0)) * n * (n - 1))""".stripMargin))
          .otherwise(lit(0L)).as("v_micro"))
    terms.agg(
        sum("d1").cast("long").as("o1"),
        sum("e_micro").cast("long").as("e1_micro"),
        sum("v_micro").cast("long").as("v_micro"),
        count(lit(1)).as("n_times"))
      .select(col("o1"), col("e1_micro"), col("v_micro"),
        when(col("v_micro") > 0, expr(
          """CAST(o1 * 1000000L - e1_micro AS DECIMAL(19,0))
            | * (o1 * 1000000L - e1_micro) div v_micro""".stripMargin))
          .otherwise(lit(0L)).as("chi2_micro"),
        col("n_times"))
  }
}
