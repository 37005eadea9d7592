package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention matrix over an event stream: users grouped by their
 * first-activity day (the cohort), each later active day counted as that
 * cohort's day-N retention — the standard product-analytics triangle
 * table, and the engagement-drift diagnostic for event-log training data.
 *
 * Shape: (user, day) distinct → per-user min-day hash-agg → one equi-join
 * back on user → (cohort, offset) hash-agg → join with the tiny cohort
 * size table (broadcastable: one row per cohort day). Both shuffles key
 * on user_id; day arithmetic is all integer (µs epoch FLOOR-divided —
 * DuckDB's `//` floors, so negative pre-epoch timestamps stay aligned).
 */
object Retention {

  def cohortRetention(events: DataFrame, userCol: String, tsUsCol: String): DataFrame = {
    val dayFloor = expr(s"$tsUsCol div 86400000000") -
      when(expr(s"$tsUsCol % 86400000000") < 0, 1L).otherwise(0L)
    val ud = events.select(col(userCol).as("user"), dayFloor.cast("long").as("day"))
      .distinct()
    val first = ud.groupBy("user").agg(min("day").as("cohort_day"))
    val cohortSize = first.groupBy("cohort_day")
      .agg(count(lit(1)).cast("long").as("n_cohort"))
    ud.join(first, "user")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user")).cast("long").as("n_active"))
      .join(cohortSize, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
  }
}
