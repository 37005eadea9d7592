package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class RetentionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val DAY = 86400000000L

  test("cohort triangle: offsets relative to first day, distinct users per cell") {
    val events = Seq(
      // user 1: first day 0, active days 0,1,2 (two events on day 1 count once)
      (1L, 0L), (1L, DAY + 5L), (1L, DAY + 99L), (1L, 2 * DAY),
      // user 2: same cohort (day 0), only day 0
      (2L, 500L),
      // user 3: cohort day 1, active days 1 and 3 -> offsets 0 and 2
      (3L, DAY + 1L), (3L, 3 * DAY + 7L)
    ).toDF("user_id", "ts_us")
    val got = Retention.cohortRetention(events, "user_id", "ts_us")
      .select("cohort_day", "day_offset", "n_active", "n_cohort", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),   // both day-0 users active on their day 0
      (0L, 1L) -> ((1L, 2L, 0.5)),   // only user 1 returns next day
      (0L, 2L) -> ((1L, 2L, 0.5)),
      (1L, 0L) -> ((1L, 1L, 1.0)),
      (1L, 2L) -> ((1L, 1L, 1.0))))
  }

  test("pre-epoch timestamps floor to the earlier day (no toward-zero truncation)") {
    val events = Seq((1L, -1L), (1L, 1L)).toDF("user_id", "ts_us")
    val got = Retention.cohortRetention(events, "user_id", "ts_us")
      .select("cohort_day", "day_offset").as[(Long, Long)].collect().toSet
    // -1 µs is day -1; +1 µs is day 0 -> cohort -1 with offsets 0 and 1
    assert(got == Set((-1L, 0L), (-1L, 1L)))
  }
}
