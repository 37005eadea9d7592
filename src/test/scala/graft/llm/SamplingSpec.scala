package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("deterministic: identical keep-set across runs; different seeds differ") {
    val a = Sampling.deterministicSample(events, "event_id", 30).select("event_id")
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(events, "event_id", 30).select("event_id")
      .as[Long].collect().toSet
    assert(a === b)
    val c = Sampling.deterministicSample(events, "event_id", 30, seed = "other")
      .select("event_id").as[Long].collect().toSet
    assert(a !== c)
    // nesting property: the 10% sample is a subset of the 30% sample
    // (same seed — rates only move the threshold)
    val d = Sampling.deterministicSample(events, "event_id", 10).select("event_id")
      .as[Long].collect().toSet
    assert(d.subsetOf(a))
  }

  test("rates land near nominal; absent strata drop entirely") {
    val totals = events.groupBy("event_type").count().as[(String, Long)].collect().toMap
    val out = Sampling.stratifiedSample(events, "event_id", "event_type",
      rates = Map("click" -> 25, "purchase" -> 100))
    val byType = out.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(!byType.contains("view") && !byType.contains("signup") && !byType.contains("error"))
    // rate 100 keeps EVERY row of the stratum — exact, not statistical
    assert(byType("purchase") === totals("purchase"))
    val n = totals("click").toDouble
    assert(math.abs(byType("click") - n * 0.25) <= n * 0.15)
  }

  test("the sample filter reaches the scan stage (no shuffle, no RNG node)") {
    val plan = Sampling.deterministicSample(events, "event_id", 30)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    assert(!plan.contains("Sample"), plan.take(500)) // not RNG-based df.sample
  }
}
