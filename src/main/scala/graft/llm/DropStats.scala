package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/**
 * Over-cap bucket drop telemetry for the LSH/SimHash/ANN bucketing family.
 *
 * Why core accumulators and not `df.observe`: on Spark 4.1.2 with AQE
 * enabled, a `CollectMetrics` node that lands in a NON-final query stage
 * (which is where the bucket aggregation always sits — pair explosion and
 * `distinct()` add at least one more shuffle above it) reports no metrics:
 * the final adaptive plan re-instantiates the node and its fresh accumulator
 * is the one harvested, so `Observation.get` yields an empty row. Verified
 * empirically (AQE on → empty; AQE off → correct counts). Core
 * `LongAccumulator`s are merged on task completion regardless of stage
 * position, so they survive AQE re-planning; the same values surface in the
 * Spark UI / listener bus on a real cluster.
 *
 * Caveats (acceptable for telemetry): stage retries can over-count; EVERY
 * action that re-executes the bucket stage adds again (two actions on the
 * same uncached frame double the counts — call [[DropStats.reset]] between
 * actions, or read after exactly one); and the counters only populate once
 * an action has executed the bucket stage.
 *
 * RULE: these counts are telemetry ONLY — never gate pipeline control flow,
 * correctness checks, or retries on them. Any `dropStats` parameter in
 * [[Dedup]]/[[Ann]] carries this same contract: the caps themselves (not
 * the counters) are the correctness mechanism.
 */
final class DropStats private (
    val droppedBuckets: LongAccumulator,
    val droppedRows: LongAccumulator) extends Serializable {
  /** Number of buckets discarded for exceeding the cap. */
  def buckets: Long = droppedBuckets.value
  /** Total members across all discarded buckets. */
  def rows: Long = droppedRows.value
  def reset(): Unit = { droppedBuckets.reset(); droppedRows.reset() }
}

object DropStats {
  def apply(spark: SparkSession, name: String): DropStats =
    new DropStats(
      spark.sparkContext.longAccumulator(s"$name.dropped_buckets"),
      spark.sparkContext.longAccumulator(s"$name.dropped_rows"))
}
