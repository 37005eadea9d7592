package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One registered operator query: a Spark plan over the driver's testdata
 * tables plus (where SQL-expressible) an equivalent DuckDB oracle over the
 * same parquet files. Column names/types must match the oracle exactly —
 * the driver sorts columns by name and hashes values.
 *
 * Hash-stability rules used throughout (Spark vs DuckDB):
 *  - computed integers → cast to BIGINT/long on BOTH sides (DuckDB widens
 *    COUNT to BIGINT, SUM(int) to HUGEINT);
 *  - SUM over doubles → sum in DECIMAL(18,6) then cast to DOUBLE on both
 *    sides (exact decimal arithmetic ⇒ bit-identical doubles; raw double
 *    sums are order-dependent under parallelism);
 *  - timestamps → cast to DATE or group on extracted parts (events.ts is
 *    ns-precision; Spark truncates to µs);
 *  - pass-through doubles and MIN/MAX are exact selections → safe raw.
 */
/**
 * @param eager true when `fn` runs work at DataFrame-CONSTRUCTION time
 *              (fixture writes, driver-side source fetches, bounded
 *              collects, trainer loops) rather than returning a pure lazy
 *              plan. Plan-only tooling (PlanAuditSpec) skips eager queries —
 *              calling their `fn` would execute jobs and mutate fixture
 *              dirs, not just build a plan.
 * @param twin  for a no-oracle row (an xxhash64-family scale path whose
 *              hash function DuckDB cannot replay): the name of the
 *              registered row that runs the IDENTICAL pipeline with a
 *              portable (md5-derived) hash family and IS oracled — the
 *              machine-readable adjudication the round artifact carries in
 *              `TWINS.json` (round 10; previously this mapping lived only
 *              in COVERAGE.md prose). RegistrySpec enforces every twin
 *              target exists and has an oracle.
 */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    eager: Boolean = false,
    twin: Option[String] = None)

object Registry {

  /** Read one driver testdata table. NOT scan-widened: a blanket
    * [[graft.ops.ScanPar.widen]] here was measured round 14 — it helps
    * expression-dense consumers but regresses plain scan→aggregate queries
    * 2–4× (the round-robin exchange ships full raw rows where the scan
    * stage's partial aggregation used to ship sketch-sized partials).
    * Widening is opt-in per consumer: [[tdw]] for expression-dense query
    * pipelines, operator-internal widen at the corpus-text seams. */
  def td(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** [[td]] + [[graft.ops.ScanPar.widen]] — for queries whose per-row
    * compute above the scan (string building, regexp, hashing, decode)
    * dominates the cost of one small-table round-robin exchange. No-op on
    * production-sized layouts (see ScanPar). */
  def tdw(s: SparkSession, dir: String, name: String): DataFrame =
    graft.ops.ScanPar.widen(td(s, dir, name))

  /**
   * The events table with `ts` canonicalized to an epoch-microseconds
   * BIGINT column `ts_us`, regardless of the parquet physical type. The
   * driver has shipped events.ts both as timestamp[ns] (which Spark reads
   * as a ns-precision LONG under `spark.sql.legacy.parquet.nanosAsLong`)
   * and as timestamp[us] (read as TIMESTAMP_NTZ; cast to TIMESTAMP is an
   * identity instant under the UTC session zone). Every ts-consuming query
   * goes through this accessor so a regeneration in either direction
   * cannot break analysis again. `div` (integral), not `/1000` + cast: ns
   * epochs overflow double's exact-integer range.
   */
  def tdEventsUs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.LongType
    val e = td(s, dir, "events")
    val tsUs = e.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts").cast("timestamp"))
    }
    e.withColumn("ts_us", tsUs)
  }

  /** All registered queries, in SURVEY §2 inventory order. */
  def all: Seq[(String, Q)] =
    ProjectionQueries.all ++ JoinQueries.all ++ AggQueries.all ++
      WindowSortSetQueries.all ++ ScalarFnQueries.all ++
      DedupQueries.all ++ AnnQueries.all ++ MediaQueries.all ++
      TokenizerQueries.all ++ TextQueries.all ++ TextRetrievalQueries.all ++
      CurationQueries.all ++ TextEvalQueries.all ++ PostTrainQueries.all ++
      IoQueries.all ++ LakeQueries.all ++ CompositeQueries.all ++
      ClinicalQueries.all ++ WarehouseQueries.all ++ ApiQueries.all ++ StreamingQueries.all ++
      PipelineQueries.all ++ ScaleQueries.all ++
      StatQueries.all ++ RobustStatQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }.toMap

  lazy val oracleSql: Map[String, String] =
    all.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap

  /** no-oracle row → its oracled portable twin (see [[Q.twin]]). */
  lazy val twins: Map[String, String] =
    all.collect { case (n, q) if q.twin.isDefined => n -> q.twin.get }.toMap
}
