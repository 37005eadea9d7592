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
 */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    eager: Boolean = false)

object Registry {

  /** Read one driver testdata table. */
  def td(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** All registered queries, in SURVEY §2 inventory order. */
  def all: Seq[(String, Q)] =
    ProjectionQueries.all ++ JoinQueries.all ++ AggQueries.all ++
      WindowSortSetQueries.all ++ ScalarFnQueries.all ++
      DedupQueries.all ++ AnnQueries.all ++ TextQueries.all ++
      IoQueries.all ++ CompositeQueries.all ++
      ClinicalQueries.all ++ ApiQueries.all ++ StreamingQueries.all ++
      PipelineQueries.all ++ ScaleQueries.all ++ StatQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }.toMap

  lazy val oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql), _)) => n -> sql }.toMap
}
