package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass table profiler — the reference's QC distinct/null metrics
 * (common_etl/support.py:2219-2228; compare_and_publish_tables.py per-column
 * counts) as a single aggregate: per column, (non-null count, distinct
 * count, min, max) in long form. One shuffle-free partial-agg pass over the
 * table; output is O(cols).
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    def metrics(c: String): Seq[Column] = Seq(
      count(col(c)).cast("long").as(s"${c}__nonnull"),
      countDistinct(col(c)).cast("long").as(s"${c}__distinct"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))
    val aggs = cols.flatMap(metrics) :+ count(lit(1)).cast("long").as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // long form: one output row per column
    val branches = cols.map { c =>
      struct(lit(c).as("column_name"),
        col(s"${c}__nonnull").as("nonnull_count"),
        col(s"${c}__distinct").as("distinct_count"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col("__total").as("total_count"))
    }
    row.select(explode(array(branches: _*)).as("p")).select("p.*")
  }
}
