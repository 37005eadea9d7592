package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed-table layout: the shuffle-amortization primitive for 100 TB
 * fact tables (Spark's `bucketBy`, the engine-level analogue of the
 * reference's clustered BigQuery tables — e.g. the CLUSTER BY layouts in
 * BQ_Table_Building/generic_schemas and the per-sample-file join plans
 * that re-join the same file/case keys build after build).
 *
 * Why it matters at scale: a fact table that is joined or aggregated on
 * the same key every day pays the hash-repartition shuffle of that key on
 * EVERY query — at 100 TB that is the dominant cost of the whole plan.
 * Writing the table bucketed by the key pays that shuffle ONCE at write
 * time; every later sort-merge join or aggregation on the key reads the
 * buckets co-located and plans ZERO Exchange (BucketingSpec asserts the
 * executed plans; the registered s27 query is the end-to-end proof).
 *
 * Mechanics pinned down here:
 *  - bucket id = `pmod(murmur3(key), numBuckets)` — the SAME function
 *    `repartition(numBuckets, col(key))` uses, so pre-partitioning before
 *    the write lands each bucket's rows in exactly one task → exactly ONE
 *    file per bucket (asserted). Note Spark ≥3.0 still re-sorts bucket
 *    scans (it no longer trusts `sortBy` order by default — multiple
 *    files per bucket would break it; deployments with the one-file
 *    guarantee can opt back in via
 *    `spark.sql.legacy.bucketedTableScan.outputOrdering`); the Exchange
 *    elimination — the scale win — holds regardless.
 *  - both join sides must agree on numBuckets; reader-side Spark only
 *    avoids the exchange when the join keys equal the bucket columns.
 *  - the join is hinted `merge`: with small test tables Spark would
 *    otherwise pick a broadcast join (which ignores bucketing and hides
 *    the plan shape this layout exists to produce); at warehouse scale
 *    SMJ is what the optimizer picks anyway.
 */
object Bucketing {

  /**
   * Write `df` as a parquet-backed catalog table bucketed (and sorted)
   * by `key` into exactly `numBuckets` files at `path`. Overwrites any
   * previous table of the same name.
   */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(numBuckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Inner-join two bucketed catalog tables on `leftKey === rightKey` as a
   * sort-merge join. When both tables are bucketed on their join key with
   * the same bucket count, the planned SMJ has NO Exchange on either side
   * (and with one sorted file per bucket, no Sort either).
   */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                   rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable).hint("merge")
    l.join(r, col(leftKey) === col(rightKey))
  }
}
