package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.types.{BqType, TypeInference}

/**
 * S2 — distributed, sampled schema inference with the reference's value-type
 * semantics: classify each sampled cell with `checkValueType`, union the
 * per-column type sets, resolve with the coercion lattice.
 *
 * Reference: cda_bq_etl/data_helpers.py:220-277
 * (`aggregate_column_data_types_tsv`, with `sample_interval` row skipping),
 * :280-295 (`resolve_column_types`), bq_helpers/schema.py:34-82.
 *
 * Scale design: per-partition type sets are folded with `mapPartitions`-style
 * aggregation (`treeAggregate` on the RDD) — each task returns at most
 * (columns × 11 types), so the driver merge is O(cols), never O(rows). No
 * UDF, no collect of data rows.
 */
object SchemaInfer {

  /**
   * Infer per-column BQ types from an all-string DataFrame, sampling
   * `sampleFraction` of rows (reference `sample_interval` ≈ 1/fraction).
   *
   * One pass: every column aggregated with the native [[graft.types.TypeSetAgg]]
   * Catalyst aggregate (map-side partial type sets, O(cols) result row) —
   * no RDD fold, no driver data collection.
   */
  def inferColumnTypes(df: DataFrame, sampleFraction: Double = 1.0): Map[String, BqType] = {
    val spark = df.sparkSession
    val cols = df.columns
    val sampled = if (sampleFraction >= 1.0) df else df.sample(withReplacement = false, sampleFraction, seed = 42L)
    val aggs = cols.map(c => graft.types.TypeSetAgg.typeSet(spark, c).as(c))
    val row = sampled.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) =>
      val ts = row.getSeq[String](i).map(BqType.fromName).toSet
      c -> TypeInference.resolveTypeConflict(c, ts)
    }.toMap
  }

  /** Inferred `StructType` in the source column order (schema.py:34-82). */
  def inferSchema(df: DataFrame, sampleFraction: Double = 1.0): StructType = {
    val types = inferColumnTypes(df, sampleFraction)
    StructType(df.columns.map(c => StructField(c, BqType.toSpark(types(c)), nullable = true)))
  }

  /**
   * Two-phase infer → load (schema.py lifecycle): infer on the normalized
   * string frame, then re-read the same TSV with the typed schema.
   */
  def inferAndLoadTsv(spark: SparkSession, path: String,
                      sampleFraction: Double = 1.0): DataFrame = {
    val strings = Io.readTsv(spark, path)
    val schema = inferSchema(strings, sampleFraction)
    // Cast the normalized string frame (normalization must win over the csv
    // parser's raw view of cells, e.g. "100.0" → 100 for an INT64 column).
    import org.apache.spark.sql.functions.col
    strings.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  /** Round-trip a StructType through its JSON form (schema persistence). */
  def schemaToJson(s: StructType): String = s.json
  def schemaFromJson(j: String): StructType = DataType.fromJson(j).asInstanceOf[StructType]
}
