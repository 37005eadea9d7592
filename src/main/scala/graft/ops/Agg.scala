package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Aggregation macros for the reference's most-repeated SQL idioms, as pure
 * `Column`/`DataFrame` functions (codegen-friendly, no UDFs).
 *
 * References:
 *  - STRING_AGG(x, ';' ORDER BY x) / STRING_AGG(DISTINCT …):
 *    BQ_Table_Building/CDA/GDC/create_tables_file_metadata_gdc.py:146-211
 *  - ARRAY_TO_STRING(ARRAY_AGG(x), ';'): PDC/build_pdc_file_metadata.py:168
 *  - conditional null census: CDA/GDC/create_tables_clinical_gdc.py:155-212
 *  - null census via TO_JSON_STRING:
 *    Clinical_From_File/build_gdc_file_clinical_tables_TCGA.py:274-295
 *  - grouped distinct-of-struct: build_gdc_file_clinical_tables_TCGA.py:620-625
 */
object Agg {

  /**
   * `STRING_AGG(c, sep ORDER BY c)`. Spark has no ordered string_agg, so the
   * explicit form is collect → sort → join; ordering is by the aggregated
   * value itself, which covers every call site in the reference (SURVEY §2.4
   * A4 note). Numeric inputs are sorted numerically BEFORE stringification.
   */
  def stringAggOrdered(c: Column, sep: String): Column =
    array_join(transform(array_sort(collect_list(c)), _.cast("string")), sep)

  /** `STRING_AGG(DISTINCT c, sep ORDER BY c)`. */
  def stringAggDistinctOrdered(c: Column, sep: String): Column =
    array_join(transform(array_sort(collect_set(c)), _.cast("string")), sep)

  /**
   * `STRING_AGG(value, sep ORDER BY key)` — ordered by a DIFFERENT key than
   * the aggregated value (the general case SURVEY §2.9 notes the plain
   * sort-value trick cannot express): collect (key, value) structs, sort by
   * the struct (key leads), project values. Ties on key break by value,
   * matching a deterministic ORDER BY key, value.
   */
  def stringAggOrderedBy(value: Column, key: Column, sep: String): Column =
    array_join(
      transform(array_sort(collect_list(struct(key.as("k"), value.as("v")))),
        s => s.getField("v").cast("string")),
      sep)

  /** `ARRAY_TO_STRING(ARRAY_AGG(c), sep)` — unordered input order is
    * nondeterministic under parallelism, so we sort for stable output. */
  def arrayAggToString(c: Column, sep: String): Column =
    stringAggOrdered(c, sep)

  /** `SUM(CASE WHEN c IS NULL THEN 0 ELSE 1 END)` — per-column non-null
    * count (create_tables_clinical_gdc.py:164). */
  def nonNullCount(c: Column): Column =
    sum(when(c.isNull, 0).otherwise(1)).cast("long")

  /**
   * A10: per-column null counts via the TO_JSON_STRING trick
   * (build_gdc_file_clinical_tables_TCGA.py:274-295):
   * `UNNEST(REGEXP_EXTRACT_ALL(TO_JSON_STRING(t), '"(\w+)":null'))` →
   * GROUP BY → COUNT. Columns with zero nulls do not appear (same as the
   * reference). Expression-only: stays in whole-stage codegen.
   */
  def nullCensusJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .select(explode(regexp_extract_all(col("j"), lit("\"([^\"]+)\":null"), lit(1))).as("column_name"))
      .groupBy("column_name")
      .agg(count(lit(1)).as("null_count"))

  /**
   * A9: grouped distinct-of-struct — `GROUP BY TO_JSON_STRING(struct)` +
   * ANY_VALUE (build_gdc_file_clinical_tables_TCGA.py:620-625). Equivalent
   * to DISTINCT over the columns, but exercised through the reference's
   * group-on-serialized-struct shape.
   */
  def distinctOfStruct(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(to_json(struct(cols.map(col).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "false")).as("_k"))
      .agg(first(col(cols.head)).as(cols.head),
        cols.tail.map(c => first(col(c)).as(c)): _*)
      .drop("_k")
      .select(cols.map(col).toIndexedSeq: _*)
}
