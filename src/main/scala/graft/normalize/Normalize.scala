package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Value / name normalization with the reference's semantics, expressed as
 * Spark `Column` functions (codegen'd — no UDFs in the hot path) plus pure
 * Scala twins for driver-side use and tests.
 *
 * Reference: cda_bq_etl/data_helpers.py:447-486 (`normalize_value`),
 * cda_bq_etl/utils.py:140-168 (`make_string_bq_friendly`,
 * `sanitize_file_prefix`), CDA/GDC/create_tables_file_metadata_gdc.py:44-75
 * (`convert_concat_to_multi`).
 */
object Normalize {

  /** Null-marker spellings (lowercased) — data_helpers.py:470-471. */
  val NullMarkers: Seq[String] = Seq(
    "na", "n/a", "none", "", "--", "-", "null", "not reported", "unknown",
    "[not available]", "[not applicable]", "[unknown]", ".")

  /** MAX_CONCAT_COUNT — values-per-concat threshold before 'multi' collapse. */
  val MaxConcatCount = 8

  // Digit count bounded to 18 so `cast("long")` can never overflow (Spark 4
  // ANSI mode would throw CAST_OVERFLOW; non-ANSI would silently NULL).
  // Longer digit strings fall through to the verbatim `otherwise` branch —
  // a documented divergence from the reference's arbitrary-precision int().
  private val intRe   = "^[+-]?[0-9]{1,18}$"
  // trivial float: digits '.' zero-or-more zeros (e.g. "100.0", "-10001.00")
  private val trivialFloatRe = "^[+-]?[0-9]{1,18}\\.0*$"
  // exponent form with a small exponent (≤15 keeps the double integral-exact
  // and far from Long overflow under ANSI); int-valued ones collapse to
  // integer text like the reference's int(float(value))
  private val expRe = "^[+-]?[0-9]+(\\.[0-9]+)?[eE][+-]?[0-9]{1,2}$"

  /**
   * Normalize one string-typed column per `normalize_value`
   * (data_helpers.py:447-486): trim; null-markers → NULL; boolean spellings →
   * "True"/"False"; trivial floats → integer form ("100.0" → "100"); string
   * ids with leading zeros kept verbatim; everything else trimmed-as-is.
   * Stays inside whole-stage codegen (when/regexp/cast only).
   */
  def normalizeValue(c: Column): Column = {
    val t  = trim(c)
    val lt = lower(t)
    when(c.isNull, lit(null).cast("string"))
      .when(lt.isin(NullMarkers: _*), lit(null).cast("string"))
      .when(lt.isin("false", "no"), lit("False"))
      .when(lt.isin("true", "yes"), lit("True"))
      // leading-zero digit strings are ids — keep verbatim (data_helpers.py:610-612)
      .when(t.rlike("^0[0-9]+$"), t)
      .when(t.rlike(intRe), t.cast("long").cast("string"))
      .when(t.rlike(trivialFloatRe), t.cast("double").cast("long").cast("string"))
      // int-valued exponent strings → integer form ("2.01803E+13" →
      // "20180300000000"), matching normalize_value's int(float(v))
      // (data_helpers.py:479-484); non-integral or huge exponents pass through
      .when(t.rlike(expRe) &&
          t.cast("double") === floor(t.cast("double")) &&
          abs(t.cast("double")) < lit(9.0e15),
        t.cast("double").cast("long").cast("string"))
      .otherwise(t)
  }

  /** Apply [[normalizeValue]] to every string column of a DataFrame. */
  def normalizeStringColumns(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.StringType
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) normalizeValue(col(f.name)).as(f.name) else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Pure-Scala twin of [[normalizeValue]] for driver-side rows and tests. */
  def normalizeValueScala(value: String): Option[String] = {
    if (value == null) return None
    val t  = value.trim
    val lt = t.toLowerCase
    if (NullMarkers.contains(lt)) None
    else if (lt == "false" || lt == "no") Some("False")
    else if (lt == "true" || lt == "yes") Some("True")
    else if (t.matches("^0[0-9]+$")) Some(t)
    else if (t.matches(intRe)) Some(java.lang.Long.parseLong(t).toString)
    else if (t.matches(trivialFloatRe)) Some(t.toDouble.toLong.toString)
    else if (t.matches(expRe) && {
      val d = t.toDouble; d == math.floor(d) && math.abs(d) < 9.0e15
    }) Some(t.toDouble.toLong.toString)
    else Some(t)
  }

  /**
   * Column-name sanitizer (`make_string_bq_friendly`, utils.py:140-155):
   * '%' → "percent", non-[A-Za-z0-9_ ] runs → space, trim, whitespace runs →
   * '_'.
   */
  def makeNameBqFriendly(name: String): String =
    name.replace("%", "percent")
      .replaceAll("[^A-Za-z0-9_ ]+", " ")
      .trim
      .replaceAll("\\s+", "_")

  /** `sanitize_file_prefix` (utils.py:158-168): non-alnum runs → '_'. */
  def sanitizeFilePrefix(prefix: String): String =
    prefix.replaceAll("[^0-9a-zA-Z_]+", "_")

  /**
   * Collapse a ';'-concatenated value to literal "multi" when it holds more
   * than `maxLength` entries; optionally de-duplicate (order-preserving)
   * first. Column form of `convert_concat_to_multi`
   * (create_tables_file_metadata_gdc.py:44-75).
   */
  def convertConcatToMulti(c: Column, maxLength: Int = MaxConcatCount,
                           filterDuplicates: Boolean = false): Column = {
    val parts = split(c, ";")
    val deduped = if (filterDuplicates) array_distinct(parts) else parts
    val joined  = if (filterDuplicates) array_join(deduped, ";") else c
    when(c.isNull, lit(null).cast("string"))
      .when(size(deduped) > maxLength, lit("multi"))
      .otherwise(joined)
  }

  /**
   * Duplicate-header dedup (`normalize_header_row` inside
   * create_normalized_tsv, data_helpers.py:497-516): lowercase, and append
   * `_1`, `_2`, … to repeated names (probing until unused).
   */
  def dedupHeader(headers: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    headers.foreach { h =>
      val base = h.toLowerCase
      var candidate = base
      var suffix = 1
      while (out.contains(candidate)) {
        candidate = s"${base}_$suffix"
        suffix += 1
      }
      out += candidate
    }
    out.toSeq
  }
}
