package graft.types

import org.apache.spark.sql.types._

/**
 * BigQuery-compatible scalar/structural type tags, as produced by the
 * reference's value-type inference.
 *
 * Reference: cda_bq_etl/data_helpers.py:581-715 (`check_value_type`),
 * :298-388 (`resolve_type_conflict`); golden corpus
 * tests/common_etl/test_utils.py:66-140.
 */
sealed abstract class BqType(val name: String) {
  override def toString: String = name
}

object BqType {
  case object BOOL      extends BqType("BOOL")
  case object INT64     extends BqType("INT64")
  case object FLOAT64   extends BqType("FLOAT64")
  case object NUMERIC   extends BqType("NUMERIC")
  case object STRING    extends BqType("STRING")
  case object DATE      extends BqType("DATE")
  case object TIME      extends BqType("TIME")
  case object TIMESTAMP extends BqType("TIMESTAMP")
  case object DATETIME  extends BqType("DATETIME")
  case object ARRAY     extends BqType("ARRAY")
  case object RECORD    extends BqType("RECORD")

  val all: Seq[BqType] =
    Seq(BOOL, INT64, FLOAT64, NUMERIC, STRING, DATE, TIME, TIMESTAMP, DATETIME, ARRAY, RECORD)

  def fromName(s: String): BqType =
    all.find(_.name == s).getOrElse(throw new IllegalArgumentException(s"unknown BQ type: $s"))

  /**
   * Spark mapping per SURVEY §1.2: TIME has no Spark type and stays STRING
   * (the reference's own escape hatch: resolve_type_conflict sends TIME
   * conflicts to STRING, data_helpers.py:369-371); DATETIME (civil, no zone)
   * maps to TimestampNTZType; NUMERIC to Decimal(38,9) like BigQuery.
   */
  def toSpark(t: BqType): DataType = t match {
    case BOOL      => BooleanType
    case INT64     => LongType
    case FLOAT64   => DoubleType
    case NUMERIC   => DecimalType(38, 9)
    case STRING    => StringType
    case DATE      => DateType
    case TIME      => StringType
    case TIMESTAMP => TimestampType
    case DATETIME  => TimestampNTZType
    case ARRAY     => throw new IllegalArgumentException("ARRAY needs an element type")
    case RECORD    => throw new IllegalArgumentException("RECORD needs fields")
  }
}

/**
 * Pure-Scala port of the reference's type-inference semantics — no Spark
 * dependency, usable from both driver-side schema synthesis and distributed
 * samplers.
 *
 * Faithful to cda_bq_etl/data_helpers.py:581-715 with two deliberate
 * alignments to the golden unit corpus (tests/common_etl/test_utils.py:97-140),
 * which the live implementation has drifted from:
 *   - "1"/"0" classify BOOL (strtobool members; the conflict lattice's
 *     {INT64,BOOL}->INT64 rule exists precisely for this,
 *     data_helpers.py:342-346);
 *   - scientific-notation strings ("2.01803E+13") classify FLOAT64, not INT64.
 */
object TypeInference {
  import BqType._

  /** distutils.util.strtobool truth sets (data_helpers.py:699-703). */
  private val boolTrue  = Set("y", "yes", "t", "true", "on", "1")
  private val boolFalse = Set("n", "no", "f", "false", "off", "0")

  // BigQuery canonical date/time regexes, ported character-for-character from
  // data_helpers.py:678-697 (including the stray `]` in the seconds group,
  // which only affects strings containing a literal ']').
  private val dateRe = "[0-9]{4}-(0[1-9]|1[0-2]|[0-9])-(0[1-9]|[1-2][0-9]|[3][0-1]|[1-9])"
  private val timeRe = "([0-1][0-9]|[2][0-3]|[0-9]):([0-5][0-9]|[0-9]):([0-5][0-9]|[0-9]])(\\.[0-9]{1,6}|)"
  private val datePat      = ("^" + dateRe + "$").r
  private val timePat      = ("^" + timeRe + "$").r
  private val timestampPat = ("^" + dateRe + "( |T)" + timeRe + "([ \\-:A-Za-z0-9]*)$").r

  private def fullMatch(p: scala.util.matching.Regex, s: String): Boolean =
    p.pattern.matcher(s).matches()

  // Cheap shape pre-checks so the hot inference path (TypeSetAgg over every
  // cell) never pays for a thrown NumberFormatException on ordinary strings.
  private def looksLikeLong(t: String): Boolean = {
    if (t.isEmpty) return false
    var i = if (t.charAt(0) == '+' || t.charAt(0) == '-') 1 else 0
    if (i >= t.length || t.length - i > 19) return false
    while (i < t.length) { if (t.charAt(i) < '0' || t.charAt(i) > '9') return false; i += 1 }
    true
  }

  private def looksLikeDouble(t: String): Boolean = {
    var i = 0; var sawDigit = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= '0' && c <= '9') sawDigit = true
      else if (c != '+' && c != '-' && c != '.' && c != 'e' && c != 'E') return false
      i += 1
    }
    sawDigit
  }

  private def parseLong(s: String): Option[Long] = {
    val t = s.trim
    if (!looksLikeLong(t)) None
    else try Some(java.lang.Long.parseLong(t)) catch { case _: NumberFormatException => None }
  }

  /** Python float() parse: accepts inf/infinity/nan (any case), exponents. */
  private def parseDouble(s: String): Option[Double] = {
    val t = s.trim
    val lower = t.toLowerCase
    lower match {
      case "inf" | "+inf" | "infinity" | "+infinity" => Some(Double.PositiveInfinity)
      case "-inf" | "-infinity"                      => Some(Double.NegativeInfinity)
      case "nan" | "+nan" | "-nan"                   => Some(Double.NaN)
      case _ =>
        // Reject java-isms Python float() rejects: trailing d/f, hex.
        if (!looksLikeDouble(t)) None
        else try Some(java.lang.Double.parseDouble(t)) catch { case _: NumberFormatException => None }
    }
  }

  /**
   * Leading-zero digit strings are ids, not ints (data_helpers.py:610-612,
   * 641-643): starts with '0', length > 1, and contains none of ':', '-', '.'.
   */
  def isLeadingZeroId(s: String): Boolean =
    s.startsWith("0") && s.length > 1 && !s.contains(':') && !s.contains('-') && !s.contains('.')

  /**
   * Python `str.isnumeric() and not str.isdigit() and not str.isdecimal()`
   * (data_helpers.py:663-665): every char carries a Unicode numeric value but
   * at least one is outside the decimal-digit category (vulgar fractions,
   * ideographic numbers, …).
   */
  private def isUnicodeNumericNotDigit(s: String): Boolean = {
    def isNumericChar(c: Char): Boolean = Character.getType(c) match {
      case Character.DECIMAL_DIGIT_NUMBER | Character.LETTER_NUMBER | Character.OTHER_NUMBER => true
      case _ => false
    }
    s.nonEmpty && s.forall(isNumericChar) && s.exists(c => !Character.isDigit(c))
  }

  /**
   * Classify one string value; None for the empty string (reference returns
   * Python None for falsy values, data_helpers.py:630-631). Callers feed the
   * result sets into [[resolveTypeConflict]].
   */
  def checkValueType(value: String): Option[BqType] = {
    if (value == null || value.isEmpty) return None

    // String ids with leading zeros win over everything (data_helpers.py:610-612).
    if (isLeadingZeroId(value)) return Some(STRING)

    val lower = value.toLowerCase
    // strtobool members → BOOL (golden corpus "1"/"0"/"yes"/"no"/"true"/"false").
    if (boolTrue.contains(lower) || boolFalse.contains(lower)) return Some(BOOL)

    // Scientific notation → FLOAT64 (golden corpus "2.01803E+13").
    if ((value.contains("E+") || value.contains("E-") || value.contains("e+") || value.contains("e-"))
        && parseDouble(value).isDefined) return Some(FLOAT64)

    // NaN / infinity spellings accepted by Python float() → FLOAT64
    // (data_helpers.py:614-615, 624-625).
    parseDouble(value) match {
      case Some(d) if d.isNaN || d.isInfinite => return Some(FLOAT64)
      case _                                  =>
    }

    // Dotted numerics (data_helpers.py:648-661): trivial fraction → INT64,
    // real fraction → FLOAT64, unparseable dotted string → STRING. An EMPTY
    // fraction ("100.") is STRING, matching the golden-corpus variant
    // (common_etl/utils.py check_value_type: int('') raises → STRING).
    // Deliberate divergence (documented): dotted lowercase-exponent strings
    // ("1.5e3") classify FLOAT64 here; the corpus variant returns STRING
    // (int("5e3") raises) and the cda variant returns INT64 — we pick the
    // type-safe reading since the value genuinely is a float.
    if (value.contains('.') && !value.contains(':')) {
      return Some(parseLong(value) match {
        case Some(_) => INT64
        case None =>
          parseDouble(value) match {
            case Some(_) =>
              val frac = value.split('.').lift(1).getOrElse("")
              if (frac.isEmpty) STRING
              else if (frac.forall(_ == '0')) INT64
              else FLOAT64
            case None => STRING
          }
      })
    }

    // Unicode-numeric-but-not-digit → NUMERIC (data_helpers.py:663-665).
    if (isUnicodeNumericNotDigit(value) && parseLong(value).isEmpty) return Some(NUMERIC)

    // UUID guard: >3 hyphens is just a string (data_helpers.py:668-669).
    if (value.count(_ == '-') > 3) return Some(STRING)

    // Date/time/timestamp canonical formats (data_helpers.py:678-697).
    if (value.count(_ == '-') >= 2 || value.count(_ == ':') == 2) {
      if (fullMatch(datePat, value)) return Some(DATE)
      if (fullMatch(timePat, value)) return Some(TIME)
      if (fullMatch(timestampPat, value)) return Some(TIMESTAMP)
      return Some(STRING)
    }

    // Final numeric fallbacks (data_helpers.py:706-714).
    parseLong(value) match {
      case Some(_) => Some(INT64)
      case None =>
        parseDouble(value) match {
          case Some(_) => Some(FLOAT64)
          case None    => Some(STRING)
        }
    }
  }

  private val datetimeTypes: Set[BqType] = Set(TIMESTAMP, DATE, TIME)
  private val numberTypes: Set[BqType]   = Set(INT64, FLOAT64, NUMERIC)

  /**
   * BigQuery implicit-coercion lattice (cda_bq_etl/data_helpers.py:298-388):
   * `_id` fields force STRING; empty set → STRING; ARRAY/RECORD conflicts are
   * fatal; STRING absorbs; {INT64,BOOL} → INT64; datetime+number → STRING;
   * TIME conflicts → STRING; {DATE,TIMESTAMP} → DATETIME;
   * FLOAT64 > NUMERIC > INT64; fallback STRING.
   */
  def resolveTypeConflict(field: String, typesIn: Set[BqType]): BqType = {
    if (field != null && field.contains("_id")) return STRING

    val types = typesIn.filter(_ != null)
    if (types.isEmpty) return STRING
    if (types.size == 1) return types.head

    if (types.contains(ARRAY) || types.contains(RECORD))
      throw new IllegalArgumentException(s"Invalid datatype combination for $field: $types")

    if (types.contains(STRING)) return STRING
    if (types.size == 2 && types.contains(INT64) && types.contains(BOOL)) return INT64

    val hasDatetime = types.exists(datetimeTypes.contains)
    val hasNumber   = types.exists(numberTypes.contains)

    if (hasDatetime && hasNumber) return STRING
    if (hasDatetime) {
      if (types.contains(TIME)) return STRING
      return DATETIME
    }
    if (hasNumber) {
      if (types.contains(FLOAT64)) return FLOAT64
      if (types.contains(NUMERIC)) return NUMERIC
    }
    STRING
  }

  /** Resolve a whole column→types map (data_helpers.py:280-295). */
  def resolveTypeConflicts(typesDict: Map[String, Set[BqType]]): Map[String, BqType] =
    typesDict.map { case (field, ts) => field -> resolveTypeConflict(field, ts) }
}
