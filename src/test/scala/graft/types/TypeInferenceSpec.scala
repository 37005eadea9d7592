package graft.types

import org.scalatest.funsuite.AnyFunSuite
import graft.types.BqType._

/**
 * Port of the reference golden corpus: tests/common_etl/test_utils.py:66-140
 * (value→type table and conflict-lattice cases).
 */
class TypeInferenceSpec extends AnyFunSuite {

  val golden: Seq[(String, BqType)] = Seq(
    "000"         -> STRING,
    "0.0"         -> INT64,
    "100"         -> INT64,
    "-5403"       -> INT64,
    "-10001.0"    -> INT64,
    "0.001"       -> FLOAT64,
    "NaN"         -> FLOAT64,
    "nan"         -> FLOAT64,
    "2.01803E+13" -> FLOAT64,
    "inf"         -> FLOAT64,
    "-inf"        -> FLOAT64,
    "Infinity"    -> FLOAT64,
    "Hi"          -> STRING,
    "0.1.1"       -> STRING,
    "1.1.1"       -> STRING,
    "111-222"     -> STRING,
    "Hello"       -> STRING,
    "2000-12-31"  -> DATE,
    "2000-1-1"    -> DATE,
    "2000-01-01"  -> DATE,
    "9:03:22.0001" -> TIME,
    "09:03:22"    -> TIME,
    "9:3:22"      -> TIME,
    "2019-05-01T13:44:50.898263-05:00" -> TIMESTAMP,
    "2019-05-01 13:44:50.898263-05:00" -> TIMESTAMP,
    "2019-05-01T13:44:50.898263" -> TIMESTAMP,
    "2019-05-01 13:44:50.898263" -> TIMESTAMP,
    "2019-5-1T13:44:50.898263" -> TIMESTAMP,
    "True"  -> BOOL,
    "False" -> BOOL,
    "yes"   -> BOOL,
    "no"    -> BOOL,
    "1"     -> BOOL,
    "0"     -> BOOL,
    "true"  -> BOOL,
    "false" -> BOOL
  )

  test("check_value_type golden corpus") {
    golden.foreach { case (v, expected) =>
      assert(TypeInference.checkValueType(v).contains(expected),
        s"value '$v' expected $expected got ${TypeInference.checkValueType(v)}")
    }
  }

  test("empty value yields no type") {
    assert(TypeInference.checkValueType("").isEmpty)
    assert(TypeInference.checkValueType(null).isEmpty)
  }

  test("extra edge cases: ids, uuids, exponents") {
    assert(TypeInference.checkValueType("007").contains(STRING))
    assert(TypeInference.checkValueType("0").contains(BOOL))
    // UUIDs have 4 hyphens → STRING before any date regex runs
    assert(TypeInference.checkValueType("123e4567-e89b-12d3-a456-426614174000").contains(STRING))
    assert(TypeInference.checkValueType("1e2").contains(FLOAT64))
    assert(TypeInference.checkValueType("100.00").contains(INT64))
    // empty fraction → STRING (common_etl/utils.py variant: int('') raises)
    assert(TypeInference.checkValueType("100.").contains(STRING))
    assert(TypeInference.checkValueType("1.").contains(STRING))
  }

  test("resolve_type_conflict lattice (test_utils.py:66-95)") {
    import TypeInference.resolveTypeConflict
    assert(resolveTypeConflict("", Set.empty) == STRING)
    assert(resolveTypeConflict("", Set(FLOAT64, INT64, NUMERIC)) == FLOAT64)
    assert(resolveTypeConflict("", Set(INT64, NUMERIC)) == NUMERIC)
    assert(resolveTypeConflict("", Set(STRING, BOOL)) == STRING)
    assert(resolveTypeConflict("", Set(INT64, BOOL)) == INT64)
    assert(resolveTypeConflict("", Set(INT64)) == INT64)
    // _id fields force STRING regardless of evidence (data_helpers.py:318-320)
    assert(resolveTypeConflict("case_id", Set(INT64)) == STRING)
    assert(resolveTypeConflict("sample_id_count", Set(INT64, FLOAT64)) == STRING)
    // datetime lattice
    assert(resolveTypeConflict("", Set(DATE, TIMESTAMP)) == DATETIME)
    assert(resolveTypeConflict("", Set(TIME, DATE)) == STRING)
    assert(resolveTypeConflict("", Set(DATE, INT64)) == STRING)
    // structural conflicts are fatal
    assertThrows[IllegalArgumentException](resolveTypeConflict("", Set(ARRAY, STRING)))
    assertThrows[IllegalArgumentException](resolveTypeConflict("", Set(RECORD, INT64)))
  }

  test("spark type mapping") {
    import org.apache.spark.sql.types._
    assert(BqType.toSpark(INT64) == LongType)
    assert(BqType.toSpark(NUMERIC) == DecimalType(38, 9))
    assert(BqType.toSpark(TIME) == StringType)
    assert(BqType.toSpark(DATETIME) == TimestampNTZType)
  }
}
