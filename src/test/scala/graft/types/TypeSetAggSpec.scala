package graft.types

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.io.SchemaInfer
import org.apache.spark.sql.types._

class TypeSetAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("native type-set aggregate collects per-column BQ types in one pass") {
    val df = Seq(
      ("100", "0.5", "yes", "2020-01-01", "abc"),
      ("-7", "NaN", "no", "2021-12-31", "007"),
      ("42", "1.25", "true", "2000-1-1", "x-y-z-w-q")
    ).toDF("ints", "floats", "bools", "dates", "strings")
    val types = SchemaInfer.inferColumnTypes(df)
    assert(types("ints") === BqType.INT64)
    assert(types("floats") === BqType.FLOAT64)
    assert(types("bools") === BqType.BOOL)
    assert(types("dates") === BqType.DATE)
    assert(types("strings") === BqType.STRING)
  }

  test("mixed columns resolve through the lattice; _id forced STRING") {
    val df = Seq(("1", "5"), ("2.5", "6")).toDF("mixed", "thing_id")
    val types = SchemaInfer.inferColumnTypes(df)
    // "1"→BOOL, "2.5"→FLOAT64 ⇒ lattice → FLOAT64 wait: {BOOL,FLOAT64} has no
    // special rule → falls to STRING? No: BOOL is not a number; datetime no;
    // number yes (FLOAT64) → returns FLOAT64 per data_helpers.py:377-385.
    assert(types("mixed") === BqType.FLOAT64)
    assert(types("thing_id") === BqType.STRING)
  }

  test("inferSchema maps to Spark types in column order") {
    val df = Seq(("1", "a"), ("0", "b")).toDF("flag", "name")
    val s = SchemaInfer.inferSchema(df)
    assert(s === StructType(Seq(
      StructField("flag", BooleanType, nullable = true),
      StructField("name", StringType, nullable = true))))
  }
}
