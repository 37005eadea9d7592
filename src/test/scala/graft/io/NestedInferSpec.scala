package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.types.BqType._

/**
 * Golden corpus port: nested-structure inference over example_dict_1/2
 * (tests/common_etl/test_utils.py:4-61) against
 * recursively_detect_object_structures (common_etl/utils.py:1395-1447).
 */
class NestedInferSpec extends AnyFunSuite {
  import NestedInfer._

  val exampleDict1: Map[String, Any] = Map(
    "parent_key_int" -> 1,
    "parent_key_list" -> Seq(
      Map("list_child_key_1" -> null, "list_child_key_2" -> 22, "list_child_key_3" -> 33),
      Map("list_child_key_1" -> true, "list_child_key_2" -> 23, "list_child_key_3" -> 34),
      Map("list_child_key_1" -> true, "list_child_key_2" -> 24, "list_child_key_3" -> 35)),
    "parent_key_str" -> "test str",
    "parent_key_dict" -> Map(
      "dict_child_key_1" -> 11, "dict_child_key_2" -> 22, "dict_child_key_3" -> 33))

  val exampleDict2: Map[String, Any] = Map(
    "parent_key_int" -> 2,
    "parent_key_list" -> Seq(
      Map("list_child_key_1" -> true, "list_child_key_2" -> 32, "list_child_key_3" -> 43.1),
      Map("list_child_key_1" -> false, "list_child_key_2" -> 33, "list_child_key_3" -> 44.1),
      Map("list_child_key_1" -> true, "list_child_key_2" -> 44, "list_child_key_3" -> 55.1)),
    "parent_array" -> Seq(9, 8, 7),
    "parent_key_str" -> "test str 2",
    "parent_key_dict" -> Map(
      "dict_child_key_1" -> 21, "dict_child_key_2" -> 32, "dict_child_key_3" -> 43))

  test("detect merges structures across records (utils.py:1395-1447)") {
    val tree = detect(Seq(exampleDict1, exampleDict2))
    assert(tree.fields("parent_key_int") == Leaf(Set(INT64)))
    assert(tree.fields("parent_key_str") == Leaf(Set(STRING)))
    assert(tree.fields("parent_array") == Leaf(Set(ARRAY)))
    val list = tree.fields("parent_key_list").asInstanceOf[Branch]
    assert(list.fields("list_child_key_1") == Leaf(Set(BOOL)))
    assert(list.fields("list_child_key_2") == Leaf(Set(INT64)))
    // ints in record 1, floats in record 2 → both types collected
    assert(list.fields("list_child_key_3") == Leaf(Set(INT64, FLOAT64)))
    val dict = tree.fields("parent_key_dict").asInstanceOf[Branch]
    assert(dict.fields("dict_child_key_1") == Leaf(Set(INT64)))
  }

  test("toStructType resolves lattice + REPEATED groups (schema.py:297-306)") {
    val tree = detect(Seq(exampleDict1, exampleDict2))
    val st = toStructType(tree, repeatedGroups = Set("parent_key_list"))
    assert(st("parent_key_int").dataType == LongType)
    assert(st("parent_key_str").dataType == StringType)
    val listType = st("parent_key_list").dataType
    assert(listType.isInstanceOf[ArrayType])
    val inner = listType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(inner("list_child_key_3").dataType == DoubleType)   // INT64+FLOAT64 → FLOAT64
    assert(inner("list_child_key_1").dataType == BooleanType)
    assert(st("parent_key_dict").dataType.isInstanceOf[StructType]) // not repeated
  }

  test("scalar classification honors normalize semantics") {
    assert(classifyScalar(100.0).contains(INT64))   // trivial float → int
    assert(classifyScalar(0.001).contains(FLOAT64))
    assert(classifyScalar("yes").contains(BOOL))    // normalized to "True"
    assert(classifyScalar("na").isEmpty)            // null marker → nothing
    assert(classifyScalar(null).isEmpty)
    assert(classifyScalar(Double.NaN).contains(FLOAT64))
  }
}
