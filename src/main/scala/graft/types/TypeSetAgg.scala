package graft.types

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst aggregate for one-pass distributed type inference
 * (SURVEY §4 optional custom work; §2.9): per partition, classify each cell
 * with the reference's `check_value_type` and collect the BQ type-name set;
 * partial buffers merge as set unions. Replaces a two-pass sample+collect or
 * an RDD fold — the whole inference is one hash-aggregate with map-side
 * partials, so a 100 TB scan ships only (columns × ≤11 type names) per task.
 *
 * Reference semantics: cda_bq_etl/data_helpers.py:220-295
 * (`aggregate_column_data_types_tsv` + `resolve_column_types`).
 */
case class TypeSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.TreeSet[String] = new java.util.TreeSet[String]()

  override def update(buffer: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      TypeInference.checkValueType(v.toString).foreach(t => buffer.add(t.name))
    }
    buffer
  }

  override def merge(b1: java.util.TreeSet[String], b2: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    b1.addAll(b2); b1
  }

  override def eval(buffer: java.util.TreeSet[String]): Any = {
    val arr = new Array[Any](buffer.size())
    val it = buffer.iterator(); var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.TreeSet[String]): Array[Byte] = {
    val it = buffer.iterator()
    val sb = new StringBuilder
    while (it.hasNext) { if (sb.nonEmpty) sb.append(','); sb.append(it.next()) }
    sb.toString.getBytes("UTF-8")
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val s = new String(bytes, "UTF-8")
    val set = new java.util.TreeSet[String]()
    if (s.nonEmpty) s.split(',').foreach(set.add)
    set
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_type_set"

  override def withNewMutableAggBufferOffset(newOffset: Int): TypeSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TypeSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TypeSetAgg =
    copy(child = newChild)
}

object TypeSetAgg {

  /** Register `graft_type_set(col)` as a session function. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_type_set", (children: Seq[Expression]) => TypeSetAgg(children.head), "scala_udf")

  /** Column form: the aggregated sorted array of BQ type names. */
  def typeSet(spark: SparkSession, colName: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"graft_type_set(`$colName`)")
  }
}
