package graft.io

import org.apache.spark.sql.types._
import graft.normalize.Normalize
import graft.types.{BqType, TypeInference}

/**
 * Nested-structure inference over JSON-like trees (dicts/lists of dicts):
 * the driver-side half of the reference's JSON → schema lifecycle.
 *
 * Port of `recursively_detect_object_structures`
 * (common_etl/utils.py:1395-1447): dict values nest as RECORD; lists of
 * dicts nest as REPEATED RECORD (all records merged into one child
 * structure); scalars are normalized then classified; non-empty scalar
 * lists classify ARRAY; None/empty contribute nothing.
 */
object NestedInfer {

  /** Inference tree: either a type set (leaf) or a nested field map. */
  sealed trait Node
  final case class Leaf(types: Set[BqType]) extends Node
  final case class Branch(fields: Map[String, Node]) extends Node

  /** Python-value normalization + classification for one scalar. */
  private[io] def classifyScalar(v: Any): Option[BqType] = v match {
    case null => None
    case b: Boolean => Some(BqType.BOOL)
    case _: Int | _: Long => Some(BqType.INT64)
    case d: Double =>
      // normalize_value collapses trivial floats to ints (data_helpers.py:479-484)
      if (d.isNaN || d.isInfinite) Some(BqType.FLOAT64)
      else if (d == math.floor(d)) Some(BqType.INT64)
      else Some(BqType.FLOAT64)
    case f: Float => classifyScalar(f.toDouble)
    case s: String =>
      Normalize.normalizeValueScala(s).flatMap(TypeInference.checkValueType)
    case other => TypeInference.checkValueType(other.toString)
  }

  /** Detect the structure of one record or a list of records. */
  def detect(obj: Any): Branch = {
    def walk(o: Map[String, Any], acc: scala.collection.mutable.Map[String, Node]): Unit =
      o.foreach { case (k, v) =>
        v match {
          case m: Map[_, _] =>
            val child = acc.getOrElseUpdate(k,
              Branch(Map.empty)) match {
              case b: Branch => scala.collection.mutable.Map(b.fields.toSeq: _*)
              case _ => scala.collection.mutable.Map.empty[String, Node]
            }
            walk(m.asInstanceOf[Map[String, Any]], child)
            acc(k) = Branch(child.toMap)
          case l: Seq[_] if l.nonEmpty && l.head.isInstanceOf[Map[_, _]] =>
            val child = acc.getOrElseUpdate(k, Branch(Map.empty)) match {
              case b: Branch => scala.collection.mutable.Map(b.fields.toSeq: _*)
              case _ => scala.collection.mutable.Map.empty[String, Node]
            }
            l.foreach(r => walk(r.asInstanceOf[Map[String, Any]], child))
            acc(k) = Branch(child.toMap)
          case l: Seq[_] if l.nonEmpty =>
            val prev = acc.get(k).collect { case Leaf(t) => t }.getOrElse(Set.empty)
            acc(k) = Leaf(prev + BqType.ARRAY)
          case _: Seq[_] => // empty list contributes nothing
          case scalar =>
            val prev = acc.get(k).collect { case Leaf(t) => t }.getOrElse(Set.empty)
            acc(k) = Leaf(classifyScalar(scalar).fold(prev)(prev + _))
        }
      }
    val acc = scala.collection.mutable.Map.empty[String, Node]
    obj match {
      case m: Map[_, _] => walk(m.asInstanceOf[Map[String, Any]], acc)
      case l: Seq[_] => l.foreach(r => walk(r.asInstanceOf[Map[String, Any]], acc))
      case other => throw new IllegalArgumentException(s"not a record tree: $other")
    }
    Branch(acc.toMap)
  }

  /**
   * Resolve a detected tree to a Spark StructType: leaves via the coercion
   * lattice, branches as (repeated) RECORDs — the reference marks every
   * nested group REPEATED NULLABLE-free (schema.py:297-306); here both
   * dict-of-dict and list-of-dict become ArrayType(Struct) when `repeated`,
   * StructType otherwise. Fields sorted for determinism.
   */
  def toStructType(tree: Branch, repeatedGroups: Set[String] = Set.empty,
                   path: String = ""): StructType =
    StructType(tree.fields.toSeq.sortBy(_._1).map {
      case (name, Leaf(types)) =>
        val bq = TypeInference.resolveTypeConflict(name, types - BqType.ARRAY)
        val base = BqType.toSpark(bq)
        val t = if (types.contains(BqType.ARRAY)) ArrayType(base) else base
        StructField(name, t, nullable = true)
      case (name, b: Branch) =>
        val p = if (path.isEmpty) name else s"$path.$name"
        val inner = toStructType(b, repeatedGroups, p)
        val t = if (repeatedGroups.contains(p)) ArrayType(inner) else inner
        StructField(name, t, nullable = true)
    })
}
