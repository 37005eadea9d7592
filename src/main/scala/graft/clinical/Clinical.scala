package graft.clinical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/**
 * Config-driven clinical flattener (SURVEY §2.10 #1/#2).
 *
 * The reference declares a parent/child entity DAG in YAML `TABLE_PARAMS`
 * (ConfigFiles/CDA/GDC/CDACreateTablesClinicalGDC.yaml:50-103) and builds,
 * per program, one flat table per "table split": ancestor ids injected,
 * single-entry field groups merged in with prefixed columns, multi-entry
 * groups contributing `<group>__count` columns
 * (create_tables_clinical_gdc.py:91-548, esp. 280-311 prefixed projection,
 * 332-337 count CTEs, 413-509 join assembly).
 *
 * Scale: each child contributes ONE aggregation (groupBy parent id) and ONE
 * left join — shuffles on the parent key only; child aggregates partial
 * map-side. No driver materialization.
 */
final case class EntitySpec(
    name: String,
    idCol: String,
    childOf: Option[String] = None,
    prefix: Option[String] = None,
    /** true = at most one row per parent → merge columns into the parent
      * (reference "single-entry field group" merge,
      * build_gdc_api_clinical_program_tables.py:867-953). */
    singleEntry: Boolean = false,
    excludedColumns: Set[String] = Set.empty,
    columnOrderFirst: Seq[String] = Nil,
    columnOrderLast: Seq[String] = Nil)

object Clinical {

  /** P1-style prefixed projection (create_tables_clinical_gdc.py:280-311). */
  def prefixedColumns(df: DataFrame, spec: EntitySpec, keep: Set[String]): Seq[Column] =
    df.columns.toSeq
      .filterNot(spec.excludedColumns.contains)
      .filterNot(keep.contains) // id columns keep their name
      .map(c => col(c).as(spec.prefix.getOrElse("") + c))

  /**
   * Build the flattened table for `root` from per-entity DataFrames.
   *
   * For each child spec (ordered): singleEntry children LEFT-join their
   * prefixed columns on the parent id; multi-entry children contribute a
   * `<name>__count` column (COUNT + LEFT JOIN + IFNULL 0, matching
   * create_tables_clinical_gdc.py:332-337, 471-472).
   */
  def flatten(tables: Map[String, DataFrame], specs: Seq[EntitySpec], root: String): DataFrame = {
    val specByName = specs.map(s => s.name -> s).toMap
    val rootSpec = specByName(root)
    val rootDf = tables(root)
    val base = rootDf.select(
      col(rootSpec.idCol) +: prefixedColumns(rootDf, rootSpec, Set(rootSpec.idCol)): _*)

    val children = specs.filter(_.childOf.contains(root))
    val joined = children.foldLeft(base) { (acc, child) =>
      val childDf = tables(child.name)
      if (child.singleEntry) {
        val proj = childDf.select(
          col(child.idCol).as(s"__join_${child.name}") +:
            prefixedColumns(childDf, child, Set(child.idCol)): _*)
        acc.join(proj, acc(rootSpec.idCol) === col(s"__join_${child.name}"), "left")
          .drop(s"__join_${child.name}")
      } else {
        val counts = childDf.groupBy(col(child.idCol).as(s"__join_${child.name}"))
          .agg(count(lit(1)).cast("long").as(s"${child.name}__count"))
        acc.join(counts, acc(rootSpec.idCol) === col(s"__join_${child.name}"), "left")
          .drop(s"__join_${child.name}")
          .withColumn(s"${child.name}__count",
            coalesce(col(s"${child.name}__count"), lit(0L)))
      }
    }
    applyColumnOrder(joined, rootSpec)
  }

  /**
   * A2-driven null-column pruning pre-pass (create_tables_clinical_gdc.py:
   * 155-244): the reference runs a pivoted null census per field group and
   * drops columns with zero non-null values BEFORE generating the final
   * query. One aggregate pass (O(cols) result row), then a projection.
   */
  def pruneNullColumns(df: DataFrame, keep: Set[String] = Set.empty): DataFrame = {
    import graft.ops.Agg
    val counts = df.agg(
      Agg.nonNullCount(col(df.columns.head)).as(df.columns.head),
      df.columns.tail.map(c => Agg.nonNullCount(col(c)).as(c)).toIndexedSeq: _*)
      .collect()(0)
    val alive = df.columns.zipWithIndex.collect {
      case (c, i) if keep.contains(c) || counts.getLong(i) > 0 => c
    }
    df.select(alive.map(col).toIndexedSeq: _*)
  }

  /** first/middle/last column ordering from the spec (yaml column_order). */
  private def applyColumnOrder(df: DataFrame, spec: EntitySpec): DataFrame = {
    val all = df.columns.toSeq
    val first = spec.columnOrderFirst.filter(all.contains)
    val last = spec.columnOrderLast.filter(all.contains)
    val middle = all.filterNot(c => first.contains(c) || last.contains(c))
    df.select((first ++ middle ++ last).map(col): _*)
  }

  /**
   * C2 — JSON case flattener (build_gdc_api_clinical_program_tables.py:
   * 749-843): recursive walk of a nested schema; every ArrayType(Struct)
   * field group becomes its own long-form DataFrame keyed by the parent id;
   * nested scalar structs flatten in place with `__`-joined path names.
   *
   * Returns Map(groupPath → DataFrame); "" is the root (scalars only).
   */
  def flattenNested(df: DataFrame, idCol: String): Map[String, DataFrame] = {
    def walk(cur: DataFrame, path: String): Map[String, DataFrame] = {
      val fields = cur.schema.fields
      val scalarCols = fields.collect {
        case f if !f.dataType.isInstanceOf[ArrayType] && !f.dataType.isInstanceOf[StructType] =>
          col(f.name)
      }.toSeq
      // in-place flatten of scalar structs: parent__child naming
      val structCols = fields.collect {
        case f if f.dataType.isInstanceOf[StructType] =>
          f.dataType.asInstanceOf[StructType].fieldNames.toSeq
            .map(sub => col(s"${f.name}.$sub").as(s"${f.name}__$sub"))
      }.flatten.toSeq
      val here = path -> cur.select(scalarCols ++ structCols: _*)
      val childMaps = fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] &&
          f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] =>
          val childPath = if (path.isEmpty) f.name else s"$path.${f.name}"
          val exploded = cur.select(col(idCol), explode(col(f.name)).as("__e"))
            .select(col(idCol) +: cur.select(col(f.name))
              .schema.fields(0).dataType.asInstanceOf[ArrayType]
              .elementType.asInstanceOf[StructType].fieldNames.toSeq
              .map(n => col(s"__e.$n")): _*)
          walk(exploded, childPath)
      }.flatten.toMap
      childMaps + here
    }
    walk(df, "")
  }

  /**
   * Re-nest a child table into its parent as an array-of-structs column —
   * the inverse of [[flattenNested]] (ARRAY(SELECT AS STRUCT …) re-nesting,
   * PDC/build_pdc_clinical.py:368-384).
   */
  def nest(parent: DataFrame, child: DataFrame, parentId: String,
           childCols: Seq[String], as: String): DataFrame = {
    val nested = child.groupBy(col(parentId))
      .agg(collect_list(struct(childCols.map(col): _*)).as(as))
    parent.join(nested, Seq(parentId), "left")
      .withColumn(as, coalesce(col(as), array().cast(nested.schema(as).dataType)))
  }
}
