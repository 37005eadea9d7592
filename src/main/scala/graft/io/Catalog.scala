package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Catalog operations (SURVEY §2.1 S8–S10): view creation with the
 * reference's table/view collision guard, idempotent drops, database
 * creation.
 *
 * Reference: cda_bq_etl/bq_helpers/create_modify.py:306-336 (view create —
 * refuses when a TABLE occupies the id), :339-352 (idempotent delete),
 * :383-410 (dataset create).
 */
object Catalog {

  final class TableOccupiesViewId(msg: String) extends RuntimeException(msg)

  /**
   * S8 — create or replace a view; refuse when the name is bound to a
   * persistent TABLE (create_modify.py:314-323).
   */
  def createView(spark: SparkSession, name: String, df: DataFrame): Unit = {
    if (spark.catalog.tableExists(name)) {
      val t = spark.catalog.getTable(name)
      if (t.tableType == "MANAGED" || t.tableType == "EXTERNAL")
        throw new TableOccupiesViewId(s"$name exists as a ${t.tableType} table, not a view")
    }
    df.createOrReplaceTempView(name)
  }

  /** S10 — idempotent drop (create_modify.py:339-352). */
  def dropViewIfExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.dropTempView(name)

  /** S10 — database (dataset) creation (create_modify.py:383-410). */
  def createDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")

  /**
   * Schema-drift detector (`find_missing_columns`, lookup.py:544-645): the
   * reference scans INFORMATION_SCHEMA.COLUMNS against the yaml-declared
   * column lists before building. Returns (missing-from-table,
   * unexpected-in-table).
   */
  def columnDrift(df: DataFrame, expected: Seq[String]): (Seq[String], Seq[String]) = {
    val have = df.columns.toSet
    val want = expected.toSet
    (expected.filterNot(have.contains), df.columns.toSeq.filterNot(want.contains))
  }

  /** Fatal variant — pipelines refuse to build against drifted schemas. */
  def requireColumns(df: DataFrame, expected: Seq[String]): Unit = {
    val (missing, extra) = columnDrift(df, expected)
    require(missing.isEmpty,
      s"schema drift: missing=${missing.mkString(",")} extra=${extra.mkString(",")}")
  }

  /** S11 — export a table to TSV files (support.py:434-470). */
  def exportTsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t").option("header", header.toString).option("nullValue", "None")
      .csv(path)
}
