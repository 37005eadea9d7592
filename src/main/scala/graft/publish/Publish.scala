package graft.publish

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Diff

/**
 * Versioned publish workflow (SURVEY §2.10 #3): diff gate → versioned copy +
 * "current" pointer → archive previous; plus schema-tag metadata templating
 * (#8).
 *
 * Reference: cda_bq_etl/bq_helpers/create_modify.py:210-277 (publish),
 * lookup.py:650-727 (diff gate + version discovery), :197-296 (release
 * arithmetic); create_modify.py:525-711 + schema.py:372-491 (tag templating).
 *
 * Storage model: a table family lives under `root/` as `name_v<N>` parquet
 * dirs plus `name_current`; metadata as a JSON sidecar per version.
 */
object Publish {

  final case class PublishResult(published: Boolean, version: Int, path: String)

  /** Highest existing version of `name` under `root` (0 = none). */
  def latestVersion(root: String, name: String): Int = {
    val dir = new java.io.File(root)
    if (!dir.exists()) 0
    else dir.listFiles().toSeq
      .map(_.getName)
      .collect { case n if n.startsWith(s"${name}_v") => n.stripPrefix(s"${name}_v") }
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .sorted.lastOption.getOrElse(0)
  }

  /**
   * Publish gate + copy: if a previous version exists and is row-identical
   * (U3 symmetric diff empty, lookup.py:692-705) the publish is SKIPPED;
   * otherwise write `name_v<N+1>` and overwrite `name_current`.
   */
  def publish(spark: SparkSession, df: DataFrame, root: String, name: String): PublishResult = {
    val prev = latestVersion(root, name)
    if (prev > 0) {
      val old = spark.read.parquet(s"$root/${name}_v$prev")
      if (Diff.tablesMatch(old, df))
        return PublishResult(published = false, version = prev, path = s"$root/${name}_v$prev")
    }
    val next = prev + 1
    df.write.mode("overwrite").parquet(s"$root/${name}_v$next")
    spark.read.parquet(s"$root/${name}_v$next")
      .write.mode("overwrite").parquet(s"$root/${name}_current")
    PublishResult(published = true, version = next, path = s"$root/${name}_v$next")
  }

  /**
   * C8 — `{---tag-key---}` substitution into a metadata template
   * (create_modify.py:525-711; tags schema.py:372-491).
   */
  def applyTags(template: String, tags: Map[String, String]): String =
    tags.foldLeft(template) { case (acc, (k, v)) => acc.replace(s"{---$k---}", v) }

  /** Apply tags to every value of a metadata map (labels/descriptions). */
  def templateMetadata(meta: Map[String, String], tags: Map[String, String]): Map[String, String] =
    meta.map { case (k, v) => k -> applyTags(v, tags) }

  /** Write the templated metadata sidecar next to a published version. */
  def writeMetadata(path: String, meta: Map[String, String]): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val json = meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$path.metadata.json"),
      json.getBytes("UTF-8"))
  }
}
