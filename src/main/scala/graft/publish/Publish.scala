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
 *
 * Two "current" mechanisms:
 *  - [[CopyCurrent]] (default, reference-faithful): `name_current` is a
 *    parquet COPY of the new version (create_modify.py:210-277 copies the
 *    table). Simple, but the copy rewrites the whole table (O(data) per
 *    publish) and an overwrite-in-place is not atomic — a concurrent
 *    reader can catch a half-written dir.
 *  - [[PointerCurrent]] (transactional variant): versions stay immutable;
 *    `name_current.ptr` is a tiny JSON manifest naming the current
 *    version, swapped via write-temp + ATOMIC_MOVE rename. Publish is
 *    O(1) in table size, the flip is all-or-nothing (readers resolve
 *    either the old or the new immutable version, never a mix), and every
 *    prior version stays readable ([[readVersion]] = time travel). This is
 *    the Delta/Iceberg commit-pointer idea reduced to one table on a
 *    filesystem with atomic rename; on an object store without atomic
 *    rename you'd back the pointer with a catalog or conditional put.
 *
 * Version allocation assumes one publisher per table family at a time
 * (true of the reference's ETL, which publishes from a single driver).
 */
object Publish {

  final case class PublishResult(published: Boolean, version: Int, path: String)

  /** How `name_current` is maintained. */
  sealed trait CurrentMode
  /** Reference-faithful: `name_current` is a full parquet copy. */
  case object CopyCurrent extends CurrentMode
  /** Transactional: `name_current.ptr` manifest, atomically renamed. */
  case object PointerCurrent extends CurrentMode

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
   * Publish gate + version write: if a previous version exists and is
   * row-identical (U3 symmetric diff empty, lookup.py:692-705) the publish
   * is SKIPPED; otherwise write `name_v<N+1>` and advance "current" per
   * `mode` — a parquet copy ([[CopyCurrent]], the reference's behavior) or
   * an atomic pointer swap ([[PointerCurrent]]). The diff gate is
   * mode-independent: both paths version against the same `name_v<N>`
   * lineage, so a family can even switch modes between publishes.
   */
  def publish(spark: SparkSession, df: DataFrame, root: String, name: String,
              mode: CurrentMode = CopyCurrent): PublishResult = {
    val prev = latestVersion(root, name)
    if (prev > 0) {
      val old = spark.read.parquet(s"$root/${name}_v$prev")
      if (Diff.tablesMatch(old, df))
        return PublishResult(published = false, version = prev, path = s"$root/${name}_v$prev")
    }
    val next = prev + 1
    df.write.mode("overwrite").parquet(s"$root/${name}_v$next")
    mode match {
      case CopyCurrent =>
        spark.read.parquet(s"$root/${name}_v$next")
          .write.mode("overwrite").parquet(s"$root/${name}_current")
        // a family may switch modes between publishes: a pointer left by an
        // earlier PointerCurrent publish would otherwise shadow this newer
        // copy in readCurrent forever. Re-aim it at the new version (keeps
        // the swap atomic; deleting would race a concurrent reader between
        // unlink and copy-read).
        if (java.nio.file.Files.exists(pointerPath(root, name)))
          writePointer(root, name, next)
      case PointerCurrent =>
        writePointer(root, name, next)
    }
    PublishResult(published = true, version = next, path = s"$root/${name}_v$next")
  }

  private def pointerPath(root: String, name: String) =
    java.nio.file.Paths.get(s"$root/${name}_current.ptr")

  /** Atomically swap the current-version pointer: write a temp manifest,
    * then ATOMIC_MOVE it over the pointer path. Readers see the old or the
    * new manifest in full — never a partial file. */
  private def writePointer(root: String, name: String, version: Int): Unit = {
    val target = pointerPath(root, name)
    val tmp = java.nio.file.Paths.get(s"$root/${name}_current.ptr.tmp")
    val json = s"""{"name": "$name", "version": $version, "path": "${name}_v$version"}"""
    java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Version the `name_current.ptr` manifest names, 0 if no pointer. */
  def currentVersion(root: String, name: String): Int = {
    val p = pointerPath(root, name)
    if (!java.nio.file.Files.exists(p)) 0
    else {
      val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      """"version":\s*(\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalStateException(s"malformed pointer manifest $p: $s"))
    }
  }

  /** Read the current table: pointer manifest if present (PointerCurrent
    * families), else the `name_current` copy dir. */
  def readCurrent(spark: SparkSession, root: String, name: String): DataFrame = {
    val v = currentVersion(root, name)
    if (v > 0) readVersion(spark, root, name, v)
    else spark.read.parquet(s"$root/${name}_current")
  }

  /** Time travel: read version `v` of a published family (versions are
    * immutable under both modes). */
  def readVersion(spark: SparkSession, root: String, name: String, v: Int): DataFrame =
    spark.read.parquet(s"$root/${name}_v$v")

  /** One retention decision of [[vacuumPlan]]. */
  final case class VacuumDecision(version: Int, action: String, reason: String)

  /**
   * Retention plan for a published family — the Delta-style VACUUM split
   * into pure PLAN and destructive APPLY so the deletion list is
   * auditable before anything disappears. A version is KEPT when it is
   * (precedence order) the one "current" resolves to, among the
   * `keepLast` highest versions, or younger than `minAgeMs` (version-dir
   * mtime vs `nowMs` — the time-travel grace window); everything else is
   * `delete/expired`. Versions are immutable, so the plan is a pure
   * function of the directory listing.
   */
  def vacuumPlan(root: String, name: String, keepLast: Int,
                 minAgeMs: Long, nowMs: Long): Seq[VacuumDecision] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val latest = latestVersion(root, name)
    val cur = currentVersion(root, name)
    (1 to latest).flatMap { v =>
      val dir = new java.io.File(s"$root/${name}_v$v")
      if (!dir.exists()) None
      else Some {
        if (v == cur) VacuumDecision(v, "keep", "current")
        else if (v > latest - keepLast) VacuumDecision(v, "keep", "last-n")
        else if (nowMs - dir.lastModified() < minAgeMs)
          VacuumDecision(v, "keep", "age")
        else VacuumDecision(v, "delete", "expired")
      }
    }
  }

  /** Apply a [[vacuumPlan]]: delete every `delete/expired` version dir
    * (plus its metadata sidecar) and return the decisions. Never touches
    * `name_current` (copy families keep reading it) or the pointer. */
  def vacuum(root: String, name: String, keepLast: Int,
             minAgeMs: Long, nowMs: Long): Seq[VacuumDecision] = {
    val plan = vacuumPlan(root, name, keepLast, minAgeMs, nowMs)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    plan.filter(_.action == "delete").foreach { d =>
      rm(new java.io.File(s"$root/${name}_v${d.version}"))
      new java.io.File(s"$root/${name}_v${d.version}.metadata.json").delete()
    }
    plan
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
