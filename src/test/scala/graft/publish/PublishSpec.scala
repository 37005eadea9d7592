package graft.publish

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PublishSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String = {
    val f = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "pubspec").toString
    f
  }

  test("publish: v1, identical skip, changed v2 (create_modify.py:210-277)") {
    val root = freshRoot()
    val t1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val r1 = Publish.publish(spark, t1, root, "t")
    assert(r1.published && r1.version === 1)
    val r2 = Publish.publish(spark, t1, root, "t")
    assert(!r2.published && r2.version === 1)
    val t2 = Seq((1L, "a"), (2L, "CHANGED")).toDF("id", "v")
    val r3 = Publish.publish(spark, t2, root, "t")
    assert(r3.published && r3.version === 2)
    assert(Publish.latestVersion(root, "t") === 2)
    val current = spark.read.parquet(s"$root/t_current").as[(Long, String)].collect().toSet
    assert(current === Set((1L, "a"), (2L, "CHANGED")))
  }

  test("pointer mode: same gate semantics, atomic pointer, time travel") {
    val root = freshRoot()
    val t1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val r1 = Publish.publish(spark, t1, root, "t", Publish.PointerCurrent)
    assert(r1.published && r1.version === 1)
    assert(Publish.currentVersion(root, "t") === 1)
    // identical → skip, pointer unmoved (gate semantics match CopyCurrent)
    val r2 = Publish.publish(spark, t1, root, "t", Publish.PointerCurrent)
    assert(!r2.published && Publish.currentVersion(root, "t") === 1)
    val t2 = Seq((1L, "a"), (2L, "CHANGED")).toDF("id", "v")
    val r3 = Publish.publish(spark, t2, root, "t", Publish.PointerCurrent)
    assert(r3.published && r3.version === 2)
    assert(Publish.currentVersion(root, "t") === 2)
    // no parquet copy was written — the pointer IS the current
    assert(!new java.io.File(s"$root/t_current").exists())
    assert(Publish.readCurrent(spark, root, "t").as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "CHANGED")))
    // time travel: v1 still readable and intact
    assert(Publish.readVersion(spark, root, "t", 1).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))
    // no half-state left behind
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/t_current.ptr.tmp")))
  }

  test("readCurrent falls back to the copy dir for CopyCurrent families") {
    val root = freshRoot()
    val t1 = Seq((7L, "z")).toDF("id", "v")
    Publish.publish(spark, t1, root, "t")
    assert(Publish.currentVersion(root, "t") === 0) // no pointer
    assert(Publish.readCurrent(spark, root, "t").as[(Long, String)].collect().toSet
      === Set((7L, "z")))
  }

  test("mixed-mode lineage: copy publish then pointer publish shares versions") {
    val root = freshRoot()
    Publish.publish(spark, Seq((1L, "a")).toDF("id", "v"), root, "t")
    val r = Publish.publish(spark, Seq((1L, "b")).toDF("id", "v"), root, "t",
      Publish.PointerCurrent)
    assert(r.published && r.version === 2)
    assert(Publish.currentVersion(root, "t") === 2)
  }

  test("tag templating (create_modify.py:525-711)") {
    assert(Publish.applyTags("{---a---}/{---b---}", Map("a" -> "x", "b" -> "y")) === "x/y")
    val meta = Publish.templateMetadata(
      Map("name" -> "{---rel---} table"), Map("rel" -> "r9"))
    assert(meta("name") === "r9 table")
  }
}
