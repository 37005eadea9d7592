package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class NgramLangIdSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("profiles are fixed-size, deterministic, weight K−rank") {
    for (l <- NgramLangId.Langs) {
      val p = NgramLangId.Profiles(l)
      assert(p.size === NgramLangId.ProfileSize)
      assert(p.map(_._2) === (NgramLangId.ProfileSize to 1 by -1))
      assert(NgramLangId.profileOf(NgramLangId.TrainingText(l)) === p)
    }
  }

  test("reference scorer identifies held-out sentences per language") {
    // none of these sentences appear in the training text
    assert(NgramLangId.predict("the weather this morning was bright and the streets were full") === "en")
    assert(NgramLangId.predict("die wetterlage am morgen war schön und die strassen waren voll") === "de")
    assert(NgramLangId.predict("el tiempo de la mañana era claro y las calles estaban llenas") === "es")
    assert(NgramLangId.predict("le temps du matin était clair et les rues étaient pleines") === "fr")
    // too short / no profile hits → und
    assert(NgramLangId.predict("xy") === "und")
    assert(NgramLangId.predict("zzzz qqqq") === "und")
    assert(NgramLangId.predict("") === "und")
  }

  test("Column expression ≡ reference scorer, distributed, incl. null") {
    val texts = Seq(
      "the quick brown fox and the old houses along the street",
      "die kleinen kinder gehen am morgen zusammen",
      "los niños caminan por la calle por la mañana",
      "les enfants marchent dans la rue le matin",
      "zz", "", "   ", null)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", NgramLangId.langIdNgram($"text").as("p"))
      .as[(Long, Option[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      // null text classifies as "und" (unknown input ≡ undetermined) — the
      // DuckDB twin produces the same via NULL-propagating CASE arms
      if (t == null) assert(got(i.toLong) === Some("und"))
      else assert(got(i.toLong) === Some(NgramLangId.predict(t)), s"'$t'")
    }
    assert(got(0L) === Some("en") && got(1L) === Some("de"))
    assert(got(2L) === Some("es") && got(3L) === Some("fr"))
  }

  test("native expression ≡ HOF twin ≡ one-pass scorer on varied inputs") {
    val texts = Seq(
      "the quick brown fox", "die kleinen kinder", "los niños pequeños",
      "les petits enfants", "a b c d e", "mixed der the los les text",
      "   spaces   ", "ab")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = rows.select($"id", NgramLangId.langIdNgram($"text").as("p"))
      .as[(Long, String)].collect().toMap
    val hof = rows.select($"id", NgramLangId.langIdNgramHof($"text").as("p"))
      .as[(Long, String)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(native(i.toLong) === NgramLangId.defaultScorer.predict(t), s"native '$t'")
      assert(native(i.toLong) === hof(i.toLong), s"native vs hof '$t'")
      assert(native(i.toLong) === NgramLangId.predict(t), s"native vs reference '$t'")
    }
  }

  test("native expression compiles under CODEGEN_ONLY") {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq("the quick brown fox and the street").toDF("text")
        .select(NgramLangId.langIdNgram($"text").as("p")).as[String].collect()
      assert(out.toSeq === Seq("en"))
    } finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
