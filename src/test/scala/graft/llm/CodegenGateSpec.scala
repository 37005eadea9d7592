package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Codegen gate for the native expressions: run every native-expression
 * pipeline with `spark.sql.codegen.factoryMode=CODEGEN_ONLY` (expression
 * codegen failures THROW instead of silently falling back to interpreted)
 * and `spark.sql.codegen.fallback=false` (same for whole-stage codegen).
 * This is the net that would have caught hash60's missing static
 * forwarder, which produced correct results interpreted — only the
 * executor logs revealed the ERROR CodeGenerator fallback.
 */
class CodegenGateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def withCodegenOnly[T](body: => T): T = {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("every native expression compiles under CODEGEN_ONLY (no silent interpreted fallback)") {
    withCodegenOnly {
      val docs = Seq((1L, "the quick brown fox jumps the fence"),
        (2L, "the quick brown fox jumps the hedge")).toDF("doc_id", "text")
      // PortableHash60Expr (scalar + inside a HOF lambda)
      assert(docs.select(TextOps.portableHash60($"text")).collect().length === 2)
      assert(docs.select(TextOps.portableDocFingerprint($"text")).collect().length === 2)
      // SimHash64 + SimHashPortable60 over token arrays
      val toks = docs.select($"doc_id", TextOps.whitespaceTokens(lower($"text")).as("_toks"))
      assert(toks.select(SimHash64.simhashCol(spark, "_toks")).collect().length === 2)
      assert(toks.select(SimHashPortable60.simhashCol(spark, "_toks")).collect().length === 2)
      // HyperplaneBucket over a float vector
      val vecs = Seq((1L, Array(1f, -1f, 0.5f, 0.2f))).toDF("vec_id", "vec")
      assert(vecs.select(HyperplaneBucket.bucketCol(spark, "vec", 6)).collect().length === 1)
      // full portable LSH pipeline end to end
      assert(Dedup.minhashCandidatePairs(docs, "text", "doc_id",
        shingleSize = 3, k = 8, bands = 4, family = PortableFamily).count() >= 0)
      // OphMinHash (one-pass signature) — scalar form + full pipeline
      val sh = docs.select(TextOps.shingleHashesFromTokenHashes(
        TextOps.tokenHashes($"text"), 3).as("_sh"))
      assert(sh.select(Dedup.ophSignature($"_sh", 8)).collect().length === 2)
      assert(Dedup.ophCandidatePairs(docs, "text", "doc_id",
        shingleSize = 3, k = 8, bands = 4, family = PortableFamily).count() >= 0)
      // round-8 Unicode expressions (NFC normalize + accent fold): force a
      // non-ASCII literal through both so the generated call paths compile
      val uni = Seq((1L, "café Ångström")).toDF("id", "t")
      assert(uni.select(TextOps.normalizeText($"t")).collect().length === 1)
      assert(uni.select(TextOps.foldAccents($"t")).collect()(0).getString(0)
        === "cafe Angstrom")
      // LangIdNgramExpr + BPE expressions ride their own specs; the trigram
      // expression is exercised here through the registry-facing column
      assert(uni.select(NgramLangId.langIdNgram($"t")).collect().length === 1)
    }
  }
}
