package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase
import graft.llm.JaroWinklerMicro

class LinkageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JaroWinklerMicro.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinklerMicro: textbook pairs in exact micro-units") {
    // MARTHA/MARHTA: jaro 17/18, prefix 3 -> 173/180 -> round(961111.1)
    assert(jw("MARTHA", "MARHTA") === 961111L)
    // DWAYNE/DUANE: jaro 37/45, prefix 1 -> 378/450 = 0.84 exactly
    assert(jw("DWAYNE", "DUANE") === 840000L)
    // DIXON/DICKSONX: jaro 23/30, prefix 2 -> 61/75 = 813333.3 -> 813333
    assert(jw("DIXON", "DICKSONX") === 813333L)
    // identical / empty / disjoint
    assert(jw("abc", "abc") === 1000000L)
    assert(jw("", "abc") === 0L)
    assert(jw("", "") === 0L)
    assert(jw("abc", "xyz") === 0L)
    // below the 0.7 gate no boost applies even with a shared prefix:
    // "ab" vs "aXYZ...": m=1 -> jaro=(1/2+1/4+1)/3=7/12 < 0.7 -> 583333
    assert(jw("ab", "aXYZ") === 583333L)
  }

  test("JaroWinklerMicro: byte-wise semantics for multi-byte UTF-8") {
    // 'é' is 2 UTF-8 bytes; DuckDB scores bytes, not codepoints. "née"
    // (bytes n,C3,A9,e: l1=4) vs "nee" (l2=3): window 1, matches m=2
    // ('n' at 0, final 'e' at j=2), t=0, jaro=(2/4+2/3+2/2)/3=13/18,
    // prefix 1 (byte 'n'), jw=13/18+(1/10)(5/18)=135/180=0.75 exactly.
    assert(jw("née", "nee") === 750000L)
  }

  test("JaroWinklerMicro: 4096-byte cap throws, 4096 exactly is scored") {
    val max = "a" * 4096
    assert(jw(max, max) === 1000000L)
    val over = "a" * 4097
    val e = intercept[IllegalArgumentException](jw(over, "a"))
    assert(e.getMessage.contains("4096"))
  }

  test("JaroWinklerMicro: matches a double-reference JW within 1 micro on real names") {
    // independent double-arithmetic reference (byte-wise, same matching
    // rules) -- the rational path must agree to the last micro-unit up to
    // the .5-rounding caveat the class doc pins
    def ref(a: Array[Byte], b: Array[Byte]): Double = {
      val l1 = a.length; val l2 = b.length
      if (l1 == 0 || l2 == 0) return 0.0
      val window = math.max(math.max(l1, l2) / 2 - 1, 0)
      val bm = new Array[Boolean](l2)
      val idx = new Array[Int](math.min(l1, l2))
      var m = 0
      for (i <- 0 until l1) {
        var j = math.max(0, i - window); var done = false
        while (j <= math.min(l2 - 1, i + window) && !done) {
          if (!bm(j) && a(i) == b(j)) { bm(j) = true; idx(m) = i; m += 1; done = true }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var t2 = 0; var k = 0; var j2 = 0
      while (k < m) {
        while (!bm(j2)) j2 += 1
        if (a(idx(k)) != b(j2)) t2 += 1
        j2 += 1; k += 1
      }
      val t = t2 / 2
      val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
      if (jaro <= 0.7) jaro
      else {
        var p = 0
        while (p < math.min(4, math.min(l1, l2)) && a(p) == b(p)) p += 1
        jaro + p * 0.1 * (1.0 - jaro)
      }
    }
    val names = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select("p_name").as[String].collect()
    val pairs = names.take(200).flatMap(a => names.take(50).map(b => (a, b)))
    // pairs ON a pinned boundary are exactly where doubles legitimately
    // diverge (e.g. "hot gizmo"/"hot widget": jaro exactly 7/10 -> the
    // double sum lands at 0.700..01 and boosts) -- skip them here, they
    // are what onBoostBoundary/onRoundingBoundary exist to detect
    var skipped = 0
    pairs.foreach { case (a, b) =>
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      if (JaroWinklerMicro.onBoostBoundary(ua, ub) ||
          JaroWinklerMicro.onRoundingBoundary(ua, ub)) { skipped += 1 }
      else {
        val exact = jw(a, b)
        val dbl = math.round(1e6 * ref(a.getBytes("UTF-8"), b.getBytes("UTF-8")))
        assert(math.abs(exact - dbl) <= 1L, s"($a, $b): exact=$exact double=$dbl")
      }
    }
    assert(skipped < pairs.length / 100, s"boundary pairs should be rare, got $skipped")
  }

  test("j17 pair set: no pair sits on the two pinned floating-point boundaries") {
    // The oracle contract (JaroWinklerExpr doc): DuckDB may disagree on a
    // pair whose jaro is EXACTLY 0.7 (double boost gate) or whose scaled
    // score is EXACTLY *.5 micro (double round). Assert the whole fuzzy
    // candidate set -- before the score filter -- contains neither.
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val mangled = part.select(col("p_partkey").as("m_key"),
      Linkage.swap34(col("p_name"), "p_name").as("m_name"))
    val cand = mangled.join(
        part.select(col("p_partkey").as("cand_key"), col("p_name").as("cand_name")),
        substring(col("m_name"), 1, 2) === substring(col("cand_name"), 1, 2) &&
          length(col("m_name")) === length(col("cand_name")))
      .select("m_name", "cand_name").as[(String, String)].collect()
    assert(cand.nonEmpty)
    val bad = cand.filter { case (a, b) =>
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      JaroWinklerMicro.onBoostBoundary(ua, ub) || JaroWinklerMicro.onRoundingBoundary(ua, ub)
    }
    assert(bad.isEmpty, s"boundary pairs would make the DuckDB oracle flaky: ${bad.take(3).mkString}")
  }

  test("jwBlockedLinkage: every swap-corrupted record resolves to its source") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val mangled = part.select(col("p_partkey").as("m_key"),
      Linkage.swap34(col("p_name"), "p_name").as("m_name"))
    // swap34 preserves byte length and the 2-byte blocking prefix
    val shapes = mangled.join(part, col("m_key") === col("p_partkey"))
      .select((length(col("m_name")) === length(col("p_name"))).as("len_ok"),
        (substring(col("m_name"), 1, 2) === substring(col("p_name"), 1, 2)).as("pre_ok"))
      .agg(sum(when(col("len_ok") && col("pre_ok"), 0).otherwise(1))).as[Long].head()
    assert(shapes === 0L)
    val out = Linkage.jwBlockedLinkage(spark,
      mangled, "m_key", "m_name", part, "p_partkey", "p_name", minJwMicro = 900000L)
    assert(out.columns.toSeq === Seq("m_key", "cand_key", "jw_micro", "dist"))
    // self-match recall: a 3<->4 transposition keeps jw >= 0.9 on these names
    val n = part.count()
    val selfHits = out.filter(col("m_key") === col("cand_key")).count()
    assert(selfHits === n, s"expected all $n corrupted records to resolve, got $selfHits")
    // and the self-match is levenshtein<=2 (one transposition = 2 edits unless chars equal)
    assert(out.filter(col("m_key") === col("cand_key") && col("dist") > 2).count() === 0L)
  }

  test("jwBlockedLinkage plan: blocking is an equi-join, not a cartesian") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val mangled = part.select(col("p_partkey").as("m_key"),
      Linkage.swap34(col("p_name"), "p_name").as("m_name"))
    val plan = Linkage.jwBlockedLinkage(spark,
        mangled, "m_key", "m_name", part, "p_partkey", "p_name", 900000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("jwResolveBest: one row per resolved record, each to its source name's min key") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val mangled = part.select(col("p_partkey").as("m_key"),
      Linkage.swap34(col("p_name"), "p_name").as("m_name"))
    val out = Linkage.jwResolveBest(spark,
      mangled, "m_key", "m_name", part, "p_partkey", "p_name", minJwMicro = 900000L).cache()
    assert(out.columns.toSeq === Seq("m_key", "cand_key", "jw_micro", "dist"))
    // linear output: exactly one verdict per left record (all resolve here)
    val n = part.count()
    assert(out.count() === n)
    assert(out.select("m_key").distinct().count() === n)
    // each record's best match is the min registry key of its OWN source
    // name group (a 3<->4 transposition scores above any cross-name pair
    // on this fixture — asserted as a strict argmax, no tie-break rescue)
    val expected = part
      .join(part.groupBy(col("p_name")).agg(min(col("p_partkey")).as("want_key")), "p_name")
      .select(col("p_partkey").as("m_key"), col("want_key"))
    val wrong = out.join(expected, "m_key")
      .filter(col("cand_key") =!= col("want_key")).count()
    assert(wrong === 0L)
    assert(out.filter(col("jw_micro") < 900000L).count() === 0L)
    out.unpersist()
  }

  test("jwResolveBest scales in distinct names, not record duplication") {
    // duplicate every left record 8x: scoring input (distinct names) is
    // unchanged, output grows exactly 8x (linear fan-back, never pairs)
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val mangled = part.select(col("p_partkey").as("m_key"),
      Linkage.swap34(col("p_name"), "p_name").as("m_name"))
    val dup = mangled
      .select(col("m_key"), col("m_name"), explode(sequence(lit(0), lit(7))).as("id"))
      .select((col("m_key") * 8 + col("id")).as("m_key"), col("m_name"))
    val base = Linkage.jwResolveBest(spark,
      mangled, "m_key", "m_name", part, "p_partkey", "p_name", 900000L).count()
    val out = Linkage.jwResolveBest(spark,
      dup, "m_key", "m_name", part, "p_partkey", "p_name", 900000L)
    assert(out.count() === base * 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("graft_jaro_winkler_micro registered SQL function + null propagation") {
    JaroWinklerMicro.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler_micro('MARTHA', 'MARHTA') a, graft_jaro_winkler_micro(CAST(NULL AS STRING), 'x') b")
      .collect()(0)
    assert(r.getLong(0) === 961111L)
    assert(r.isNullAt(1))
  }
}
