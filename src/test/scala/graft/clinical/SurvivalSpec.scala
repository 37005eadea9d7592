package graft.clinical

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Kaplan-Meier product-limit estimator: hand-computed curve, censoring
  * semantics, micro-unit floor recursion, multi-group independence. */
class SurvivalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // classic textbook cohort (one arm): event times 6,6,6,7,10,13,16,22,23
  // with censoring at 6,9,10,11,17,19,20,25,32,32,34,35 — the Freireich
  // 6-MP arm (public, used in every KM exposition)
  private val sixMp = Seq(
    (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
    (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
    (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0))

  test("KM matches the hand-computed 6-MP curve in micro-units") {
    val df = sixMp.toDF("t", "ev").withColumn("grp",
      org.apache.spark.sql.functions.lit("6mp"))
    val km = Survival.kaplanMeier(df, "grp", "t", "ev")
      .orderBy("t").collect()
    // hand recursion: S=1e6; t=6: n=21,d=3 → floor(1e6·18/21)=857142
    // t=7: n=17 → floor(857142·16/17)=806721
    // t=10: n=15 → floor(806721·14/15)=752939
    // t=13: n=12 → floor(752939·11/12)=690194
    // t=16: n=11 → floor(690194·10/11)=627449
    // t=22: n=7  → floor(627449·6/7)=537813
    // t=23: n=6  → floor(537813·5/6)=448177
    val expected = Seq(
      (6L, 21L, 3L, 857142L), (7L, 17L, 1L, 806721L),
      (10L, 15L, 1L, 752939L), (13L, 12L, 1L, 690194L),
      (16L, 11L, 1L, 627449L), (22L, 7L, 1L, 537813L),
      (23L, 6L, 1L, 448177L))
    assert(km.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq === expected)
  }

  test("censor-only times never step the curve but do shrink later risk sets") {
    // two subjects censored at t=5 remove themselves from the t=10 risk set
    val df = Seq(("a", 5, 0), ("a", 5, 0), ("a", 10, 1), ("a", 10, 1),
      ("a", 12, 0)).toDF("grp", "t", "ev")
    val km = Survival.kaplanMeier(df, "grp", "t", "ev").collect()
    assert(km.length === 1)                      // only t=10 is an event time
    assert(km.head.getLong(2) === 3L)            // 5 subjects − 2 censored@5
    assert(km.head.getLong(3) === 2L)
    assert(km.head.getLong(4) === 333333L)       // floor(1e6 * 1/3)
  }

  test("groups are independent strata") {
    val df = Seq(("x", 1, 1), ("x", 2, 1), ("y", 1, 1), ("y", 1, 0))
      .toDF("grp", "t", "ev")
    val km = Survival.kaplanMeier(df, "grp", "t", "ev")
      .orderBy("grp", "t").collect()
    assert(km.map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSeq ===
      Seq(("x", 2L, 500000L), ("x", 1L, 0L), ("y", 2L, 500000L)))
  }

  test("all-censored group yields an empty curve; null times are dropped") {
    val df = Seq(("z", Some(4), 0), ("z", Some(9), 0), ("z", None, 1))
      .toDF("grp", "t", "ev")
    assert(Survival.kaplanMeier(df, "grp", "t", "ev").count() === 0)
  }

  test("logRank: symmetric arms give chi2 = 0 with hand-checked O/E/V terms") {
    // A: (1,ev)(2,cens)(3,ev)  B: (1,cens)(2,ev)(3,ev) — mirror images
    val df = Seq(("A", 1, 1), ("A", 2, 0), ("A", 3, 1),
      ("B", 1, 0), ("B", 2, 1), ("B", 3, 1)).toDF("grp", "t", "ev")
    val r = Survival.logRank(df, "grp", "t", "ev", "A").collect().head
    // t=1: e=(1·3·1e6)//6=500000, v=(1·5·3·3·1e6)//180=250000
    // t=2: e=(1·2·1e6)//4=500000, v=(1·3·2·2·1e6)//48=250000
    // t=3: e=(2·1·1e6)//2=1e6,    v=0 (n=d)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((2L, 2000000L, 500000L, 0L, 3L)))
  }

  test("logRank: early-event arm vs late-event arm gives chi2 ≈ 3") {
    val df = Seq(("A", 1, 1), ("A", 1, 1), ("B", 5, 1), ("B", 5, 1))
      .toDF("grp", "t", "ev")
    val r = Survival.logRank(df, "grp", "t", "ev", "A").collect().head
    // t=1: n=4,n1=2,d=2,d1=2 → e=1e6, v=(2·2·2·2·1e6)//(16·3)=333333
    // t=5: n=2,n1=0,d=2 → e=0, v=0
    // chi2 = (2e6−1e6)² // 333333 = 3000003 micro (true value 3)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((2L, 1000000L, 333333L, 3000003L, 2L)))
  }

  test("logRank: single-subject times (n=1 guard) contribute zero variance") {
    val df = Seq(("A", 1, 1), ("B", 9, 1)).toDF("grp", "t", "ev")
    val r = Survival.logRank(df, "grp", "t", "ev", "A").collect().head
    // t=1: n=2,n1=1,d=1 → v=(1·1·1·1·1e6)//(4·1)=250000; t=9: n=1 → v=0
    assert(r.getLong(2) === 250000L)
    assert(r.getLong(4) === 2L)
  }
}
