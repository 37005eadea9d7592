package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class ScdSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private type Row5 = (Long, String, Long, Option[Long], Boolean)

  private def hist(rows: Row5*) =
    rows.toDF("k", "seg", "valid_from", "valid_to", "is_current")

  test("scd2Apply: change closes + reopens, no-op untouched, insert opens, chained batches") {
    val h0 = hist((1L, "A", 0L, None, true), (2L, "B", 0L, None, true),
      (3L, "C", 0L, None, true))
    val u1 = Seq((1L, "A2"), (2L, "B"), (4L, "D")).toDF("k", "seg")
    val h1 = Scd.scd2Apply(h0, u1, "k", Seq("seg"), batchTs = 10L)
      .as[Row5].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(h1 === Seq(
      (1L, "A", 0L, Some(10L), false), // changed: closed…
      (1L, "A2", 10L, None, true),     // …and reopened
      (2L, "B", 0L, None, true),       // no-op update: NOT versioned
      (3L, "C", 0L, None, true),       // untouched key
      (4L, "D", 10L, None, true)))     // brand-new key
    // chaining a second batch versions on top of the new current rows and
    // never rewrites closed history
    val u2 = Seq((1L, "A3"), (3L, "C2")).toDF("k", "seg")
    val h2 = Scd.scd2Apply(hist(h1: _*), u2, "k", Seq("seg"), batchTs = 20L)
      .as[Row5].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(h2 === Seq(
      (1L, "A", 0L, Some(10L), false),
      (1L, "A2", 10L, Some(20L), false),
      (1L, "A3", 20L, None, true),
      (2L, "B", 0L, None, true),
      (3L, "C", 0L, Some(20L), false),
      (3L, "C2", 20L, None, true),
      (4L, "D", 10L, None, true)))
    // per-key invariants: exactly one current row, validity intervals chain
    h2.groupBy(_._1).foreach { case (k, rows) =>
      assert(rows.count(_._5) === 1, s"key $k current rows")
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3), s"key $k interval chain")
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
    }
  }

  test("scd2Apply: null-safe attribute comparison") {
    val h0 = Seq((1L, Option.empty[String], 0L, Option.empty[Long], true),
      (2L, Option("X"), 0L, Option.empty[Long], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val u = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "seg")
    val out = Scd.scd2Apply(h0, u, "k", Seq("seg"), 5L)
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect()
    // NULL → NULL is unchanged; X → NULL is a change
    assert(out.count(_._1 == 1L) === 1)
    assert(out.count(_._1 == 2L) === 2)
    assert(out.filter(_._1 == 2L).count(_._5) === 1)
  }

  test("mergeUpsert: update / delete / insert / keep, delete-absent no-op, action audit") {
    val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "seg", "bal")
    val source = Seq(
      (1L, "U", "a2", 11L),  // matched update
      (2L, "D", null, 0L),   // matched delete
      (4L, "U", "d", 40L),   // unmatched insert
      (9L, "D", null, 0L))   // delete of an absent key: MERGE no-op
      .toDF("k", "op", "seg", "bal")
    val out = Scd.mergeUpsert(target, source, "k", Seq("seg", "bal"), "op")
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "a2", 11L, "updated"),
      (3L, "c", 30L, "kept"),
      (4L, "d", 40L, "inserted")))
  }

  test("mergeUpsert: NULL source attribute overwrites (type-1 takes the source verbatim)") {
    val target = Seq((1L, Option("x"))).toDF("k", "seg")
    val source = Seq((1L, "U", Option.empty[String])).toDF("k", "op", "seg")
    val out = Scd.mergeUpsert(target, source, "k", Seq("seg"), "op")
      .as[(Long, Option[String], String)].collect().toSeq
    assert(out === Seq((1L, None, "updated")))
  }

  test("compactChangelog: latest op per key wins, audit counts, single hash-agg plan") {
    val chg = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "a2"), (1L, 3L, "U", "a3"), // update chain
      (2L, 1L, "I", "b"), (2L, 5L, "D", null),                      // insert then delete
      (3L, 7L, "I", "c"))                                           // lone insert
      .toDF("k", "seq", "op", "seg")
    val out = Scd.compactChangelog(chg, "k", "seq", "op", Seq("seg"))
    assert(out.columns.toSeq === Seq("k", "op", "seg", "n_ops", "last_seq"))
    val rows = out.as[(Long, String, Option[String], Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq(
      (1L, "U", Some("a3"), 3L, 3L),
      (2L, "D", None, 2L, 5L),
      (3L, "I", Some("c"), 1L, 7L)))
    // one aggregation, no window sort in the physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "compaction must not plan a window sort")
  }

  test("temporalJoin: version picked by fact time, half-open boundary, uncovered facts dropped") {
    val history = Seq(
      (1L, "A", 0L, Option(10L)), (1L, "A2", 10L, Option(20L)), (1L, "A3", 20L, None),
      (2L, "B", 5L, None)) // key 2 has no version before t=5
      .toDF("k", "seg", "valid_from", "valid_to")
    val facts = Seq(
      (100L, 1L, 0L),   // first instant of v1
      (101L, 1L, 10L),  // boundary: v1 closes AT 10 → v2 wins (half-open)
      (102L, 1L, 19L),  // last instant of v2
      (103L, 1L, 99L),  // open current version
      (104L, 2L, 3L),   // before key 2's first version: dropped
      (105L, 9L, 1L))   // unknown key: dropped
      .toDF("fid", "fk", "t")
    val out = Scd.temporalJoin(facts, history, "fk", "t", "k")
      .select("fid", "seg").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq((100L, "A"), (101L, "A2"), (102L, "A2"), (103L, "A3")))
  }

  test("cdcApply: delete kills a same-batch insert; update chain lands the latest; audit lanes") {
    val target = Seq((1L, "t1", 100L), (5L, "t5", 500L)).toDF("k", "seg", "bal")
    val chg = Seq(
      (1L, 1L, "U", "u1", 110L), (1L, 2L, "U", "u1b", 111L), // matched update chain
      (2L, 1L, "I", "n2", 200L),                             // fresh insert
      (3L, 1L, "I", "n3", 300L), (3L, 2L, "D", null, 0L),    // insert then delete: never lands
      (9L, 4L, "D", null, 0L))                               // delete of absent key: no-op
      .toDF("k", "seq", "op", "seg", "bal")
    val out = Scd.cdcApply(target, chg, "k", "seq", "op", Seq("seg", "bal"))
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "u1b", 111L, "updated"),
      (2L, "n2", 200L, "inserted"),
      (5L, "t5", 500L, "kept")))
  }

  test("lateArrivingDimension: loaded / inferred / enriched lanes; NULL late attrs still enrich") {
    val dim = Seq((1L, "seg1"), (2L, "seg2")).toDF("k", "seg")
    val facts = Seq(1L, 3L, 4L, 5L, 3L).toDF("k") // 3,4,5 early-arriving
    val late = Seq((3L, "seg3"), (5L, null.asInstanceOf[String])).toDF("k", "seg")
    val out = Scd.lateArrivingDimension(dim, facts, late, "k", Seq("seg"))
      .as[(Long, String, String)].collect().toSet
    assert(out === Set(
      (1L, "seg1", "loaded"), (2L, "seg2", "loaded"), // dim rows kept even if unreferenced
      (3L, "seg3", "enriched"),
      (4L, null, "inferred"),                          // never arrived
      (5L, null, "enriched")))                         // arrived with a NULL attr: still enriched
  }
}
