package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/**
 * Registry-wide 100 TB posture gate: NO registered query may plan a
 * CartesianProduct or BroadcastNestedLoopJoin — the two shapes that turn
 * into cluster-killers at scale. DedupSpec/AnnSpec assert this for the
 * near-dup family specifically; this spec locks it in for every query so a
 * future regression (a dropped join key, a non-equi condition slipping in)
 * fails CI instead of surfacing as a 100× slowdown in production.
 *
 * Queries flagged `eager` in the registry run real work at
 * DataFrame-CONSTRUCTION time (fixture writes, driver-side source fetches,
 * trainer loops) — the first test stays a pure plan-only audit by skipping
 * them; the second test runs them anyway (accepting the construction-time
 * jobs and fixture writes, which is what Verify does every round) so their
 * RETURNED plans keep the same no-nested-loop guarantee.
 */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** ONE offender scan shared by both audits — the banned-shape list must
    * never drift between the lazy and eager passes. */
  private def assertNoNestedLoops(qs: Seq[(String, Q)]): Unit = {
    val offenders = qs.flatMap { case (name, q) =>
      val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains).map(op => s"$name → $op")
    }
    assert(offenders.isEmpty, s"nested-loop shapes planned:\n${offenders.mkString("\n")}")
  }

  test("no lazily-constructed registered query plans a cartesian or nested-loop join") {
    assertNoNestedLoops(Registry.all.filterNot(_._2.eager))
  }

  test("eager queries' returned plans are nested-loop-free too (runs their construction)") {
    assertNoNestedLoops(Registry.all.filter(_._2.eager))
  }

  test("every no-oracle row declares an oracled twin, and twins resolve") {
    val byName = Registry.all.toMap
    // the twin map is total over no-oracle rows: a new hash-family scale
    // path can't be registered without a machine-checkable adjudication
    val orphans = Registry.all.collect {
      case (n, q) if q.oracle.isEmpty && q.twin.isEmpty => n
    }
    assert(orphans.isEmpty, s"no-oracle rows without a twin: $orphans")
    Registry.twins.foreach { case (src, tgt) =>
      assert(byName.contains(tgt), s"$src: twin $tgt is not registered")
      assert(byName(tgt).oracle.isDefined, s"$src: twin $tgt has no oracle")
      assert(byName(src).oracle.isEmpty, s"$src declares a twin but is itself oracled")
    }
  }

  test("the eager (audit-exempt) set is exactly the documented one") {
    // a new query must not silently dodge the audit by setting eager=true:
    // additions to this set need a construction-time action and a review
    val expected = Set(
      "s1_tsv_read_normalize", "s2_infer_typed_load", "s3_jsonl_roundtrip",
      "s4_tsv_null_marker_roundtrip", "s7_ctas_guard", "s9_table_copy",
      "s19_orc_roundtrip", "s20_xml_roundtrip",
      "s11_export_tsv", "s12_object_store_roundtrip", "s13_paginated_source",
      "s14_cursor_source", "s16_bucket_puller", "s17_zip_extract",
      "o4_top_n_display", "a15_approx_distinct_sketch",
      "l9_ann_bruteforce_topk", "l16_ivf_kmeans_train",
      // l33: per-stratum totals collect (bounded by the mix size) derives
      // the keep rates at construction time — reviewed round 8
      "l33_domain_balance",
      // l63: same shape as l33 — per-source char totals collect (bounded
      // by the source count) derives the tempered rates — reviewed round 9
      "l63_tempered_mixture",
      // s21/s22: partitioned/evolving parquet FIXTURE WRITES at
      // construction (the s19/s20 round-trip shape) — reviewed round 9
      "s21_partitioned_pruning", "s22_schema_evolution",
      // s24: corrupted-JSONL fixture write + PERMISSIVE read-back at
      // construction (same shape) — reviewed round 9
      "s24_corrupt_quarantine",
      // s26: fixed-width text fixture write + offset-parse read-back at
      // construction (the s19/s20 round-trip shape) — reviewed round 9
      "s26_fixed_width",
      // s27: bucketed saveAsTable writes at construction; the returned
      // join plan itself is exchange-free (BucketingSpec) — reviewed r9
      "s27_bucketed_join",
      // l108: query-vector collect (1 row, the l9 shape) — reviewed r9
      "l108_mips_topk",
      // c21: pointer-doubling rounds localCheckpoint at construction
      // (the l13 iterative shape) — reviewed r9
      "c21_hierarchy_closure",
      // s29: two-batch mtime-pinned fixture write at construction (the
      // s19/s20 round-trip shape) — reviewed r9
      "s29_incremental_scan",
      // l112: per-source count collect (bounded by the mixture size, the
      // l33/l63 shape) feeds the closed-form positions — reviewed r9
      "l112_mixture_interleave",
      // j20: the ⌈mBits/60⌉-word Bloom filter collects at construction
      // (bounded by mBits, never by dim rows) — reviewed r9
      "j20_bloom_semi_join",
      // s30: quoted-CSV fixture write at construction (the s19/s20
      // round-trip shape) — reviewed r9
      "s30_csv_quoted_roundtrip",
      // s31: month-partitioned fixture write at construction (the s21
      // shape); the returned join plan carries the dynamicpruning
      // partition filter (IoSpec) — reviewed r9
      "s31_dynamic_partition_pruning",
      // c26: publishes + vacuum deletions run at construction (the c3
      // lifecycle shape); returns a literal decision table — reviewed r9
      "c26_publish_vacuum",
      // l115: collects the bounded top-word frequency table at
      // construction and runs hard-EM over it (the BPE-trainer split;
      // the l16 bounded-collect precedent) — reviewed r10
      "l115_unigram_em_train",
      // s32: partitioned fixture write + dynamic-overwrite re-run at
      // construction (the s21/s31 shape) — reviewed r10
      "s32_dynamic_partition_overwrite",
      // l117: collects the m-row global bucket histogram at construction
      // (bounded by the bucket DOMAIN, the l16 precedent) and ships it
      // as a literal array — the join-free grid — reviewed r10
      "l117_t_closeness",
      // l123: collects the vocab-bounded successor table + seeds at
      // construction, rolls out driver-side (the BPE-trainer shape,
      // the l115/l16 bounded-collect precedent) — reviewed r11
      "l123_ngram_generate",
      "l125_doremi_weights", // domain recurrence driver-side by design
      "l126_bradley_terry",  // item-table MM recurrence driver-side (the
                             // l125 shape) — reviewed r13
      // s34: two fixture writes + ledger listing happen at construction
      // (the s21/s32 write-fixture precedent) — reviewed r13
      "s34_incremental_ingest",
      // s35: collects the bounded region table, writes the .sql dump
      // fixture, and parses it driver-side at construction (the s21/s32
      // write-fixture + l16 bounded-collect precedents) — reviewed r14
      "s35_sql_dump_import",

      // l5/l6/l7/l8/l13: the xxhash64-family property audits
      // (DedupAudit, round 11) localCheckpoint the scale-path output at
      // construction so the audit legs never re-run the LSH pipeline —
      // the nearDupClusters eager-materialization precedent; plans of
      // the UNDERLYING operators stay covered via the l*p portable twins
      "l5_minhash_lsh_pairs", "l6_ngram_jaccard_neardups",
      "l7_simhash_neardups", "l8_doc_fingerprint", "l13_neardup_clusters")
    val actual = Registry.all.filter(_._2.eager).map(_._1).toSet
    assert(actual == expected,
      s"eager-set drift — added: ${actual -- expected}, removed: ${expected -- actual}")
  }
}
