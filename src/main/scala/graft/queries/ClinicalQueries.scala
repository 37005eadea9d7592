package graft.queries

import org.apache.spark.sql.functions._
import graft.clinical.{Clinical, DcfManifest, EntitySpec, PdcClinical}
import graft.publish.Publish
import Registry.td

/**
 * SURVEY §2.10 — clinical flatteners (C1/C2), publish workflow (C3),
 * metadata templating (C8), re-nesting round-trip.
 *
 * The entity graph is mapped onto testdata: customer = case (root),
 * a single-entry "profile" group merged with prefix, orders = multi-entry
 * child contributing orders__count.
 */
object ClinicalQueries {

  val all: Seq[(String, Q)] = Seq(

    // C1 — config-driven flattener: prefixed single-entry merge + child
    //   __count columns + column ordering (create_tables_clinical_gdc.py:91-548)
    "c1_clinical_flatten" -> Q(
      (s, dir) => {
        val customer = td(s, dir, "customer")
        val tables = Map(
          "case" -> customer.select("c_custkey", "c_name"),
          "profile" -> customer.select("c_custkey", "c_mktsegment", "c_acctbal"),
          "orders" -> td(s, dir, "orders").select(col("o_custkey"), col("o_orderkey")))
        val specs = Seq(
          EntitySpec("case", "c_custkey", columnOrderFirst = Seq("c_custkey", "c_name")),
          EntitySpec("profile", "c_custkey", childOf = Some("case"),
            prefix = Some("prof__"), singleEntry = true),
          EntitySpec("orders", "o_custkey", childOf = Some("case")))
        Clinical.flatten(tables, specs, "case")
      },
      Some("""SELECT c.c_custkey, c.c_name, p.c_mktsegment AS prof__c_mktsegment,
             |p.c_acctbal AS prof__c_acctbal, COALESCE(o.cnt, 0) AS orders__count
             |FROM customer c
             |LEFT JOIN customer p ON c.c_custkey = p.c_custkey
             |LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 1) o
             |  ON c.c_custkey = o.o_custkey""".stripMargin)),

    // C2 — JSON case flattener: nested array-of-struct groups → long-form
    //   child tables keyed by parent id
    //   (build_gdc_api_clinical_program_tables.py:749-843)
    "c2_json_flatten" -> Q(
      (s, dir) => {
        val orders = td(s, dir, "orders").select("o_orderkey", "o_orderstatus")
        val items = td(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"),
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        // build the nested shape the reference receives from the API …
        val nested = Clinical.nest(orders, items, "o_orderkey",
          Seq("l_orderkey", "l_linenumber", "l_quantity"), "items")
        // … then flatten it back out; the "items" group is the child table
        Clinical.flattenNested(nested, "o_orderkey")("items")
          .select("o_orderkey", "l_linenumber", "l_quantity")
      },
      Some("""SELECT l_orderkey AS o_orderkey, l_linenumber, l_quantity FROM lineitem""".stripMargin)),

    // C3 — versioned publish workflow: publish → identical republish is
    //   skipped by the U3 diff gate → changed data bumps the version
    //   (create_modify.py:210-277; lookup.py:650-727)
    "c3_publish_workflow" -> Q(
      (s, dir) => {
        val root = s"/root/repo/target/publish_${new java.io.File(dir).getName}"
        // fresh root per run so version arithmetic is deterministic
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(root))
        val t1 = td(s, dir, "orders").groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("cnt"))
        val r1 = Publish.publish(s, t1, root, "status_census")
        val r2 = Publish.publish(s, t1, root, "status_census") // identical → skip
        assert(r1.published && r1.version == 1, s"first publish: $r1")
        assert(!r2.published && r2.version == 1, s"identical republish must skip: $r2")
        val t2 = t1.withColumn("cnt", col("cnt") + 1)
        val r3 = Publish.publish(s, t2, root, "status_census") // changed → v2
        assert(r3.published && r3.version == 2, s"changed publish: $r3")
        s.read.parquet(s"$root/status_census_current")
      },
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) + 1 AS cnt
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // C8 — {---tag-key---} metadata templating (create_modify.py:525-711)
    "c8_metadata_template" -> Q(
      (s, dir) => {
        val meta = Publish.templateMetadata(
          Map("friendly_name" -> "{---program---} clinical ({---release---})",
            "description" -> "Release {---release---} of {---program---}."),
          Map("program" -> "TCGA", "release" -> "r42"))
        import s.implicits._
        meta.toSeq.sortBy(_._1).toDF("meta_key", "meta_value")
      },
      Some("""SELECT * FROM (VALUES
             |('description', 'Release r42 of TCGA.'),
             |('friendly_name', 'TCGA clinical (r42)')) t(meta_key, meta_value)""".stripMargin)),

    // C16 — gene authority-record parser (quant_data_matrix_pdc.py:382-410):
    //   "AUTH:ID; AUTH2:ID2" → the single non-MGI record. Fixture rotates
    //   through the reference's cases: plain HGNC, HGNC+MGI (MGI excluded),
    //   MGI-only (→ nulls), empty (→ nulls), duplicate HGNC (dict last-wins
    //   gene_id, counted once). The oracle derives the EXPECTED outputs
    //   independently from the same case split — it does not re-parse.
    "c16_authority_parse" -> Q(
      (s, dir) => {
        import graft.clinical.UniProt
        val k = col("c_custkey")
        val id = k.cast("string")
        val auth = when(k % 5 === 0, concat(lit("HGNC:"), id))
          .when(k % 5 === 1, concat(lit("HGNC:"), id, lit("; MGI:"), id))
          .when(k % 5 === 2, concat(lit("MGI:"), id))
          .when(k % 5 === 3, lit(""))
          .otherwise(concat(lit("HGNC:"), id, lit("; HGNC:"), id, lit("X")))
        td(s, dir, "customer")
          .select(k.as("custkey"), UniProt.parseAuthority(auth).as("a"))
          .select(col("custkey"), col("a.authority").as("authority"),
            col("a.authority_gene_id").as("authority_gene_id"),
            col("a.n_records").as("n_records"))
      },
      Some("""SELECT c_custkey AS custkey,
             |CASE WHEN c_custkey % 5 IN (0, 1, 4) THEN 'HGNC' END AS authority,
             |CASE WHEN c_custkey % 5 IN (0, 1) THEN CAST(c_custkey AS VARCHAR)
             |     WHEN c_custkey % 5 = 4 THEN CAST(c_custkey AS VARCHAR) || 'X' END AS authority_gene_id,
             |CAST(CASE WHEN c_custkey % 5 IN (0, 1, 4) THEN 1 ELSE 0 END AS BIGINT) AS n_records
             |FROM customer""".stripMargin)),

    // C17 — DCF indexd-manifest URL splitter + hg19/hg38 combined file map
    //   (build_dcf_manifest_bq_tables.py:42-140). Fixture rotates through
    //   the reference's cases: full 3-url list / gs-only list / s3+https
    //   list / bare un-bracketed url, crossed with open / phs-controlled /
    //   controlled ACLs and a "controlled"-named bucket. The oracle derives
    //   the EXPECTED routing from the same case split — it does not
    //   re-parse the list literal.
    "c17_dcf_manifest" -> Q(
      (s, dir) => {
        val k = col("k")
        val id = concat(lit("f"), k.cast("string"))
        val bucket = when(k % 5 === 0, "gdc-controlled-arch").otherwise("gdc-open-arch")
        val acl = when(k % 3 === 0, "open")
          .when(k % 3 === 1, "open,phs000178")
          .otherwise("controlled")
        val web = concat(lit("https://api.gdc.example/data/"), id)
        val gs = concat(lit("gs://"), bucket, lit("/"), id)
        val s3u = concat(lit("s3://"), bucket, lit("/"), id)
        val indexd = when(k % 4 === 0,
            concat(lit("['"), web, lit("', '"), gs, lit("', '"), s3u, lit("']")))
          .when(k % 4 === 1, concat(lit("['"), gs, lit("']")))
          .when(k % 4 === 2, concat(lit("['"), s3u, lit("', '"), web, lit("']")))
          .otherwise(gs)
        val manifest = td(s, dir, "orders")
          .select(col("o_orderkey").as("k"))
          .select(k, id.as("id"), acl.as("acl"), indexd.as("indexd_url"))
        val legacy = manifest.filter(k % 2 === 1).drop("k") // hg19
        val active = manifest.filter(k % 2 === 0).drop("k") // hg38
        DcfManifest.combinedFileMap(legacy, active)
      },
      Some("""SELECT 'f' || CAST(o_orderkey AS VARCHAR) AS file_gdc_id,
             |CASE WHEN o_orderkey % 4 IN (0, 1, 3) AND o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
             |     THEN 'gs://gdc-open-arch/f' || CAST(o_orderkey AS VARCHAR) END AS file_gdc_url,
             |CASE WHEN o_orderkey % 4 IN (0, 2) AND o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
             |     THEN 's3://gdc-open-arch/f' || CAST(o_orderkey AS VARCHAR) END AS file_gdc_url_aws,
             |CASE WHEN o_orderkey % 4 IN (0, 2)
             |     THEN 'https://api.gdc.example/data/f' || CAST(o_orderkey AS VARCHAR) END AS file_gdc_url_web
             |FROM orders""".stripMargin)),

    // C18 — PDC clinical case assembly: 1:1 demographic merge (dup record →
    //   deterministic highest-demographic_id winner), diagnoses count per
    //   case, no-clinical-data exclusion, per-project max-diagnosis shape
    //   decision with single-diagnosis inlining
    //   (build_pdc_clinical.py:466-620). Oracle replays the same dict-merge
    //   semantics as a CTE stack.
    "c18_pdc_clinical_merge" -> Q(
      (s, dir) => {
        val cust = td(s, dir, "customer")
        val k = col("c_custkey")
        val caseId = concat(lit("c"), k.cast("string"))
        val subjId = concat(lit("SUBJ-"), k.cast("string"))
        val cases = cust.select(
          caseId.as("case_id"), subjId.as("case_submitter_id"),
          concat(lit("PDC_N"), col("c_nationkey").cast("string")).as("project_submitter_id"),
          col("c_mktsegment").as("primary_site"),
          concat(lit("DT-"), (k % 4).cast("string")).as("disease_type"))
        val withDemo = cust.filter(k % 7 =!= 0)
        val demoA = withDemo.select(
          caseId.as("case_id"), subjId.as("case_submitter_id"),
          concat(lit("d"), k.cast("string")).as("demographic_id"),
          when(k % 2 === 0, "female").otherwise("male").as("gender"),
          concat(lit("R"), (k % 3).cast("string")).as("race"))
        val demoB = withDemo.filter(k % 11 === 0).select(
          caseId.as("case_id"), subjId.as("case_submitter_id"),
          concat(lit("d"), k.cast("string"), lit("z")).as("demographic_id"),
          lit("unknown").as("gender"), lit("R9").as("race"))
        val diagnoses = td(s, dir, "orders")
          .filter(col("o_orderkey") % 5 === 0)
          .select(
            concat(lit("c"), col("o_custkey").cast("string")).as("case_id"),
            concat(lit("SUBJ-"), col("o_custkey").cast("string")).as("case_submitter_id"),
            concat(lit("PD-"), col("o_orderstatus")).as("primary_diagnosis"))
        PdcClinical.mergeCaseClinical(
            cases, demoA.unionByName(demoB), diagnoses, Seq("primary_diagnosis"))
          .select("project_submitter_id", "case_id", "case_submitter_id",
            "gender", "race", "diagnosis_count", "project_max_diag",
            "primary_diagnosis")
      },
      Some("""WITH cases AS (
             |  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS case_id,
             |         'SUBJ-' || CAST(c_custkey AS VARCHAR) AS case_submitter_id,
             |         'PDC_N' || CAST(c_nationkey AS VARCHAR) AS project_submitter_id,
             |         c_custkey AS k
             |  FROM customer),
             |demo AS (
             |  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS case_id,
             |         CASE WHEN c_custkey % 11 = 0 THEN 'unknown'
             |              WHEN c_custkey % 2 = 0 THEN 'female' ELSE 'male' END AS gender,
             |         CASE WHEN c_custkey % 11 = 0 THEN 'R9'
             |              ELSE 'R' || CAST(c_custkey % 3 AS VARCHAR) END AS race
             |  FROM customer WHERE c_custkey % 7 <> 0),
             |diag AS (
             |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS diagnosis_count,
             |         max('PD-' || o_orderstatus) AS pd
             |  FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1),
             |f AS (
             |  SELECT c.project_submitter_id, c.case_id, c.case_submitter_id,
             |         d.gender, d.race,
             |         COALESCE(g.diagnosis_count, 0) AS diagnosis_count, g.pd
             |  FROM cases c
             |  LEFT JOIN demo d USING (case_id)
             |  LEFT JOIN diag g ON g.o_custkey = c.k
             |  WHERE d.gender IS NOT NULL OR COALESCE(g.diagnosis_count, 0) > 0),
             |pm AS (
             |  SELECT project_submitter_id, max(diagnosis_count) AS project_max_diag
             |  FROM f GROUP BY 1)
             |SELECT f.project_submitter_id, f.case_id, f.case_submitter_id,
             |       f.gender, f.race, f.diagnosis_count, pm.project_max_diag,
             |       CASE WHEN pm.project_max_diag = 1 AND f.diagnosis_count = 1
             |            THEN f.pd END AS primary_diagnosis
             |FROM f JOIN pm USING (project_submitter_id)""".stripMargin)),

    // C19 — SCD2 dimension maintenance (Kimball type-2 MERGE-with-history):
    //   history = customer dimension at valid_from=0; the update batch
    //   mixes changed attributes (%5: segment renamed → close + reopen),
    //   NO-OP updates (%3 minus the %5 overlap: identical segment → row
    //   untouched, no spurious version), and brand-new keys (+1000000 for
    //   %7: open rows). The oracle derives every branch from the same
    //   residue split — it never replays the join
    "c19_scd2_history" -> Q(
      (s, dir) => {
        val cust = td(s, dir, "customer")
        val hist = cust.select(col("c_custkey").as("k"),
          col("c_mktsegment").as("segment"),
          lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
          lit(true).as("is_current"))
        val changedU = cust.filter(col("c_custkey") % 5 === 0)
          .select(col("c_custkey").as("k"),
            concat(col("c_mktsegment"), lit("-NEW")).as("segment"))
        val noopU = cust.filter(col("c_custkey") % 3 === 0 && col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"))
        // fresh keys sit at +1e9: OUTSIDE any replica keyspace (ScaleUp
        // shifts custkeys by r*1e6 per replica, so a +1e6 offset collided
        // with replica r+1's keys at sf1 — caught by the round-12 sf1
        // hash gate as a row-count mismatch; fixture bug, not engine bug)
        val freshU = cust.filter(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000000L).as("k"), lit("FRESH").as("segment"))
        val updates = changedU.unionByName(noopU).unionByName(freshU)
        graft.ops.Scd.scd2Apply(hist, updates, "k", Seq("segment"), batchTs = 100L)
      },
      Some("""WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer)
             |SELECT k, seg AS segment,
             |  CAST(0 AS BIGINT) AS valid_from,
             |  CAST(CASE WHEN k % 5 = 0 THEN 100 END AS BIGINT) AS valid_to,
             |  k % 5 <> 0 AS is_current
             |FROM c
             |UNION ALL
             |SELECT k, seg || '-NEW', CAST(100 AS BIGINT), CAST(NULL AS BIGINT), true
             |FROM c WHERE k % 5 = 0
             |UNION ALL
             |SELECT k + 1000000000, 'FRESH', CAST(100 AS BIGINT), CAST(NULL AS BIGINT), true
             |FROM c WHERE k % 7 = 0""".stripMargin)),

    // c20 — type-1 keyed MERGE (MERGE INTO … WHEN MATCHED UPDATE/DELETE
    // WHEN NOT MATCHED INSERT): the current-state upsert next to c19's
    // history-keeping SCD2. One full-outer join + one projection; the
    // oracle is the CLOSED FORM of the disjoint update/delete/insert
    // batches (k%3 update, k%7 delete, k%5 spawns a new key), exact
    // integer cents for the balance
    "c20_merge_upsert" -> Q(
      (s, dir) => {
        val cust = td(s, dir, "customer")
        val target = cust.select(col("c_custkey").as("k"),
          col("c_mktsegment").as("segment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        val updates = cust.filter(col("c_custkey") % 3 === 0 && col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey").as("k"), lit("U").as("op"),
            concat(col("c_mktsegment"), lit("-U")).as("segment"),
            (round(col("c_acctbal") * 100).cast("long") + 100L).as("bal_cents"))
        val deletes = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("k"), lit("D").as("op"),
            lit(null).cast("string").as("segment"), lit(null).cast("long").as("bal_cents"))
        // +1e9 insert keys for the same replica-keyspace reason as c19
        val inserts = cust.filter(col("c_custkey") % 5 === 0)
          .select((col("c_custkey") + 1000000000L).as("k"), lit("U").as("op"),
            lit("INS").as("segment"), lit(0L).as("bal_cents"))
        val source = updates.unionByName(deletes).unionByName(inserts)
        graft.ops.Scd.mergeUpsert(target, source, "k",
          Seq("segment", "bal_cents"), opCol = "op")
      },
      Some("""WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
             |    CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer)
             |SELECT k,
             |  CASE WHEN k % 3 = 0 THEN seg || '-U' ELSE seg END AS segment,
             |  CASE WHEN k % 3 = 0 THEN bal + 100 ELSE bal END AS bal_cents,
             |  CASE WHEN k % 3 = 0 THEN 'updated' ELSE 'kept' END AS action
             |FROM c WHERE k % 7 <> 0
             |UNION ALL
             |SELECT k + 1000000000, 'INS', CAST(0 AS BIGINT), 'inserted'
             |FROM c WHERE k % 5 = 0""".stripMargin)),

    // ontology ancestor closure (ops/Graph.ancestorClosure): hierarchical
    // clinical codings roll cases up to EVERY ancestor term. Synthetic
    // forest over part: child k ≥ 8 points to parent k div 8 (roots 1..7),
    // ~log₈ n deep. Pointer doubling closes it in ⌈log₂ depth⌉ rounds of
    // two equi-joins; the oracle walks the same edges one level per
    // recursive-CTE step. eager: localCheckpoint materializes per round
    "c21_hierarchy_closure" -> Q(
      (s, dir) => graft.ops.Graph.ancestorClosure(
        td(s, dir, "part").filter(col("p_partkey") >= 8)
          .select(col("p_partkey").as("c"), expr("p_partkey div 8").as("p")),
        "c", "p", maxDepth = 16),
      Some("""WITH RECURSIVE e AS (SELECT p_partkey AS node,
             |    p_partkey // 8 AS anc FROM part WHERE p_partkey >= 8),
             |cl AS (
             |  SELECT node, anc, CAST(1 AS BIGINT) AS dist FROM e
             |  UNION ALL
             |  SELECT cl.node, e.anc, cl.dist + 1
             |  FROM cl JOIN e ON cl.anc = e.node WHERE cl.dist < 16)
             |SELECT node, anc, dist FROM cl""".stripMargin),
      eager = true),

    // (c28 is an intentional gap — never assigned; the id was skipped in
    // round 10's registration sequence and is tombstoned here so audits
    // don't hunt for a missing row. Next free clinical id: c31.)
    // c29 — LATE-ARRIVING dimension repair (Kimball early-arriving
    // facts): facts referencing a not-yet-loaded member get an INFERRED
    // placeholder so the join resolves; when the real row arrives it is
    // ENRICHED in place. Lanes: k%3=0 initial load ('loaded'), k%3=1
    // arrives late ('enriched' where referenced by a fact), k%3=2 never
    // arrives ('inferred'). Key-partitioned equi joins only; the fact
    // side enters as a DISTINCT key set, never fact rows
    "c29_late_arriving_dim" -> Q(
      (s, dir) => {
        val cust = td(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        graft.ops.Scd.lateArrivingDimension(
          dim = cust.filter(col("k") % 3 === 0),
          facts = td(s, dir, "orders").select(col("o_custkey").as("k")),
          lateDim = cust.filter(col("k") % 3 === 1),
          key = "k", attrCols = Seq("seg"))
      },
      Some("""WITH dim0 AS (SELECT c_custkey AS k, c_mktsegment AS seg
             |  FROM customer WHERE c_custkey % 3 = 0),
             |late AS (SELECT c_custkey AS k, c_mktsegment AS seg
             |  FROM customer WHERE c_custkey % 3 = 1),
             |fk AS (SELECT DISTINCT o_custkey AS k FROM orders),
             |inf AS (SELECT fk.k FROM fk LEFT JOIN dim0 USING (k)
             |  WHERE dim0.k IS NULL)
             |SELECT k, seg, 'loaded' AS status FROM dim0
             |UNION ALL
             |SELECT i.k, l.seg,
             |  CASE WHEN l.k IS NULL THEN 'inferred' ELSE 'enriched' END AS status
             |FROM inf i LEFT JOIN late l USING (k)""".stripMargin)),

    // c23 — CDC changelog apply (Scd.cdcApply): a MULTI-op change stream
    // (I, then up to two Us, then maybe a D per key — strictly monotone
    // seq) compacts to each key's latest op in ONE max_by hash-agg (no
    // window sort), then folds into the current-state target with c20's
    // merge semantics. Lanes: k%9 two-update chain (latest wins over
    // middle), k%3 one update, k%5 delete (kills keys the SAME batch
    // inserted), k%7 absent from the changelog (target rows pass through
    // as 'kept'), even keys absent from the target ('inserted'). The
    // oracle is the closed form of those disjoint lanes — exact integer
    // cents throughout
    "c23_cdc_apply" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders").select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val chgKeys = o.filter(col("k") % 7 =!= 0)
        val ins = chgKeys.select(col("k"), lit(1L).as("seq"), lit("I").as("op"),
          col("st").as("status"), col("cents").as("total_cents"))
        val upA = chgKeys.filter(col("k") % 3 === 0)
          .select(col("k"), lit(2L).as("seq"), lit("U").as("op"),
            concat(col("st"), lit("-A")).as("status"),
            (col("cents") + 500L).as("total_cents"))
        val upB = chgKeys.filter(col("k") % 9 === 0)
          .select(col("k"), lit(3L).as("seq"), lit("U").as("op"),
            concat(col("st"), lit("-B")).as("status"),
            (col("cents") + 700L).as("total_cents"))
        val del = chgKeys.filter(col("k") % 5 === 0)
          .select(col("k"), lit(4L).as("seq"), lit("D").as("op"),
            lit(null).cast("string").as("status"),
            lit(null).cast("long").as("total_cents"))
        val changelog = ins.unionByName(upA).unionByName(upB).unionByName(del)
        val target = o.filter(col("k") % 2 === 1)
          .select(col("k"), col("st").as("status"), col("cents").as("total_cents"))
        graft.ops.Scd.cdcApply(target, changelog, "k", "seq", "op",
          Seq("status", "total_cents"))
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
             |chg AS (SELECT k,
             |    CASE WHEN k%9=0 THEN st || '-B'
             |         WHEN k%3=0 THEN st || '-A' ELSE st END AS status,
             |    CASE WHEN k%9=0 THEN cents+700
             |         WHEN k%3=0 THEN cents+500 ELSE cents END AS total_cents
             |  FROM o WHERE k%7<>0 AND k%5<>0)
             |SELECT k, status, total_cents,
             |  CASE WHEN k%2=1 THEN 'updated' ELSE 'inserted' END AS action
             |FROM chg
             |UNION ALL
             |SELECT k, st AS status, cents AS total_cents, 'kept' AS action
             |FROM o WHERE k%2=1 AND k%7=0""".stripMargin)),

    // c24 — config-driven expectation gate (ops/Expectations.gate): the
    // declarative pre-publish QC table (dbt-test / Great-Expectations
    // core vocabulary) evaluated in ONE scan — every rule is one
    // conditional aggregate in a single hash-agg; uniqueness rides the
    // same pass via a distinct count. Mixed pass/fail lanes on orders:
    // the key is unique (pass), custkey is not (fail with the exact
    // duplicate count), a deliberately tight price range and a
    // two-priority regex fail with counts the oracle recomputes from
    // the table, status accepted-set counts the 'P' rows
    "c24_expectation_gate" -> Q(
      (s, dir) => {
        import graft.ops.Expectations._
        gate(
          td(s, dir, "orders").withColumn("total_cents",
            round(col("o_totalprice") * 100).cast("long")),
          Seq(
            ExpectNotNull("r1_date_present", "o_orderdate"),
            ExpectUnique("r2_key_unique", "o_orderkey"),
            ExpectUnique("r3_cust_unique", "o_custkey"),
            ExpectInRange("r4_price_cap", "total_cents", 0L, 20000000L),
            ExpectMatches("r5_prio_12", "o_orderpriority", "^[12]-"),
            ExpectInSet("r6_status_of", "o_orderstatus", Seq("O", "F"))))
      },
      Some("""WITH o AS (SELECT *, CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
             |  FROM orders),
             |v AS (
             |  SELECT 'r1_date_present' AS rule_id, 'not_null' AS kind,
             |    'o_orderdate' AS col_name,
             |    CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT) AS violations
             |  FROM o
             |  UNION ALL
             |  SELECT 'r2_key_unique', 'unique', 'o_orderkey',
             |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM o
             |  UNION ALL
             |  SELECT 'r3_cust_unique', 'unique', 'o_custkey',
             |    CAST(count(o_custkey) - count(DISTINCT o_custkey) AS BIGINT) FROM o
             |  UNION ALL
             |  SELECT 'r4_price_cap', 'in_range', 'total_cents',
             |    CAST(count(CASE WHEN total_cents IS NOT NULL
             |      AND (total_cents < 0 OR total_cents > 20000000) THEN 1 END) AS BIGINT)
             |  FROM o
             |  UNION ALL
             |  SELECT 'r5_prio_12', 'matches', 'o_orderpriority',
             |    CAST(count(CASE WHEN o_orderpriority IS NOT NULL
             |      AND NOT regexp_matches(o_orderpriority, '^[12]-') THEN 1 END) AS BIGINT)
             |  FROM o
             |  UNION ALL
             |  SELECT 'r6_status_of', 'in_set', 'o_orderstatus',
             |    CAST(count(CASE WHEN o_orderstatus IS NOT NULL
             |      AND o_orderstatus NOT IN ('O', 'F') THEN 1 END) AS BIGINT)
             |  FROM o)
             |SELECT rule_id, kind, col_name, violations,
             |  (SELECT CAST(count(*) AS BIGINT) FROM o) AS n,
             |  violations = 0 AS pass
             |FROM v""".stripMargin)),

    // c25 — referential-integrity audit (Expectations.refGate): the dbt
    // `relationships` test over lineitem in ONE child scan — each rule
    // left-joins its broadcast distinct parent key set and feeds one
    // conditional aggregate. Lanes: orderkey→orders and suppkey→supplier
    // hold (pass); partkey checked against a deliberately truncated part
    // subset (p_partkey % 3 = 0) counts the orphans exactly
    "c25_fk_audit" -> Q(
      (s, dir) => {
        import graft.ops.Expectations._
        refGate(td(s, dir, "lineitem"), Seq(
          ExpectForeignKey("fk_order", "l_orderkey", td(s, dir, "orders"), "o_orderkey"),
          ExpectForeignKey("fk_part_subset", "l_partkey",
            td(s, dir, "part").filter(col("p_partkey") % 3 === 0), "p_partkey"),
          ExpectForeignKey("fk_supp", "l_suppkey", td(s, dir, "supplier"), "s_suppkey")))
      },
      Some("""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
             |v AS (
             |  SELECT 'fk_order' AS rule_id, 'l_orderkey' AS col_name,
             |    CAST(count(CASE WHEN l_orderkey IS NOT NULL AND l_orderkey NOT IN
             |      (SELECT o_orderkey FROM orders) THEN 1 END) AS BIGINT) AS violations
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'fk_part_subset', 'l_partkey',
             |    CAST(count(CASE WHEN l_partkey IS NOT NULL AND l_partkey NOT IN
             |      (SELECT p_partkey FROM part WHERE p_partkey % 3 = 0) THEN 1 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'fk_supp', 'l_suppkey',
             |    CAST(count(CASE WHEN l_suppkey IS NOT NULL AND l_suppkey NOT IN
             |      (SELECT s_suppkey FROM supplier) THEN 1 END) AS BIGINT)
             |  FROM lineitem)
             |SELECT rule_id, 'foreign_key' AS kind, col_name, violations,
             |  (SELECT n FROM n) AS n, violations = 0 AS pass
             |FROM v""".stripMargin)),

    // c26 — retention VACUUM for the publish lifecycle (Publish
    // .vacuumPlan/vacuum — the Delta-VACUUM shape split into auditable
    // pure PLAN + destructive APPLY): 4 pointer-mode publishes, then
    // keepLast=2 with no age grace — v1/v2 expire and are deleted from
    // disk, v3 keeps as last-n, v4 keeps as current (pointer precedence
    // over last-n). The query asserts post-vacuum readability of the
    // survivors and the deletion of the expired dirs, then returns the
    // decision table; eager: publishes + deletes run at construction
    "c26_publish_vacuum" -> Q(
      (s, dir) => {
        import graft.publish.Publish
        val root = s"/root/repo/target/vacuum_${new java.io.File(dir).getName}"
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(root))
        val base = td(s, dir, "orders").groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("cnt"))
        (1 to 4).foreach { i =>
          Publish.publish(s, base.withColumn("cnt", col("cnt") + i),
            root, "census", Publish.PointerCurrent)
        }
        val plan = Publish.vacuum(root, "census", keepLast = 2,
          minAgeMs = 0L, nowMs = System.currentTimeMillis())
        assert(!new java.io.File(s"$root/census_v1").exists(), "v1 must be gone")
        assert(!new java.io.File(s"$root/census_v2").exists(), "v2 must be gone")
        assert(Publish.readVersion(s, root, "census", 3).count() > 0, "v3 time travel")
        assert(Publish.readCurrent(s, root, "census").count() > 0, "current intact")
        import s.implicits._
        plan.map(d => (d.version.toLong, d.action, d.reason))
          .toDF("version", "action", "reason")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'delete', 'expired'),
             |  (CAST(2 AS BIGINT), 'delete', 'expired'),
             |  (CAST(3 AS BIGINT), 'keep', 'last-n'),
             |  (CAST(4 AS BIGINT), 'keep', 'current'))
             |t(version, action, reason)""".stripMargin),
      eager = true),

    // c27 — SCHEMA diff (Diff.schemaDiff): the column-level publish gate
    // the reference's compare runs before any row diff — a dropped column
    // or type change is a breaking release even when surviving rows
    // match. Pure metadata (LocalTableScan, no data job); fixture evolves
    // orders by dropping, adding, and type-widening one column each
    "c27_schema_diff" -> Q(
      (s, dir) => {
        val base = td(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
        val next = base.drop("o_orderpriority")
          .withColumn("o_totalprice", col("o_totalprice").cast("string"))
          .withColumn("o_tags", lit("x"))
        graft.ops.Diff.schemaDiff(base, next)
      },
      Some("""SELECT * FROM (VALUES
             |  ('o_orderkey', 'unchanged', 'bigint', 'bigint'),
             |  ('o_orderpriority', 'removed', 'string', NULL),
             |  ('o_orderstatus', 'unchanged', 'string', 'string'),
             |  ('o_tags', 'added', NULL, 'string'),
             |  ('o_totalprice', 'type_changed', 'double', 'string'))
             |t(col_name, status, type_old, type_new)""".stripMargin)),

    // c30 — policy-driven COLUMN MASKING for publication (the engine-side
    // form of BigQuery's column-level masking the reference leaves to
    // warehouse view ACLs): salted-hash pseudonym (still joinable),
    // last-4 display mask, typed-NULL redaction, and numeric bucket
    // generalization (pmod floor — exact on negative balances), applied
    // as one expression-only projection so the masked release is a real
    // diffable table. Oracle replays every mode: sha256 prefix, repeat/
    // right padding, NULL typing, and the positive-mod bucket arithmetic
    "c30_column_masking" -> Q(
      (s, dir) => {
        import graft.publish.Masking, Masking.MaskMode._
        val base = td(s, dir, "customer").select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        Masking.applyMasks(base, Seq(
          "c_name" -> Hash("rel7:"),
          "c_nationkey" -> Redact,
          "c_mktsegment" -> Last4,
          "bal_cents" -> Bucket(10000L)))
      },
      Some("""SELECT c_custkey,
             |  substr(sha256('rel7:' || c_name), 1, 16) AS c_name,
             |  CAST(NULL AS INTEGER) AS c_nationkey,
             |  CASE WHEN length(c_mktsegment) <= 4
             |       THEN repeat('*', length(c_mktsegment))
             |       ELSE repeat('*', length(c_mktsegment) - 4)
             |            || right(c_mktsegment, 4) END AS c_mktsegment,
             |  CAST(round(c_acctbal * 100) AS BIGINT)
             |    - ((CAST(round(c_acctbal * 100) AS BIGINT) % 10000 + 10000) % 10000)
             |    AS bal_cents
             |FROM customer""".stripMargin))
  )
}
