package graft.queries

import org.apache.spark.sql.functions._
import graft.clinical.{Clinical, DcfManifest, EntitySpec, PdcClinical}
import graft.publish.Publish
import Registry.{td, tdw}

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
        val manifest = tdw(s, dir, "orders")
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

  )
}
