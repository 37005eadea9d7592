package graft.queries

import org.apache.spark.sql.functions._
import graft.clinical.{Clinical, EntitySpec}
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
             |FROM customer""".stripMargin))
  )
}
