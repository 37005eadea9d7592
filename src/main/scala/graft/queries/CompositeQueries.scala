package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Agg, Diff}
import Registry.{td, tdw}

/**
 * SURVEY §2.10 — composite pipeline operators ("macros"): diff/QC report
 * (C4), quant matrix melt (C5), dedup-by-status (C6), manifest builder (C7),
 * MAF multi-caller merge (S18). The clinical flatteners (C1/C2) live in
 * graft.clinical with their own registrations.
 */
object CompositeQueries {

  val all: Seq[(String, Q)] = Seq(

    // C4 — diff/QC reporter (compare_and_publish_tables.py:45-400):
    //   added/removed/changed keys + duplicate-key census in one report
    "c4_diff_qc_report" -> Q(
      (s, dir) => {
        val orders = td(s, dir, "orders")
        val old = orders.filter(col("o_orderkey") % 7 =!= 0).select(
          col("o_orderkey"),
          when(col("o_orderkey") % 11 === 0, lit("MUT")).otherwise(col("o_orderstatus")).as("o_orderstatus"))
        val neu = orders.select("o_orderkey", "o_orderstatus")
        val added = Diff.addedRows(old, neu, Seq("o_orderkey"))
          .select(lit("added").as("check"), col("o_orderkey"))
        val removed = Diff.removedRows(old, neu, Seq("o_orderkey"))
          .select(lit("removed").as("check"), col("o_orderkey"))
        val changed = Diff.changedKeys(old, neu, Seq("o_orderkey"))
          .select(lit("changed").as("check"), col("o_orderkey"))
        val dups = Diff.duplicateKeys(td(s, dir, "lineitem"), Seq("l_orderkey"))
          .filter(col("cnt") >= 6)
          .select(lit("dup_key").as("check"), col("l_orderkey").as("o_orderkey"))
        added.unionByName(removed).unionByName(changed).unionByName(dups)
      },
      Some("""WITH old AS (SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 THEN 'MUT' ELSE o_orderstatus END AS o_orderstatus
             |  FROM orders WHERE o_orderkey % 7 <> 0),
             |neu AS (SELECT o_orderkey, o_orderstatus FROM orders)
             |SELECT 'added' AS "check", o_orderkey FROM neu WHERE o_orderkey NOT IN (SELECT o_orderkey FROM old)
             |UNION ALL SELECT 'removed', o_orderkey FROM old WHERE o_orderkey NOT IN (SELECT o_orderkey FROM neu)
             |UNION ALL (SELECT 'changed', o_orderkey FROM (SELECT * FROM old EXCEPT SELECT * FROM neu)
             |  INTERSECT SELECT 'changed', o_orderkey FROM (SELECT * FROM neu EXCEPT SELECT * FROM old))
             |UNION ALL SELECT 'dup_key', l_orderkey FROM lineitem GROUP BY 2 HAVING count(*) >= 6""".stripMargin)),

    // C5 — quant matrix melt (quant_data_matrix_pdc.py:443-912): wide
    //   gene×aliquot matrix → long form. Built here as pivot → unpivot;
    //   nulls dropped on both sides (DuckDB UNPIVOT semantics).
    "c5_matrix_melt" -> Q(
      (s, dir) => {
        val wide = td(s, dir, "lineitem").groupBy("l_orderkey")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(col("l_quantity").cast("decimal(18,6)")).cast("double"))
        wide.unpivot(Array(col("l_orderkey")),
            Array(col("A"), col("N"), col("R")), "flag", "qty")
          .filter(col("qty").isNotNull)
      },
      Some("""WITH w AS (SELECT l_orderkey,
             |  CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS a_qty,
             |  CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS n_qty,
             |  CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS r_qty
             |  FROM lineitem GROUP BY 1)
             |SELECT l_orderkey, 'A' AS flag, a_qty AS qty FROM w WHERE a_qty IS NOT NULL
             |UNION ALL SELECT l_orderkey, 'N', n_qty FROM w WHERE n_qty IS NOT NULL
             |UNION ALL SELECT l_orderkey, 'R', r_qty FROM w WHERE r_qty IS NOT NULL""".stripMargin)),

    // C6 — dedup-by-status: reviewed-beats-unreviewed via anti-join + UNION
    //   (quant_data_matrix_pdc.py:134-159)
    "c6_dedup_by_status" -> Q(
      (s, dir) => {
        val orders = td(s, dir, "orders")
        val reviewed = orders.filter(col("o_orderstatus") === "O")
        val unreviewedOnly = orders.filter(col("o_orderstatus") =!= "O")
          .join(reviewed.select(col("o_custkey").as("rk")).distinct(),
            col("o_custkey") === col("rk"), "left_anti")
        reviewed.select("o_orderkey", "o_custkey", "o_orderstatus")
          .unionByName(unreviewedOnly.select("o_orderkey", "o_custkey", "o_orderstatus"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
             |UNION ALL
             |SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
             |WHERE o_orderstatus <> 'O'
             |AND o_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin)),

    // C7 — release manifest builder (support.py:353-431): config filter →
    //   capped manifest → join to URL table
    "c7_manifest_builder" -> Q(
      (s, dir) => {
        val manifest = td(s, dir, "events")
          .filter(col("event_type").isin("click", "view"))
          .orderBy(col("event_id")).limit(100)
        manifest.select(col("event_id"),
          concat(lit("store://media/"), col("user_id").cast("string"),
            lit("/"), col("event_id").cast("string")).as("url"))
      },
      Some("""WITH m AS (SELECT event_id, user_id FROM events
             |  WHERE event_type IN ('click','view') ORDER BY event_id LIMIT 100)
             |SELECT event_id, 'store://media/' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id AS VARCHAR) AS url
             |FROM m""".stripMargin)),

    // S18 — MAF multi-caller merge (common_etl/support.py:64-306):
    //   fingerprint-keyed merge across callers, '|'-joined disagreements
    "s18_maf_caller_merge" -> Q(
      (s, dir) => {
        val l = tdw(s, dir, "lineitem")
        val caller1 = l.select(col("l_orderkey"), col("l_linenumber"),
          lit("caller1").as("caller"), col("l_returnflag").as("v"))
        val caller2 = l.select(col("l_orderkey"), col("l_linenumber"),
          lit("caller2").as("caller"), col("l_linestatus").as("v"))
        caller1.unionByName(caller2)
          .groupBy("l_orderkey", "l_linenumber")
          .agg(Agg.stringAggDistinctOrdered(col("v"), "|").as("merged"),
            countDistinct(col("caller")).cast("long").as("n_callers"))
      },
      Some("""WITH u AS (
             |  SELECT l_orderkey, l_linenumber, 'caller1' AS caller, l_returnflag AS v FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'caller2', l_linestatus FROM lineitem)
             |SELECT l_orderkey, l_linenumber,
             |string_agg(DISTINCT v, '|' ORDER BY v) AS merged,
             |CAST(count(DISTINCT caller) AS BIGINT) AS n_callers
             |FROM u GROUP BY 1, 2""".stripMargin)),

    // C22 — quantile normalization (Bolstad 2003; StagedBuilds
    //   .quantileNormalize): equalize per-sample value distributions in
    //   the quant matrix the c5 melt produces. Sample = returnflag ×
    //   linestatus, gene = partkey, value = exact max cents. Total-order
    //   ranks (value, gene) → per-rank integer-micro mean → join back;
    //   one per-sample sort, one rank-skinny agg, one rank equi-join
    "c22_quantile_normalize" -> Q(
      (s, dir) => graft.pipelines.StagedBuilds.quantileNormalize(
        td(s, dir, "lineitem")
          .groupBy(concat(col("l_returnflag"), col("l_linestatus")).as("sample_id"),
            col("l_partkey").as("gene_id"))
          .agg(max(round(col("l_extendedprice") * 100)).cast("long").as("cents")),
        "sample_id", "gene_id", "cents"),
      Some("""WITH m AS (SELECT l_returnflag || l_linestatus AS sample_id,
             |    l_partkey AS gene_id,
             |    CAST(max(round(l_extendedprice * 100)) AS BIGINT) AS v
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT sample_id, gene_id, v,
             |    CAST(row_number() OVER (PARTITION BY sample_id
             |      ORDER BY v, gene_id) AS BIGINT) AS rk FROM m),
             |d AS (SELECT rk, CAST(sum(v) AS BIGINT) AS sv,
             |    CAST(count(*) AS BIGINT) AS m FROM r GROUP BY 1)
             |SELECT r.sample_id, r.gene_id, r.rk,
             |  CAST((d.sv * 1000000) // d.m AS BIGINT) AS ref_micro
             |FROM r JOIN d USING (rk)""".stripMargin))
  )
}
