package graft.queries

import org.apache.spark.sql.functions._
import graft.pipelines.{PerSampleFile, StagedBuilds}
import graft.llm.Ann
import Registry.{td, tdw}

/**
 * Flagship reference pipeline shapes (SURVEY §7 minimum slice + §3.3
 * staged builds) over reference-shaped fixtures derived deterministically
 * from the testdata tables, plus the extended window surface and IVF ANN.
 */
object PipelineQueries {

  val all: Seq[(String, Q)] = Seq(

    // C9 — the GDC per-sample-file slice (per_sample_file_gdc.py:86-206):
    //   fm1/fm2 split, per-entity-type branch joins, UNION ALL, regexp
    //   suffix, CAST(NULL) placeholders
    "c9_per_sample_file" -> Q(
      (s, dir) => {
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus —
        // dedupe to one row per file id (min-aggregates are deterministic on
        // both engines) before deriving the reference-shaped fixtures.
        // LAZY localCheckpoint materializes the deduped base ONCE at first
        // action: it feeds both the file and fawe sides of the fm join, and
        // fm1 fans out to three branches — without it the shuffle+agg
        // re-executes up to 8× (once per branch per join side). Lazy so
        // plan-only consumers (Explain, PlanAuditSpec) don't trigger a job
        // at DataFrame construction. Local-mode storage is fine here; a
        // real cluster job would point this at a reliable checkpoint dir.
        val l = td(s, dir, "lineitem").groupBy("l_orderkey", "l_linenumber")
          .agg(min(col("l_partkey")).as("l_partkey"),
            min(col("l_suppkey")).as("l_suppkey"),
            min(col("l_quantity")).as("l_quantity"),
            min(col("l_returnflag")).as("l_returnflag"))
          .localCheckpoint(eager = false)
        val file = l.select(
          concat(lit("f"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("file_id"),
          concat(lit("f"), col("l_orderkey"), lit("-"), col("l_linenumber"), lit(".bam")).as("file_name"),
          when(col("l_quantity") > 25, lit("open")).otherwise(lit("controlled")).as("access"))
        val fawe = l.select(
          concat(lit("f"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("file_id"),
          when(col("l_returnflag") === "N" && col("l_linenumber") % 2 === 0,
            concat(lit("e"), col("l_partkey"), lit(";e"), col("l_suppkey")))
            .when(col("l_returnflag") === "R", concat(lit("e"), col("l_partkey")))
            .when(col("l_returnflag") === "A", concat(lit("s"), col("l_partkey")))
            .otherwise(concat(lit("c"), col("l_orderkey"))).as("entity_id"),
          concat(lit("TCGA-"), col("l_partkey"), lit("-"), col("l_suppkey")).as("entity_submitter_id"),
          when(col("l_returnflag") === "R", lit("aliquot"))
            .when(col("l_returnflag") === "A", lit("slide"))
            .otherwise(lit("case")).as("entity_type"))
        val p = td(s, dir, "part")
        val aliquotToCase = p.select(
          concat(lit("e"), col("p_partkey")).as("aliquot_gdc_id"),
          concat(lit("CB-"), col("p_partkey")).as("case_barcode"),
          concat(lit("SB-"), col("p_partkey")).as("sample_barcode"),
          col("p_type").as("sample_type_name"))
        val slideToCase = p.select(
          concat(lit("s"), col("p_partkey")).as("slide_gdc_id"),
          concat(lit("CB-"), col("p_partkey")).as("case_barcode"),
          concat(lit("SB-"), col("p_partkey")).as("sample_barcode"),
          col("p_brand").as("sample_type_name"))
        PerSampleFile.build(file, fawe, aliquotToCase, slideToCase)
      },
      Some("""WITH li AS (SELECT l_orderkey, l_linenumber, min(l_partkey) AS l_partkey,
             |  min(l_suppkey) AS l_suppkey, min(l_quantity) AS l_quantity,
             |  min(l_returnflag) AS l_returnflag FROM lineitem GROUP BY 1, 2),
             |file AS (SELECT 'f' || l_orderkey || '-' || l_linenumber AS file_id,
             |  'f' || l_orderkey || '-' || l_linenumber || '.bam' AS file_name,
             |  CASE WHEN l_quantity > 25 THEN 'open' ELSE 'controlled' END AS access,
             |  CASE WHEN l_returnflag = 'N' AND l_linenumber % 2 = 0 THEN 'e' || l_partkey || ';e' || l_suppkey
             |       WHEN l_returnflag = 'R' THEN 'e' || l_partkey
             |       WHEN l_returnflag = 'A' THEN 's' || l_partkey
             |       ELSE 'c' || l_orderkey END AS entity_id,
             |  'TCGA-' || l_partkey || '-' || l_suppkey AS entity_submitter_id,
             |  CASE l_returnflag WHEN 'R' THEN 'aliquot' WHEN 'A' THEN 'slide' ELSE 'case' END AS entity_type
             |  FROM li),
             |a2c AS (SELECT 'e' || p_partkey AS aliquot_gdc_id, 'CB-' || p_partkey AS case_barcode,
             |  'SB-' || p_partkey AS sample_barcode, p_type AS sample_type_name FROM part),
             |s2c AS (SELECT 's' || p_partkey AS slide_gdc_id, 'CB-' || p_partkey AS case_barcode,
             |  'SB-' || p_partkey AS sample_barcode, p_brand AS sample_type_name FROM part),
             |fm1 AS (SELECT * FROM file WHERE entity_id NOT LIKE '%;%'),
             |fm2 AS (SELECT file_id, file_name, access, 'multi' AS entity_id, entity_submitter_id,
             |  entity_type FROM file WHERE entity_id LIKE '%;%')
             |SELECT file_id, file_name, access, 'aliquot' AS entity_kind, case_barcode,
             |  sample_barcode, sample_type_name,
             |  regexp_extract(entity_submitter_id, '^[^-]*-(.*)$', 1) AS entity_suffix
             |FROM fm1 JOIN a2c ON entity_id = aliquot_gdc_id WHERE entity_type = 'aliquot'
             |UNION ALL
             |SELECT file_id, file_name, access, 'slide', case_barcode, sample_barcode,
             |  sample_type_name, regexp_extract(entity_submitter_id, '^[^-]*-(.*)$', 1)
             |FROM fm1 JOIN s2c ON entity_id = slide_gdc_id WHERE entity_type = 'slide'
             |UNION ALL
             |SELECT file_id, file_name, access, 'case',
             |  regexp_extract(entity_submitter_id, '^[^-]*-(.*)$', 1),
             |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             |  regexp_extract(entity_submitter_id, '^[^-]*-(.*)$', 1)
             |FROM (SELECT * FROM fm1 WHERE entity_type = 'case' UNION ALL SELECT * FROM fm2) u""".stripMargin)),

    // C10 — PDC quant-matrix pipeline: composite-key matrix → melt → key
    //   split → enrichment chain (quant_data_matrix_pdc.py:502-579, 631-662)
    "c10_quant_pipeline" -> Q(
      (s, dir) => {
        val l = td(s, dir, "lineitem")
        val bucketNames = (0 until 4).map(i => s"a$i:s$i")
        val wide = l.groupBy(concat(lit("G"), col("l_partkey")).as("Gene"))
          .pivot(concat(lit("a"), col("l_suppkey") % 4, lit(":s"), col("l_suppkey") % 4),
            bucketNames)
          .agg((sum(round(col("l_extendedprice") * 100).cast("long")) / lit(100.0)))
        val melted = StagedBuilds.meltQuantMatrix(wide, "Gene")
        import s.implicits._
        val runMeta = (0 until 4).map(i => (s"a$i", s"al$i")).toDF("aliquot_run_metadata_id", "aliquot_id")
        val aliquotSample = (0 until 4).map(i => (s"al$i", s"sm${i % 2}")).toDF("aliquot_id", "sample_id")
        val sampleCase = (0 until 2).map(i => (s"sm$i", s"case$i")).toDF("sample_id", "case_id")
        StagedBuilds.enrichQuant(melted, runMeta, aliquotSample, sampleCase)
          .select("gene_symbol", "aliquot_run_metadata_id", "aliquot_submitter_id",
            "aliquot_id", "sample_id", "case_id", "protein_abundance_log2ratio")
      },
      Some("""WITH w AS (SELECT 'G' || l_partkey AS gene_symbol, 'a' || (l_suppkey % 4) AS arm_id,
             |  's' || (l_suppkey % 4) AS sub_id,
             |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS v
             |  FROM lineitem GROUP BY 1, 2, 3),
             |maps AS (SELECT * FROM (VALUES ('a0','al0','sm0','case0'), ('a1','al1','sm1','case1'),
             |  ('a2','al2','sm0','case0'), ('a3','al3','sm1','case1'))
             |  t(arm_id, aliquot_id, sample_id, case_id))
             |SELECT w.gene_symbol, w.arm_id AS aliquot_run_metadata_id, w.sub_id AS aliquot_submitter_id,
             |  m.aliquot_id, m.sample_id, m.case_id, w.v AS protein_abundance_log2ratio
             |FROM w JOIN maps m ON w.arm_id = m.arm_id""".stripMargin)),

    // C11 — RNA-seq staged build: LEFT(file_name,36) expression join +
    //   artifact-gene filter + pooled-sample merge (RNA_seq.py:218-299)
    "c11_rna_seq_build" -> Q(
      (s, dir) => {
        val l = tdw(s, dir, "lineitem")
        val o = tdw(s, dir, "orders")
        val raw = l.select(
          concat(rpad(concat(lit("u"), col("l_orderkey")), 36, "x"), lit(".rna_seq.tsv")).as("file_name"),
          when(col("l_partkey") % 29 === 0, lit("__no_feature"))
            .otherwise(concat(lit("ENSG"), col("l_partkey"))).as("gene_id"),
          concat(lit("gene"), col("l_partkey")).as("gene_name"),
          col("l_quantity").cast("long").as("unstranded"),
          col("l_discount").as("tpm_unstranded"))
        val a2c = o.select(
          rpad(concat(lit("u"), col("o_orderkey")), 36, "x").as("file_gdc_id"),
          concat(lit("CB-"), col("o_custkey")).as("case_barcode"),
          concat(lit("SB-"), col("o_orderkey") % 50).as("sample_barcode"),
          concat(lit("AB-"), col("o_orderkey") % 7).as("aliquot_barcode"),
          concat(lit("P-"), col("o_custkey") % 3).as("project_short_name"))
        StagedBuilds.rnaSeq(raw, a2c)
      },
      Some("""WITH raw AS (SELECT rpad('u' || l_orderkey, 36, 'x') || '.rna_seq.tsv' AS file_name,
             |  CASE WHEN l_partkey % 29 = 0 THEN '__no_feature' ELSE 'ENSG' || l_partkey END AS gene_id,
             |  'gene' || l_partkey AS gene_name, CAST(l_quantity AS BIGINT) AS unstranded,
             |  l_discount AS tpm_unstranded FROM lineitem),
             |a2c AS (SELECT rpad('u' || o_orderkey, 36, 'x') AS file_gdc_id,
             |  'CB-' || o_custkey AS case_barcode, 'SB-' || (o_orderkey % 50) AS sample_barcode,
             |  'AB-' || (o_orderkey % 7) AS aliquot_barcode,
             |  'P-' || (o_custkey % 3) AS project_short_name FROM orders)
             |SELECT project_short_name, case_barcode, sample_barcode, gene_id, gene_name,
             |  string_agg(DISTINCT aliquot_barcode, ';' ORDER BY aliquot_barcode) AS aliquot_barcodes,
             |  CAST(SUM(unstranded) AS BIGINT) AS unstranded,
             |  CAST(SUM(CAST(round(tpm_unstranded*1000) AS BIGINT)) AS BIGINT) / 1000.0 AS tpm_unstranded
             |FROM raw JOIN a2c ON substr(file_name, 1, 36) = file_gdc_id
             |WHERE gene_id NOT IN ('__no_feature','__ambiguous','__too_low_aQual','__not_aligned','__alignment_not_unique')
             |GROUP BY 1, 2, 3, 4, 5""".stripMargin)),

    // extended window surface: ranking + offset + running frames (beyond
    //   the reference's single W1, exposed as first-class operators)
    "w4_ranking_offsets" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        td(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(Window.partitionBy("o_custkey").orderBy("o_orderstatus")).cast("long").as("rk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          ntile(4).over(w).cast("long").as("quartile"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS rn,
             |CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS rk,
             |lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key,
             |lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_key,
             |CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS quartile
             |FROM orders""".stripMargin)),

    "w5_running_frame" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        td(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          (sum(round(col("o_totalprice") * 100).cast("long")).over(w) / lit(100.0)).as("running_total"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |SUM(CAST(round(o_totalprice*100) AS BIGINT))
             |  OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total
             |FROM orders""".stripMargin)),

    // distribution window functions: percent_rank / cume_dist (exact
    // small-int rationals — bit-stable across engines; rounded anyway) +
    // first/nth value over the running frame
    "w6_window_distribution" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        td(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          first(col("o_orderstatus")).over(w).as("first_status"),
          nth_value(col("o_orderstatus"), 2).over(w).as("second_status"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 6) AS pr,
             |round(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 6) AS cd,
             |first_value(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS first_status,
             |nth_value(o_orderstatus, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS second_status
             |FROM orders""".stripMargin)),

    // IVF ANN: nearest-cell assignment + nProbe probing. Oracle: first-k
    //   centroids by vec_id reproduced in SQL (row_number - 1 = cell id);
    //   top-k rank keyed on the 6-dp-rounded sim on both sides (engine-
    //   stable boundary), output rounded to 6 dp
    "l12_ann_ivf_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val centroids = Ann.firstKCentroids(e, "embedding", "vec_id", k = 8)
        Ann.ivfTopK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id",
          centroids, k = 5, nProbe = 2)
          .select(col("query_id"), col("corpus_id"),
            round(col("cosine_sim"), 6).as("cosine_sim"))
      },
      Some(AnnOracles.ivfTopKSql(nCentroids = 8, nProbe = 2, nQueries = 8, k = 5)))
  )
}
