package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Agg

/**
 * Staged GDC/PDC measurement builds re-expressed as lazy DataFrame chains
 * (SURVEY §3.3): the reference materializes `_step_1`…`_step_5` tables;
 * here each step is a function and materialization is the caller's choice.
 */
object StagedBuilds {

  /** Histogram-artifact gene rows dropped by the RNA-seq build
    * (RNA_seq.py:97-126). */
  val ExcludedGeneIds: Seq[String] = Seq(
    "__no_feature", "__ambiguous", "__too_low_aQual", "__not_aligned",
    "__alignment_not_unique")

  /**
   * RNA-seq staged chain (GDC/RNA_seq.py:218-299):
   *  1. expression join `aliquot.file_gdc_id = LEFT(raw.file_name, 36)`
   *     (RNA_seq.py:120);
   *  2. gene-artifact filter;
   *  3. pooled-sample merge: wide GROUP BY with STRING_AGG of the pooled
   *     aliquot barcodes + summed counts (RNA_seq.py:161-215).
   *
   * raw: (file_name, gene_id, gene_name, unstranded, tpm_unstranded)
   * aliquotToCase: (file_gdc_id, case_barcode, sample_barcode, aliquot_barcode,
   *                 project_short_name)
   */
  def rnaSeq(raw: DataFrame, aliquotToCase: DataFrame): DataFrame = {
    // No broadcast() hint on the aliquot map: its size is data-dependent
    // (the reference's real map is ~10⁴ rows and auto-broadcasts under the
    // 10 MB threshold anyway), and a hard-coded hint forces the driver to
    // build the HashedRelation single-threaded even when the "dim" is
    // fact-sized — measured at sf1 (1.5 M rows): the hinted plan spent
    // ~30 s of WALL in the driver-side broadcast build (44.7 s wall vs
    // < 2 s of per-core task time); unhinted, AQE picks the shuffle join
    // at this size and the broadcast join below the threshold.
    val joined = raw
      .filter(!col("gene_id").isin(ExcludedGeneIds: _*))
      .join(aliquotToCase,
        substring(col("file_name"), 1, 36) === col("file_gdc_id"))
    joined.groupBy("project_short_name", "case_barcode", "sample_barcode",
        "gene_id", "gene_name")
      .agg(Agg.stringAggDistinctOrdered(col("aliquot_barcode"), ";").as("aliquot_barcodes"),
        sum(col("unstranded")).cast("long").as("unstranded"),
        (sum(round(col("tpm_unstranded") * 1000).cast("long")) / lit(1000.0)).as("tpm_unstranded"))
  }

  /**
   * CLUSTER BY storage layout (gdc_file_utils.py:599-614): co-locate and
   * order rows by the cluster columns on write. `repartition` on the
   * leading column + `sortWithinPartitions` across all of them mirrors
   * BigQuery clustering on parquet.
   */
  def clusterWrite(df: DataFrame, path: String, clusterCols: Seq[String],
                   partitions: Int = 0): Unit = {
    val cols = clusterCols.map(col)
    val repart = if (partitions > 0) df.repartition(partitions, cols.head)
    else df.repartition(cols.head)
    repart.sortWithinPartitions(cols: _*).write.mode("overwrite").parquet(path)
  }

  /**
   * PDC quant-matrix melt (quant_data_matrix_pdc.py:502-579, 645-662): a
   * wide gene × aliquot matrix whose column names are
   * `{aliquot_run_metadata_id}:{aliquot_submitter_id}` composites melts to
   * long form with the composite split into its id parts.
   */
  def meltQuantMatrix(wide: DataFrame, geneCol: String): DataFrame = {
    val valueCols = wide.columns.filterNot(_ == geneCol)
    wide.unpivot(Array(col(geneCol)), valueCols.map(col).toArray,
        "aliquot_composite", "protein_abundance_log2ratio")
      .filter(col("protein_abundance_log2ratio").isNotNull)
      .select(col(geneCol).as("gene_symbol"),
        split(col("aliquot_composite"), ":").getItem(0).as("aliquot_run_metadata_id"),
        split(col("aliquot_composite"), ":").getItem(1).as("aliquot_submitter_id"),
        col("protein_abundance_log2ratio"))
  }

  /**
   * Quant enrichment join chain (quant_data_matrix_pdc.py:631-640):
   * aliquot_run_metadata → aliquot → sample → case, all broadcast-able
   * mapping dims.
   */
  def enrichQuant(melted: DataFrame,
                  runMetaToAliquot: DataFrame,  // (aliquot_run_metadata_id, aliquot_id)
                  aliquotToSample: DataFrame,   // (aliquot_id, sample_id)
                  sampleToCase: DataFrame       // (sample_id, case_id)
                 ): DataFrame =
    // unhinted (the c11/rnaSeq rationale): metadata maps auto-broadcast
    // below the threshold; a fact-sized map must not force a driver build
    melted
      .join(runMetaToAliquot, Seq("aliquot_run_metadata_id"))
      .join(aliquotToSample, Seq("aliquot_id"))
      .join(sampleToCase, Seq("sample_id"))

  /**
   * Quantile normalization (Bolstad et al. 2003, Bioinformatics — the
   * cross-sample distribution equalizer every expression-matrix build
   * runs before comparing samples): rank each sample's values, build the
   * REFERENCE distribution as the per-rank mean across samples, and
   * replace every value by the reference value at its rank.
   *
   * Determinism contract: the within-sample rank is a row_number over
   * the TOTAL order (value, gene) — ties broken by gene id, so every
   * engine assigns identical ranks (the mean-of-tied-ranks variant
   * averages over an engine-dependent tie set; this one is exactly
   * replayable). The reference value is integer micro-units:
   * (Σ value · 10⁶) div (samples present at that rank) — samples with
   * fewer genes simply stop contributing past their depth, matching the
   * ragged-matrix behavior of the melt (c5) this feeds on.
   *
   * Scale shape: one per-sample sort window (partitioned by sample — the
   * matrix's natural parallelism), one skinny hash-agg on rank (rank
   * cardinality = genes-per-sample, not matrix size), one equi-join back
   * on rank — the ref side is rank-cardinality, so it BROADCASTS and the
   * ranked matrix never re-shuffles for the join. No driver state, no
   * collect. The ranked frame feeds both the ref build and the probe
   * side, so the lazy plan scans the input twice; at real matrix scale
   * persist/checkpoint `ranked` between the two uses (the registry
   * entry keeps the pure two-scan form — at oracle scale the second
   * scan is cheaper than a materialization).
   *
   * Input: one row per (sample, gene) with an exact integer value
   * (cents). Output: (sample, gene, rk, ref_micro).
   */
  def quantileNormalize(df: DataFrame, sampleCol: String, geneCol: String,
                        valueCol: String): DataFrame = {
    val ranked = df.select(col(sampleCol).as("sample_id"),
        col(geneCol).as("gene_id"), col(valueCol).cast("long").as("v"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("sample_id").orderBy(col("v"), col("gene_id")))
        .cast("long"))
    val ref = ranked.groupBy("rk")
      .agg(sum(col("v")).cast("long").as("s"), count(lit(1)).as("m"))
      .select(col("rk"), expr(graft.ops.Stats.microMeanSql("s", "m")).as("ref_micro"))
    ranked.join(ref, "rk")
      .select(col("sample_id"), col("gene_id"), col("rk"), col("ref_micro"))
  }
}
