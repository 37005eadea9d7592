package graft.clinical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DCF indexd-manifest URL splitter — the "create_file_mapping_table" stage
 * of the reference's DCF manifest build
 * (BQ_Table_Building/DCF/build_dcf_manifest_bq_tables.py:42-140,238-258).
 *
 * Reference semantics, re-expressed as a single expression-only projection
 * (the reference collects every row to the driver, parses the Python-list
 * literal with `ast.literal_eval`, and re-uploads a JSONL — a per-row loop
 * that cannot scale; here the parse is a codegen'd regexp over each row,
 * so a 100 TB manifest splits with zero shuffles and zero driver state):
 *
 *  - `indexd_url` is either a Python-list literal `['url1', 'url2']` or a
 *    bare single URL; a bare URL is treated as a one-element list
 *    (build_dcf_manifest_bq_tables.py:74-77).
 *  - Each URL in list order is routed by scheme, later entries overwriting
 *    earlier ones (dict assignment in the reference loop = LAST match wins):
 *      * `https://`  → `file_gdc_url_web` (when "gdc_direct" is published);
 *        NOT gated on ACL — the web API does its own auth.
 *      * `gs://`     → `file_gdc_url`      (when "gcs" is published)
 *      * `s3://`     → `file_gdc_url_aws`  (when "aws" is published)
 *    gs/s3 URLs are only published for OPEN-access files: `'open' ∈ acl`
 *    and `'phs' ∉ acl` (controlled-access studies carry phs accessions),
 *    and never from a bucket whose name contains "controlled"
 *    (build_dcf_manifest_bq_tables.py:85-100).
 *  - Output column order is the reference's "reordered" projection:
 *    file_gdc_id, file_gdc_url, file_gdc_url_aws, file_gdc_url_web
 *    (build_dcf_manifest_bq_tables.py:118-126).
 */
object DcfManifest {

  /** URLs published by default: GDC web API, GCS, and AWS mirrors. */
  val DefaultPublishUrls: Set[String] = Set("gdc_direct", "gcs", "aws")

  /** Parse the indexd_url cell into an array of trimmed URL strings. */
  private def urlArray(indexdUrl: Column): Column = {
    val listForm = expr(
      """transform(regexp_extract_all(indexd_url, "'([^']*)'", 1), u -> trim(u))""")
    when(indexdUrl.isNull, array().cast("array<string>"))
      .when(indexdUrl.contains("["), listForm)
      .otherwise(array(trim(indexdUrl)))
  }

  /** bucket name of a gs:// or s3:// url = third '/'-separated token. */
  private def bucketOf(u: Column): Column = split_part(u, lit("/"), lit(3))

  /** Last URL in list order matching `pred` (dict-overwrite semantics). */
  private def lastMatch(urls: Column, pred: Column => Column): Column = {
    val kept = filter(urls, u => u.isNotNull && length(u) > 0 && pred(u))
    when(size(kept) > 0, element_at(kept, -1))
  }

  /**
   * Split one manifest table `(id, acl, indexd_url)` into the four-column
   * file map. Pure projection: no shuffle, no driver round-trip.
   */
  def splitManifestUrls(
      manifest: DataFrame,
      publishUrls: Set[String] = DefaultPublishUrls): DataFrame = {
    val urls = urlArray(col("indexd_url"))
    val aclOpen = col("acl").contains("open") && !col("acl").contains("phs")
    def openBucket(u: Column): Column = !bucketOf(u).contains("controlled")

    val web =
      if (publishUrls("gdc_direct")) lastMatch(urls, _.contains("https://"))
      else lit(null).cast("string")
    val gcs =
      if (publishUrls("gcs"))
        when(aclOpen, lastMatch(urls, u => u.startsWith("gs://") && openBucket(u)))
      else lit(null).cast("string")
    val aws =
      if (publishUrls("aws"))
        when(aclOpen, lastMatch(urls, u => u.startsWith("s3://") && openBucket(u)))
      else lit(null).cast("string")

    manifest.select(
      col("id").as("file_gdc_id"),
      gcs.as("file_gdc_url"),
      aws.as("file_gdc_url_aws"),
      web.as("file_gdc_url_web"))
  }

  /**
   * Combined legacy+active file map: split each manifest, UNION ALL, keep
   * the reference's reordered column projection
   * (make_combined_table_query + make_reordered_table_query).
   */
  def combinedFileMap(
      legacy: DataFrame,
      active: DataFrame,
      publishUrls: Set[String] = DefaultPublishUrls): DataFrame =
    splitManifestUrls(legacy, publishUrls)
      .unionByName(splitManifestUrls(active, publishUrls))

  /**
   * The `<release>_paths_<data_type>` view shape: open GCS path per file
   * (build_dcf_manifest_bq_tables.py:299-304).
   */
  def pathsView(fileMap: DataFrame): DataFrame =
    fileMap.select(
      col("file_gdc_id").as("file_uuid"),
      col("file_gdc_url").as("gcs_path"))
}
