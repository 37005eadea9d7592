package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dataset card generation ("Datasheets for Datasets", Gebru et al. 2021;
 * the model/data-card every released corpus ships): ONE long-form table of
 * corpus composition and health metrics — overall, per language, and per
 * source — built from the same primitives the rest of the registry oracles
 * individually (token counts l2, quality l4, exact-dup fingerprints l1).
 *
 * Output rows (section, dim, metric, value):
 *  - ("corpus","all", …): n_docs, n_tokens, n_chars, dup_doc_share,
 *    mean_quality
 *  - ("lang", <lang>, …): n_docs, n_tokens, mean_quality
 *  - ("source", <source>, …): n_docs, n_tokens, dup_doc_share
 *
 * All values are DOUBLE: counts are exact (< 2⁵³), ratios round to 6 dp,
 * means sum 6-dp-rounded per-doc scores in DECIMAL(18,6) (the registry's
 * order-independent double-sum rule). `dup_doc_share` = fraction of docs
 * whose exact fingerprint appears more than once — the headline dedup
 * number a card reports.
 *
 * Scale shape: one skinny per-doc projection (id, lang, source, exact
 * expression-side token/char/quality, md5 fingerprint) + ONE fingerprint
 * window for the dup flag, then three independent aggregations (1-row
 * corpus, per-lang, per-source) unioned long-form via `stack`. Spark
 * re-evaluates the skinny subplan per branch (no cross-branch CSE on a
 * lazy plan) — 3 scans of a 5-column projection, each a pushed-column
 * parquet read; a pipeline that materializes the per-doc frame first
 * drops that to 1.
 */
object DatasetCard {

  def datasetCard(docs: DataFrame, idCol: String, textCol: String,
                  langCol: String, sourceCol: String): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      col(langCol).as("lang"),
      col(sourceCol).as("source"),
      TextOps.tokenCount(col(textCol)).as("n_tok"),
      length(col(textCol)).cast("long").as("n_chr"),
      TextOps.qualityScore(col(textCol)).as("q"),
      Dedup.exactFingerprint(col(textCol)).as("fp"))
    val d = base.withColumn("is_dup",
      when(count(lit(1)).over(Window.partitionBy("fp")) > 1, 1L).otherwise(0L))

    val qSum = sum(col("q").cast("decimal(18,6)"))
    def meanQ(n: Column): Column = round(qSum.cast("double") / n, 6)

    val corpus = d.agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(col("n_chr")).cast("long").as("n_chars"),
        round(sum(col("is_dup")).cast("double") / count(lit(1)), 6).as("dup_doc_share"),
        meanQ(count(lit(1))).as("mean_quality"))
      .select(lit("corpus").as("section"), lit("all").as("dim"),
        expr("""stack(5,
          'n_docs', cast(n_docs as double),
          'n_tokens', cast(n_tokens as double),
          'n_chars', cast(n_chars as double),
          'dup_doc_share', dup_doc_share,
          'mean_quality', mean_quality) as (metric, value)"""))

    val byLang = d.groupBy(col("lang").as("dim"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        meanQ(count(lit(1))).as("mean_quality"))
      .select(lit("lang").as("section"), col("dim"),
        expr("""stack(3,
          'n_docs', cast(n_docs as double),
          'n_tokens', cast(n_tokens as double),
          'mean_quality', mean_quality) as (metric, value)"""))

    val bySource = d.groupBy(col("source").as("dim"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        round(sum(col("is_dup")).cast("double") / count(lit(1)), 6).as("dup_doc_share"))
      .select(lit("source").as("section"), col("dim"),
        expr("""stack(3,
          'n_docs', cast(n_docs as double),
          'n_tokens', cast(n_tokens as double),
          'dup_doc_share', dup_doc_share) as (metric, value)"""))

    corpus.unionByName(byLang).unionByName(bySource)
      .select(col("section"), col("dim"), col("metric"), col("value"))
  }
}
