package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Annotation / labeling quality control for RLHF and SFT datasets:
 * inter-annotator agreement (Cohen's kappa per annotator pair), majority-
 * vote label resolution with a deterministic tie policy, and the
 * preference length-bias audit.
 *
 * Reference behavior anchor: the reference's QC-report pattern
 * (compare_two_tables / diff counts, generic_bq_utils.py) applied to the
 * labeling domain; the kappa statistic itself is Cohen 1960, standard in
 * every crowdsourced-label pipeline.
 *
 * Arithmetic contract (the bradleyTerry / giniByGroup micro-unit rule):
 * every ratio is an exact integer quotient — basis points or micro-units
 * formed with `div` over DECIMAL(38,0) products — so DuckDB replays each
 * value bit for bit (HUGEINT `//` truncates identically for the
 * non-negative operands used here).
 *
 * Scale shape: the only corpus-sized work is one equi-join on the item
 * key (kappa) or one hash-aggregate on the item key (resolution).
 * Annotator fan-out per item is bounded by the labeling-redundancy
 * contract (3–7 annotators per item in every real labeling run), so the
 * pair explosion is O(A²) per item with tiny A — never a corpus
 * cross-product. Everything downstream of the first aggregate is
 * (pairs × classes²)-sized: dozens of rows at any corpus size.
 */
object Annotation {

  private val Dec = "decimal(38,0)"

  /**
   * Pairwise Cohen's kappa over a (item, annotator, label) table.
   *
   * For each unordered annotator pair (a < b), over the items BOTH
   * annotated: observed agreement po = agree/n, chance agreement
   * pe = Σ_c na_c·nb_c / n², and
   * kappa = (po − pe)/(1 − pe) = (n·agree − Σ na·nb)/(n² − Σ na·nb).
   *
   * The corpus is touched exactly once: the item-keyed self-join reduces
   * to the joint confusion matrix (pair, label_a, label_b, count); n,
   * agree, and both marginals are derived from that bounded table, so no
   * second corpus scan and no window anywhere.
   *
   * Output: (annotator_a, annotator_b, n_items, n_agree, po_bp,
   * kappa_micro). kappa_micro is NULL when pe = 1 (both annotators
   * constant on the same class — kappa undefined, 0/0). Duplicate
   * (item, annotator) labels are the caller's contract violation; feed
   * this a resolved one-label-per-annotator table (keep-first by
   * timestamp, as the fixture does).
   */
  def cohenKappaPairs(labels: DataFrame, itemCol: String,
                      annotatorCol: String, labelCol: String): DataFrame = {
    val l = labels
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(itemCol).as("_it"), col(annotatorCol).as("_an"),
        col(labelCol).as("_lb"))
    val a = l.select(col("_it"), col("_an").as("annotator_a"),
      col("_lb").as("_la"))
    val b = l.select(col("_it"), col("_an").as("annotator_b"),
      col("_lb").as("_lbb"))
    // one shuffle on the item key; A-per-item bounded ⇒ O(A²) fan-out
    val cm = a.join(b, Seq("_it"))
      .filter(col("annotator_a") < col("annotator_b"))
      .groupBy("annotator_a", "annotator_b", "_la", "_lbb")
      .agg(count(lit(1)).cast("long").as("_cnt"))
    val base = cm.groupBy("annotator_a", "annotator_b")
      .agg(sum("_cnt").cast("long").as("n_items"),
        sum(when(col("_la") === col("_lbb"), col("_cnt"))
          .otherwise(lit(0L))).cast("long").as("n_agree"))
    val ma = cm.groupBy(col("annotator_a"), col("annotator_b"),
        col("_la").as("_c"))
      .agg(sum("_cnt").cast("long").as("_na"))
    val mb = cm.groupBy(col("annotator_a"), col("annotator_b"),
        col("_lbb").as("_c"))
      .agg(sum("_cnt").cast("long").as("_nb"))
    // classes one annotator never used contribute 0 to Σ na·nb — inner
    // join drops exactly those zero products
    val pe = ma.join(mb, Seq("annotator_a", "annotator_b", "_c"))
      .groupBy("annotator_a", "annotator_b")
      .agg(sum(col("_na").cast(Dec) * col("_nb").cast(Dec)).cast(Dec)
        .as("_pe_num"))
    // LEFT join: a pair whose annotators share NO class has an empty
    // marginal product set — Σ na·nb = 0 (pe = 0, kappa = po), not a
    // dropped row
    base.join(pe, Seq("annotator_a", "annotator_b"), "left")
      .withColumn("_pe_num",
        coalesce(col("_pe_num"), lit(0).cast(Dec)))
      .select(col("annotator_a"), col("annotator_b"), col("n_items"),
        col("n_agree"),
        expr(s"CAST(10000 * CAST(n_agree AS $Dec) div n_items AS BIGINT)")
          .as("po_bp"),
        // n·n = pe_num ⟺ pe = 1: kappa undefined (both constant, same
        // class). n·agree and n² reach 1e18 at 1e9 co-annotated items;
        // the ×10⁶ product is formed in DECIMAL so the long can't wrap
        // (the giniByGroup lesson).
        when(expr(s"CAST(n_items AS $Dec) * n_items") =!= col("_pe_num"),
          expr(s"""CAST(1000000 * (CAST(n_items AS $Dec) * n_agree - _pe_num)
                  |  div (CAST(n_items AS $Dec) * n_items - _pe_num)
                  |  AS BIGINT)""".stripMargin))
          .otherwise(lit(null).cast("long")).as("kappa_micro"))
  }

  /**
   * Majority-vote label resolution with a deterministic tie policy.
   *
   * Per item: the winning label is max by (votes, label) — ties break to
   * the LARGEST label string, stated policy, so reruns and engines agree;
   * confidence_bp = 10000·top_votes div n_votes; `tied` marks a
   * non-unique top count (the "send back for another label" queue);
   * `unanimous` marks top_votes = n_votes.
   *
   * One corpus hash-aggregate to the (item, label) vote table, one
   * whole-partition window over that reduced table (groups = labels per
   * item, a handful of rows), one final item aggregate that reuses the
   * window's partitioning — the corpus is never sorted or joined.
   */
  def resolveLabels(labels: DataFrame, itemCol: String,
                    annotatorCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val votes = labels
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(labelCol).as("_lb"))
      .agg(count(lit(1)).cast("long").as("_v"))
    val w = Window.partitionBy("item")
    votes
      .withColumn("_maxv", max("_v").over(w))
      .withColumn("_nv", sum("_v").over(w))
      .withColumn("_nlb", count(lit(1)).over(w))
      .withColumn("_ntop",
        sum(when(col("_v") === col("_maxv"), lit(1L)).otherwise(lit(0L)))
          .over(w))
      .filter(col("_v") === col("_maxv"))
      .groupBy("item")
      // ties break to the LARGEST label among the top-voted — stated
      // deterministic policy, engine-independent
      .agg(max("_lb").as("label"),
        max("_nv").cast("long").as("n_votes"),
        max("_nlb").cast("long").as("n_distinct_labels"),
        max("_maxv").cast("long").as("top_votes"),
        max("_ntop").cast("long").as("_n_top"))
      .select(col("item"), col("label"), col("n_votes"),
        col("n_distinct_labels"), col("top_votes"),
        expr(s"CAST(10000 * CAST(top_votes AS $Dec) div n_votes AS BIGINT)")
          .as("confidence_bp"),
        (col("_n_top") > 1).as("tied"),
        (col("top_votes") === col("n_votes")).as("unanimous"))
  }

  /**
   * Preference length-bias audit: does "chosen" win just by being
   * longer? Over a (chosen_len, rejected_len) pair table: the rate at
   * which the strictly-longer response is the chosen one, the mean
   * signed length gap, and a per-bucket win table over the length-ratio
   * deciles — the reward-hacking early-warning every RLHF data card
   * reports.
   *
   * One pass, one hash-aggregate; ratio buckets are exact basis-point
   * integer quotients so the bucket edges replay in any engine.
   *
   * Output: (bucket, n_pairs, longer_chosen, longer_chosen_bp,
   * mean_gap_milli) where bucket = min(9, 10000·min_len div max_len div
   * 1000) — 0 = extreme length mismatch, 9 = near-equal lengths — plus
   * an `ALL` row (bucket = -1).
   */
  def lengthBiasAudit(pairs: DataFrame, chosenLenCol: String,
                      rejectedLenCol: String): DataFrame = {
    val p = pairs
      .filter(col(chosenLenCol).isNotNull && col(rejectedLenCol).isNotNull)
      .select(col(chosenLenCol).cast("long").as("_cl"),
        col(rejectedLenCol).cast("long").as("_rl"))
      .filter(col("_cl") >= 0 && col("_rl") >= 0)
      .withColumn("_longer_chosen",
        when(col("_cl") > col("_rl"), lit(1L)).otherwise(lit(0L)))
      // equal lengths carry no length signal either way
      .withColumn("_has_gap",
        when(col("_cl") =!= col("_rl"), lit(1L)).otherwise(lit(0L)))
      .withColumn("_bucket",
        when(greatest(col("_cl"), col("_rl")) === 0, lit(9L)).otherwise(
          least(lit(9L), expr(
            s"""CAST(10000 * CAST(least(_cl, _rl) AS $Dec)
               |  div greatest(_cl, _rl) div 1000 AS BIGINT)""".stripMargin))))
    // rollup = per-bucket rows + the grand-total row in ONE corpus pass
    // (partial aggregation map-side on ≤ 11 keys); the NULL rollup key
    // becomes the documented bucket = -1 ALL row
    p.rollup("_bucket")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("_longer_chosen")).cast("long").as("longer_chosen"),
        sum(col("_has_gap")).cast("long").as("n_unequal"),
        sum(col("_cl") - col("_rl")).cast("long").as("_gap_sum"))
      .select(coalesce(col("_bucket"), lit(-1L)).as("bucket"),
        col("n_pairs"), col("longer_chosen"), col("n_unequal"),
        col("_gap_sum"))
      .select(col("bucket"), col("n_pairs"), col("longer_chosen"),
        // rate among pairs with a length signal; NULL when all-equal
        when(col("n_unequal") > 0,
          expr(s"CAST(10000 * CAST(longer_chosen AS $Dec) div n_unequal" +
            " AS BIGINT)")).otherwise(lit(null).cast("long"))
          .as("longer_chosen_bp"),
        // signed mean gap in milli-chars, truncated toward zero exactly
        // as DuckDB's HUGEINT // does for either sign pattern of the sum
        expr(s"CAST(1000 * CAST(_gap_sum AS $Dec) div n_pairs AS BIGINT)")
          .as("mean_gap_milli"))
  }
}
