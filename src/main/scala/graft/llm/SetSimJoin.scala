package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * EXACT set-similarity self-join with prefix filtering (AllPairs / PPJoin,
 * Bayardo et al. WWW'07, Xiao et al. WWW'08) — the deterministic complement
 * to MinHash-LSH ([[Dedup.minhashCandidatePairs]]): no banding probability,
 * no missed pairs, no false candidates surviving to the output. Every doc
 * pair with token-set Jaccard >= tNum/tDen is returned, exactly.
 *
 * Reference semantics: the near-dup detection used across the reference's
 * curation flows (MinHash is its scale path); this operator is the exact
 * form a pipeline runs on bounded slices (per-source shards, incremental
 * batches, legal/audit reruns) where "probably all pairs" is not enough.
 *
 * 100 TB posture — why this scales without any all-pairs step:
 *  - Global token-frequency ORDER (rarest first) is realized WITHOUT a
 *    global rank: prefix selection only needs each doc's OWN tokens sorted
 *    by (df, token), a per-row array_sort, and the join key is the token
 *    itself — no single-partition window anywhere.
 *  - Prefix filter: a doc with n distinct tokens exposes only its
 *    n - ceil(tau*n) + 1 RAREST tokens as join keys. Two docs can meet on
 *    a frequent token only if one of them is almost all frequent tokens;
 *    bucket sizes are governed by rare-token document frequencies, so the
 *    candidate join shuffles on keys whose fan-out is small by
 *    construction (the classic AllPairs guarantee).
 *  - Length filter inside the join condition: Jaccard >= tau forces
 *    tau*max(n1,n2) <= min(n1,n2); applied BEFORE the distinct, in exact
 *    integer arithmetic (tNum*greatest <= tDen*least).
 *  - Verification is a pair-local array_intersect over the two sorted
 *    token arrays — no re-shuffle of the corpus, and the threshold test
 *    is exact integers (tDen*inter >= tNum*(n1+n2-inter)), so no float
 *    boundary can disagree with the oracle.
 * Plan: two hash-aggs (token df, per-doc arrays), one equi-join on prefix
 * token, one distinct, two broadcast-or-shuffle joins back to the skinny
 * per-doc array table. Zero cartesian anywhere.
 */
object SetSimJoin {

  /**
   * All doc pairs with distinct-token Jaccard >= tNum/tDen.
   *
   * Output: (id1, id2, size1, size2, inter, jaccard) with id1 < id2;
   * jaccard rounded to 6 dp (the threshold itself is tested in exact
   * integer arithmetic — rounding only affects the reported value).
   */
  def prefixJaccardJoin(df: DataFrame, textCol: String, idCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val spark = df.sparkSession

    // (doc, token) distinct — one explode + one hash-agg
    val toks = df.select(col(idCol).as("doc"),
        explode(TextOps.whitespaceTokens(col(textCol))).as("tok"))
      .distinct()

    // document frequency per token
    val freq = toks.groupBy("tok").agg(count(lit(1)).cast("long").as("df"))

    // per-doc tokens sorted by (df asc, tok asc) — the global rarest-first
    // order realized per row; n = |token set|
    val docToks = toks.join(freq, "tok")
      .groupBy(col("doc"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("doc"),
        transform(col("ord"), e => e.getField("tok")).as("toks"),
        size(col("ord")).cast("long").as("n"))

    // prefix length p = n - ceil(tau*n) + 1 (exact integer ceil)
    val ceilTauN = ((col("n") * tNum + (tDen - 1)) / tDen).cast("long")
    val prefix = docToks
      .select(col("doc"), col("n"),
        explode(slice(col("toks"), lit(1), (col("n") - ceilTauN + 1).cast("int"))).as("tok"))

    // candidates: shared prefix token + integer length filter, then distinct
    val a = prefix.select(col("doc").as("id1"), col("n").as("size1"), col("tok").as("tok1"))
    val b = prefix.select(col("doc").as("id2"), col("n").as("size2"), col("tok").as("tok2"))
    val cand = a.join(b,
        col("tok1") === col("tok2") && col("id1") < col("id2") &&
          greatest(col("size1"), col("size2")) * tNum <=
          least(col("size1"), col("size2")) * tDen)
      .select("id1", "id2", "size1", "size2").distinct()

    // exact verify: pair-local intersection of the two sorted token arrays
    val t1 = docToks.select(col("doc").as("id1"), col("toks").as("toks1"))
    val t2 = docToks.select(col("doc").as("id2"), col("toks").as("toks2"))
    cand.join(t1, "id1").join(t2, "id2")
      .withColumn("inter", size(array_intersect(col("toks1"), col("toks2"))).cast("long"))
      .filter(col("inter") * tDen >= (col("size1") + col("size2") - col("inter")) * tNum)
      .select(col("id1"), col("id2"), col("size1"), col("size2"), col("inter"),
        round(col("inter") / (col("size1") + col("size2") - col("inter")), 6).as("jaccard"))
  }
}
