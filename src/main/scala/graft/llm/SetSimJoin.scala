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
      tNum: Int, tDen: Int): DataFrame =
    prefixJaccardJoinElems(
      df.select(col(idCol).as("doc"),
          explode(TextOps.whitespaceTokens(col(textCol))).as("tok"))
        .distinct(),
      tNum, tDen)

  /**
   * [[prefixJaccardJoin]] over an ARBITRARY element table: `elems` must be
   * a DISTINCT (doc, tok) frame — callers choose the set elements (raw
   * tokens above; n-gram shingles in [[DedupAudit.plantedPairs]]'s exact
   * ground truth). Same AllPairs prefix filter, same exact integer
   * threshold arithmetic, same output shape.
   */
  def prefixJaccardJoinElems(elems: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val toks = elems

    // document frequency per token as a WINDOW over the token partition
    // (round 14, guide §2.4 — same-keyed operations share one exchange):
    // the previous agg-then-join shape shuffled the (doc, tok) stream
    // twice (once into the df aggregate, once into the join) and sorted
    // both join sides; one count-over-partition produces the identical
    // exact df with a single exchange + sort of the stream.
    val withDf = toks.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("tok"))).cast("long"))

    // per-doc tokens sorted by (df asc, tok asc) — the global rarest-first
    // order realized per row; n = |token set|
    val docToks = withDf
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

  /**
   * EXACT asymmetric CONTAINMENT join over n-gram shingle sets: pairs
   * where the SMALLER doc's shingles are mostly inside the bigger doc's —
   * |A∩B| / |A| >= tNum/tDen with |A| <= |B| (id tie-break). Jaccard
   * (above) misses exactly this case: a paragraph quoted inside a long
   * article has tiny Jaccard but containment ≈ 1. This is the
   * quote-extraction / subset-duplicate detector a curation pipeline runs
   * NEXT TO the symmetric near-dup pass — symmetric dedup keeps both docs,
   * containment says the small one is redundant.
   *
   * Exactness of the prefix filter for containment: doc A's non-prefix
   * part holds ceil(tau·|A|) − 1 < tau·|A| <= |A∩B| shingles, so a
   * qualifying intersection can NEVER fit entirely in A's non-prefix —
   * at least one of A's prefix shingles is in B. Hence candidates =
   * A-prefix shingles joined against B's FULL shingle index (the container
   * side cannot be prefix-trimmed: containment does not bound |B|).
   * Shingle document frequencies govern fan-out — n-gram shingles are
   * near-unique outside boilerplate, which is what keeps the index join
   * linear where raw tokens would explode; boilerplate mega-shingles are
   * exactly what [[Dedup.lineDedup]] removes upstream.
   *
   * Hashes are the portable md5 family — the DuckDB oracle replays the
   * identical check from ground truth (all shared-shingle pairs), which
   * equals this output because tau > 0 forces >= 1 shared shingle.
   *
   * Output: (id_in, id_out, n_in, n_out, inter, containment 6 dp) with
   * the containment threshold tested in exact integer arithmetic.
   */
  def containmentJoin(df: DataFrame, textCol: String, idCol: String,
      n: Int, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")

    // distinct shingle hashes per doc, sorted by (df asc, h asc) — the
    // rarest-first prefix order realized per row, no global rank
    val sh = df.select(col(idCol).as("doc"),
        explode(array_distinct(transform(
          TextOps.shingles(col(textCol), n),
          s => TextOps.portableHash60(s)))).as("h"))
    // df via count-over-partition: one exchange of the shingle stream
    // instead of agg + join (see prefixJaccardJoinElems above)
    val docSh = sh.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("h"))).cast("long"))
      .groupBy(col("doc"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("doc"),
        transform(col("ord"), e => e.getField("h")).as("hs"),
        size(col("ord")).cast("long").as("n"))

    // probe side: prefix of length n - ceil(tau*n) + 1 (exact integer ceil)
    val ceilTauN = ((col("n") * tNum + (tDen - 1)) / tDen).cast("long")
    val probe = docSh
      .select(col("doc").as("id_in"), col("n").as("n_in"),
        explode(slice(col("hs"), lit(1), (col("n") - ceilTauN + 1).cast("int"))).as("h"))

    // index side: ALL shingles of every doc (the container is unbounded)
    val index = sh.select(col("doc").as("id_out"), col("h"))
      .join(docSh.select(col("doc").as("id_out"), col("n").as("n_out")), "id_out")

    val cand = probe.join(index,
        probe("h") === index("h") &&
          (col("n_in") < col("n_out") ||
            (col("n_in") === col("n_out") && col("id_in") < col("id_out"))))
      .select("id_in", "id_out", "n_in", "n_out").distinct()

    // exact verify: pair-local intersection of the two sorted hash arrays
    val tIn = docSh.select(col("doc").as("id_in"), col("hs").as("hs_in"))
    val tOut = docSh.select(col("doc").as("id_out"), col("hs").as("hs_out"))
    cand.join(tIn, "id_in").join(tOut, "id_out")
      .withColumn("inter", size(array_intersect(col("hs_in"), col("hs_out"))).cast("long"))
      .filter(col("inter") * tDen >= col("n_in") * tNum)
      .select(col("id_in"), col("id_out"), col("n_in"), col("n_out"), col("inter"),
        round(col("inter") / col("n_in"), 6).as("containment"))
  }
}
