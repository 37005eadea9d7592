package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-retrieval index builders over a document table: inverted-index
 * postings and BM25 ranked retrieval. These are the corpus-side retrieval
 * ops a training-data pipeline needs next to dedup/decontamination —
 * "which shards mention X", "top docs for this probe query" — expressed
 * as pure Spark plans (explode → hash agg → bounded window), no driver
 * state, no UDFs.
 *
 * Token definition shared by both ops (and their DuckDB oracles):
 * lowercase, trim, split on whitespace runs, empty tokens excluded —
 * identical to [[RepetitionStats]]' stream so corpus statistics agree
 * across operators.
 *
 * Scale shape (100 TB): the token explode is map-side; (token, doc) term
 * frequencies combine partially before the one shuffle on token. Postings
 * are capped PER TOKEN by a bounded window rank — a stopword's posting
 * list never materializes beyond the per-partition sort (disk-spillable),
 * unlike a collect_list which would hold the whole list in one aggregation
 * buffer. Document-frequency stats stay token-keyed (vocabulary-sized,
 * zipfian-small next to the corpus) and reuse the same token partitioning,
 * so stats + postings join without an extra exchange.
 */
object Index {

  /** Lowercased whitespace tokens as an array column (empties NOT yet
    * removed — callers filter after explode so the filter runs columnar). */
  private def tokensCol(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** One row per (doc, token) occurrence, empty tokens dropped. */
  private def tokenStream(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(tokensCol(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)

  /**
   * Inverted index: one row per surviving token with document frequency,
   * total term frequency, and a `doc:tf` posting string of the first
   * `maxPostings` documents in doc-id order. Tokens with df < `minDf` are
   * pruned (hapax noise dominates a zipfian vocabulary; pruning them early
   * keeps the index table broadcastable far longer).
   *
   * Output: (token, df, tf_total, postings).
   */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Int, maxPostings: Int): DataFrame = {
    val tf = tokenStream(df, idCol, textCol)
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
    // ONE pass over the (token, doc) stream: df / tf_total ride the same
    // token-partitioned window that ranks postings, so stats cover EVERY
    // posting while the string-agg sees only the first maxPostings — no
    // second scan, no stats-vs-postings self-join (Spark has no cross-arm
    // CSE; a join of two aggs over `tf` would recompute the explode per
    // arm). The final agg groups on (token, df, tf_total) — constants per
    // token — and reuses the window's hash(token) partitioning.
    val wp = Window.partitionBy("token")
    val w = wp.orderBy(col("doc_id"))
    tf.select(col("token"), col("doc_id"), col("tf"),
        row_number().over(w).as("_rn"),
        count(lit(1)).over(wp).cast("long").as("df"),
        sum("tf").over(wp).cast("long").as("tf_total"))
      .filter(col("df") >= minDf && col("_rn") <= maxPostings)
      .groupBy("token", "df", "tf_total")
      .agg(array_join(transform(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
        e => concat(e.getField("doc_id").cast("string"), lit(":"),
          e.getField("tf").cast("string"))), "|").as("postings"))
      .select(col("token"), col("df"), col("tf_total"), col("postings"))
  }

  /**
   * BM25 ranked retrieval for a literal probe-term set: standard Robertson
   * idf `ln((N - df + 0.5)/(df + 0.5) + 1)` and tf saturation
   * `tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`.
   *
   * Hash-stability: per-term contributions are rounded to 6 dp and summed
   * in DECIMAL(18,6) (order-independent exact sum, the registry-wide rule
   * for double aggregation), then cast back to double; ranking uses that
   * stable score with doc-id tie-break. Corpus constants (N, avgdl) ride a
   * one-row broadcast joined on a NON-FOLDABLE constant key so Catalyst
   * plans a BroadcastHashJoin, never a cross join (same trick as the IVF
   * broadcast scorer, Ann.joinedCellScores).
   *
   * Scale shape: TWO corpus passes, both unavoidable in one lazy plan —
   * a skinny all-docs aggregate for the corpus constants (N, total length)
   * and the term-matched pass (the `isin` filter runs right on the explode,
   * so only matching (doc, term) rows shuffle). Per-term document
   * frequency rides a token-partitioned WINDOW over the matched stream —
   * not a groupBy-and-join-back, which would recompute the whole explode
   * as a second arm (no cross-arm CSE). Corpus constants ride a one-row
   * broadcast joined on a NON-FOLDABLE constant key (BroadcastHashJoin,
   * never a cross join — see above). Then one shuffle on doc for the score
   * sum and a global top-k (TakeOrderedAndProject).
   *
   * Output: (doc_id, score) — top `topK` by (score desc, doc_id asc).
   */
  /**
   * TF-IDF keyword extraction: each document's `topK` most characteristic
   * terms by `tf · ln(N/df)`, the classic summarization/tagging signal.
   *
   * Same engine-stability toolkit as [[bm25TopK]]: idf divides two exact
   * longs (one IEEE division), the rank key is the 6-dp-rounded score
   * with term tie-break, and N rides a one-row non-foldable-key
   * broadcast. Same one-stream shape as [[invertedIndex]]: df comes from
   * a token-partitioned window over the (token, doc) frequencies — never
   * a groupBy-and-join-back arm — then one window on doc ranks terms.
   * Tokens with df > `maxDfFrac`·N are excluded as stopwords BEFORE
   * ranking (idf ≈ 0 anyway; dropping them early keeps the skewed
   * stopword partitions out of the doc-ranking sort).
   *
   * Output: (doc_id, term, rank, score) — rank 1-based per doc.
   */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topK: Int, maxDfFrac: Double = 0.5): DataFrame = {
    val tf = tokenStream(df, idCol, textCol)
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("t_df", count(lit(1))
        .over(Window.partitionBy("token")).cast("long"))
    val totals = df.agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("_k", pmod(xxhash64(col("n_docs")), lit(1)))
    val scored = tf
      .withColumn("_k", pmod(xxhash64(col("doc_id")), lit(1)))
      .join(broadcast(totals), "_k")
      .filter(col("t_df") <= col("n_docs").cast("double") * maxDfFrac)
      .select(col("doc_id"), col("token").as("term"),
        round(col("tf") * log(col("n_docs") / col("t_df")), 6).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("rank"), col("score"))
  }

  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one probe term")
    val docs = df.select(col(idCol).as("doc_id"), tokensCol(col(textCol)).as("_tk"))
      .select(col("doc_id"), col("_tk"),
        size(filter(col("_tk"), t => length(t) > 0)).cast("long").as("dl"))
    // corpus constants: exact longs; avgdl derives as one double division
    // on both engines (IEEE-identical), never a streamed double mean
    val totals = docs.agg(count(lit(1)).cast("long").as("n_docs"),
        sum("dl").cast("long").as("dl_total"))
      .withColumn("_k", pmod(xxhash64(col("n_docs")), lit(1)))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("_tk")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("t_df", count(lit(1))
        .over(Window.partitionBy("token")).cast("long"))
      .withColumn("_k", pmod(xxhash64(col("doc_id")), lit(1)))
      .join(broadcast(totals), "_k")
    val avgdl = col("dl_total").cast("double") / col("n_docs").cast("double")
    val idf = log(((col("n_docs") - col("t_df") + lit(0.5)) / (col("t_df") + lit(0.5))) + lit(1.0))
    val sat = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    scored
      .select(col("doc_id"),
        round(idf * sat, 6).cast("decimal(18,6)").as("_c"))
      .groupBy("doc_id").agg(sum(col("_c")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }
}
