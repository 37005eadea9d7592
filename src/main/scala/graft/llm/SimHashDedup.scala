package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/**
 * SimHash near-dup family (split from Dedup.scala, round 11 — pure
 * mechanical move on the family seam, mixed back into [[Dedup]] so call
 * sites keep reading `Dedup.simhashNearDups`): 64-bit per-token majority
 * vote fingerprints (expression fold, agg, and native-expression forms),
 * Hamming distance, and the pigeonhole-exact block-bucket pairing tail
 * shared with arbitrary precomputed fingerprints (image dHash, audio).
 */
private[llm] trait SimHashDedupOps {

  /**
   * 64-bit SimHash over whitespace tokens: per-bit majority vote of token
   * xxhash64 bits. Expression-only: for each bit position the vote is the
   * sum over tokens of ±1 by that bit — all inside one `aggregate` over the
   * token array (no explode, no shuffle).
   */
  // One literal mask per bit position (1L<<63 is the sign bit; bitwiseAND on
  // longs is well-defined for it).
  private val bitMasks: Column = array((0 until 64).map(i => lit(1L << i)): _*)

  def simhash64(text: Column): Column = {
    val toks = TextOps.whitespaceTokens(lower(text))
    // votes[i] = sum over tokens of (bit_i(hash) ? 1 : -1), i = 0..63
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, bitMasks,
          (v, m) => v + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1))
      })
    // fold bit votes back into one long
    aggregate(zip_with(votes, bitMasks,
        (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes (bit_count of xor). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash computed as explode + 64 conditional-sum aggregates instead of
   * the per-token array fold: the fold allocates two 64-wide arrays per
   * token; this shape stays in vectorized whole-stage codegen with map-side
   * partial aggregation (measured ~4× at sf0.1). One shuffle on the doc id.
   * Docs with zero tokens produce no row.
   */
  def simhashByAgg(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df
      .select(col(idCol), explode(TextOps.whitespaceTokens(lower(col(textCol)))).as("_t"))
      .select(col(idCol), xxhash64(col("_t")).as("_h"))
    val votes = (0 until 64).map(i =>
      sum(when(col("_h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"_v$i"))
    val agg = toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sim = (0 until 64).map(i =>
      when(col(s"_v$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ bitwiseOR _)
    agg.select(col(idCol), sim.as("simhash"))
  }

  /**
   * SimHash near-dup candidates: block on `blocks` bit-slices of the
   * simhash — shuffle on (block_id, slice), pair within blocks, verify
   * hamming ≤ maxHamming. No crossJoin.
   *
   * Banding is pigeonhole-EXACT iff `blocks > maxHamming` (≤ maxHamming
   * differing bits across > maxHamming disjoint slices leave at least one
   * slice identical); fewer blocks = approximate. Default is the
   * literature-standard near-dup setting (Manku et al., WWW'07): 64-bit
   * fingerprints, hamming ≤ 3, `blocks = 4` — the MINIMAL exact banding.
   * Fewer, WIDER slices are strictly better than extra narrow ones: r7
   * shipped blocks=8 (8-bit slices), whose 256 distinct values saturate as
   * the corpus grows — bucket occupancy, and with it candidate pairs, grew
   * quadratically (l7 measured ×18 time for ×10 docs); 16-bit slices hold
   * 65k values and the same query scales linearly. At larger corpora still,
   * widen slices further and/or add Manku-style permutations — the knob is
   * slice CARDINALITY vs the pigeonhole floor `blocks > maxHamming`.
   */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3, blocks: Int = 4,
                      maxBucketSize: Int = 1000,
                      dropStats: Option[DropStats] = None): DataFrame = {
    // native SimHash64 expression (codegen'd tight loop): measured faster
    // than both the HOF fold (per-token array allocs) and the explode+64-agg
    // variant (falls out of codegen at 64 agg buffers)
    val withSim = df
      .select(col(idCol), TextOps.whitespaceTokens(lower(col(textCol))).as("_toks"))
      .select(col(idCol), SimHash64.simhashCol(df.sparkSession, "_toks").as("simhash"))
    simhashBlockPairs(withSim, idCol, maxHamming, blocks, maxBucketSize, dropStats)
  }

  /** Portable twin of [[simhashNearDups]]: identical pipeline with
    * [[SimHashPortable60]] fingerprints (md5-derived token hashes), so a
    * DuckDB oracle can replay every step — see
    * `LshOracles.portableSimhashNearDupsSql`. */
  def simhashNearDupsPortable(df: DataFrame, textCol: String, idCol: String,
                              maxHamming: Int = 3, blocks: Int = 4,
                              maxBucketSize: Int = 1000,
                              dropStats: Option[DropStats] = None): DataFrame = {
    val withSim = df
      .select(col(idCol), TextOps.whitespaceTokens(lower(col(textCol))).as("_toks"))
      .select(col(idCol), SimHashPortable60.simhashCol(df.sparkSession, "_toks").as("simhash"))
    simhashBlockPairs(withSim, idCol, maxHamming, blocks, maxBucketSize, dropStats)
  }

  /**
   * Near-dup pairs over an ARBITRARY precomputed 64-bit fingerprint column
   * (SimHash, image dHash, audio fingerprint, …): the
   * [[simhashNearDups]] block-bucket tail exposed for callers that bring
   * their own fingerprints — e.g. [[graft.multimodal.Multimodal.imageDHash]]
   * feeding image near-dup dedup (m6). Same semantics and scale shape:
   * one shuffle on (block_id, slice), capped buckets, pigeonhole-exact
   * banding iff `blocks > maxHamming`.
   */
  def fingerprintNearDups(df: DataFrame, idCol: String, fpCol: String,
                          maxHamming: Int = 3, blocks: Int = 4,
                          maxBucketSize: Int = 1000,
                          dropStats: Option[DropStats] = None): DataFrame =
    simhashBlockPairs(df.select(col(idCol), col(fpCol).as("simhash")), idCol,
      maxHamming, blocks, maxBucketSize, dropStats)

  /** Shared block-bucket pairing tail: slice the 64-bit fingerprint into
    * `blocks` bands, shuffle once on (block_id, slice), pair within capped
    * buckets, verify hamming ≤ maxHamming. */
  private def simhashBlockPairs(withSim: DataFrame, idCol: String,
                                maxHamming: Int, blocks: Int,
                                maxBucketSize: Int,
                                dropStats: Option[DropStats]): DataFrame = {
    val bits = 64 / blocks
    val slices = (0 until blocks).map(b =>
      shiftright(col("simhash"), b * bits).bitwiseAND(lit((1L << bits) - 1)))
    val banded = withSim.select(col(idCol), col("simhash"),
      posexplode(array(slices: _*)).as(Seq("block_id", "slice")))
    val grouped = banded.groupBy("block_id", "slice")
      .agg(collect_list(struct(col(idCol).as("id"), col("simhash").as("sh"))).as("members"))
    val buckets = Dedup.observeDrops(grouped, "members", maxBucketSize, dropStats)
      .filter(size(col("members")).between(2, maxBucketSize))
    val sorted = array_sort(col("members"))
    buckets.select(explode(flatten(transform(sorted, (a, i) =>
        transform(slice(sorted, i + 2, size(sorted)),
          b => struct(a.getField("id").as("id1"), b.getField("id").as("id2"),
            hamming64(a.getField("sh"), b.getField("sh")).as("hamming")))))).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"), col("p.hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
