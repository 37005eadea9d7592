package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic count-min sketch (Cormode & Muthukrishnan 2005, public)
 * over a token stream: d independent hash rows × w buckets, point-query
 * estimate = min over rows of the landed cell. Unlike the engine-native
 * sketches (HLL a15, GK a17) whose internals differ per engine and are
 * only property-checkable, this sketch uses the portable md5-derived
 * 60-bit hash family — the SAME sketch materializes on any engine, so a
 * DuckDB oracle replays the estimates EXACTLY, and an incremental
 * pipeline can merge sketches built by different systems (cells are
 * additive longs).
 *
 * Scale shape: token frequencies first (one corpus shuffle, map-side
 * partials), then the d-way cell explode runs over the VOCABULARY, not
 * the corpus — d·|vocab| skinny rows into a d·w-cell table (constant
 * size: the whole point of a sketch). Probe terms hash expression-side
 * and join the broadcast cell table; an unpopulated cell is 0 via the
 * left join. At 100 TB the sketch is the bounded-memory stand-in for a
 * full heavy-hitter groupBy: w scales with 1/ε, never with the corpus.
 *
 * CMS guarantee (spec-asserted, not oracle-asserted): est ≥ exact count,
 * and est ≤ exact + ε·N with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
 *
 * Output: (term, est) for each probe term.
 */
object Sketch {

  /** Row-r bucket for a key: portable hash of `cms<r>‖US‖key`, mod w —
    * replayed in SQL as `('0x'||substr(md5('cms'||r||chr(31)||key),1,15))::BIGINT % w`. */
  def cmsBucket(r: Int, key: Column, w: Int): Column =
    pmod(TextOps.portableHash60(
      concat(lit("cms" + r + Sampling.SeedSep), key)), lit(w.toLong))

  def cmsHeavyHitters(df: DataFrame, idCol: String, textCol: String,
                      probes: Seq[String], d: Int = 4, w: Int = 64): DataFrame = {
    require(probes.nonEmpty && d > 0 && w > 0, "need probes and positive d, w")
    val spark = df.sparkSession
    import spark.implicits._
    val tf = df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    def cellArms(key: Column): Column = explode(array((0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(r, key, w).as("bucket"))): _*))
    val cells = tf.select(cellArms(col("token")).as("rb"), col("cnt"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum("cnt").cast("long").as("c"))
    val probeCells = probes.toDF("term")
      .select(col("term"), cellArms(col("term")).as("rb"))
      .select(col("term"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probeCells.join(broadcast(cells), Seq("r", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("c"), lit(0L))).cast("long").as("est"))
  }

  /** Arm-r Bloom bit position for a key: portable hash of
    * `bloom<r>‖US‖key`, mod m — replayed in SQL as
    * `('0x'||substr(md5('bloom'||r||chr(31)||key),1,15))::BIGINT % m`. */
  def bloomBit(r: Int, key: Column, m: Int): Column =
    pmod(TextOps.portableHash60(
      concat(lit("bloom" + r + Sampling.SeedSep), key)), lit(m.toLong))

  /**
   * Bloom-filter decontamination (Bloom 1970, public): the CONSTANT-MEMORY
   * scale path for the l25/l31 benchmark-collision check. The exact check
   * broadcasts the benchmark's full distinct-shingle hash set — fine for
   * one benchmark, but a release gate screening against HUNDREDS of eval
   * suites at once broadcasts gigabytes. A Bloom filter caps the broadcast
   * at m bits regardless of benchmark size: a corpus shingle is flagged iff
   * ALL k of its bit positions are set. One-sided error — a set shingle is
   * NEVER missed (no false negatives, the property a decontamination gate
   * needs); false-positive rate ≈ (1−e^{−kn/m})^k, tuned by m.
   *
   * Like the CMS (above) and unlike engine-native sketches, positions come
   * from the portable md5-derived hash family, so the SAME filter
   * materializes on any engine and a DuckDB oracle replays every per-doc
   * count EXACTLY — including the false positives.
   *
   * Scale shape: the bench side reduces to ≤ k·|bench shingles| DISTINCT
   * set-bit positions (broadcast; on a real deployment this is an m-bit
   * array — the relational row form here IS that bitmap, one row per set
   * bit). The corpus side is ONE scan: distinct shingle hashes per doc,
   * k skinny (doc, shingleHash, pos) arms, a broadcast left join, and two
   * hash-aggs. No corpus-text shuffle, no pairs.
   *
   * Output: (doc_id, n_shingles, n_flagged) — n_flagged counts the doc's
   * distinct shingles whose k arms are all set (an upper bound on true
   * collisions; a pipeline exact-verifies flagged docs downstream, which
   * is l25 restricted to the flagged slice).
   */
  def bloomDecontaminate(corpus: DataFrame, bench: DataFrame, textCol: String,
                         idCol: String, n: Int, k: Int = 3,
                         m: Int = 4096): DataFrame = {
    require(n > 0 && k > 0 && m > 0, "need positive n, k, m")
    def armPos(key: Column): Column = explode(array((0 until k).map(r =>
      bloomBit(r, key, m)): _*))
    val setBits = broadcast(
      bench.select(explode(array_distinct(TextOps.shingles(col(textCol), n))).as("sh"))
        .select(armPos(col("sh")).as("pos")).distinct()
        .withColumn("_set", lit(1L)))
    val arms = corpus.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextOps.shingles(col(textCol), n))).as("sh"))
      .select(col("doc_id"), TextOps.portableHash60(col("sh")).as("h"),
        armPos(col("sh")).as("pos"))
    arms.join(setBits, Seq("pos"), "left")
      .groupBy("doc_id", "h")
      .agg(min(coalesce(col("_set"), lit(0L))).as("_hit"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_shingles"),
        sum(col("_hit")).cast("long").as("n_flagged"))
  }
}
