package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-file Bloom-filter index — the point-lookup file-skipping structure
 * Parquet exposes as column bloom filters and Delta/Iceberg keep in file
 * stats: a tiny bits-per-file table that answers "can file F contain key
 * v?" with no false NEGATIVES, so a selective probe reads only the
 * candidate files. Min/max footers (s21/s23) prune RANGE predicates; a
 * Bloom index prunes EQUALITY probes on high-cardinality, unclustered
 * columns where min/max spans are useless — at 100 TB the difference
 * between "read 3 files" and "read every file whose [min,max] straddles
 * the key", i.e. all of them. BloomIndexSpec measures real file-level
 * skipping; the s25 registry row replays the full audit table (candidate
 * + present + false-positive flags) bit-for-bit against DuckDB.
 *
 * Portability: k bit positions per key come from the md5-backed
 * portable 60-bit hash (`TextOps.portableHash60`) on `"bf<i>|<key>"`,
 * mod `mBits`; words pack 60 bits (not 64 — DuckDB's `<<` throws on
 * `1 << 63`, and 60 keeps every mask positive on both engines). The
 * filter for a file is the elementwise OR of its keys' masks — built
 * with one `bit_or` hash-agg, mergeable across partitions by
 * construction (OR is associative-commutative), so the build is one
 * shuffle on (file, word) regardless of corpus size.
 */
object BloomIndex {

  val BitsPerWord = 60

  /** Bit position i ∈ [0, k) for a key: portable-hash60("bf<i>|<key>") mod mBits. */
  def bitPosition(key: Column, i: Int, mBits: Int): Column =
    graft.llm.TextOps.portableHash60(
      concat(lit(s"bf$i|"), key.cast("string"))) % mBits

  /** Per-file Bloom filter as a (file, word, bits) table: one row per
    * 60-bit word with at least one set bit. ONE shuffle (the (file, word)
    * hash-agg with map-side partial bit_or); index size is bounded by
    * files × ceil(mBits/60), independent of row count. */
  def buildIndex(df: DataFrame, fileCol: Column, keyCol: Column,
                 k: Int = 4, mBits: Int = 16380): DataFrame = {
    require(k >= 1 && mBits >= BitsPerWord && mBits % BitsPerWord == 0,
      s"mBits must be a positive multiple of $BitsPerWord")
    df.select(fileCol.as("file_id"), keyCol.as("_key"))
      .select(col("file_id"), explode(array(
        (0 until k).map(i => bitPosition(col("_key"), i, mBits)): _*)).as("pos"))
      .select(col("file_id"),
        (col("pos") / BitsPerWord).cast("int").as("word"),
        expr(s"shiftleft(1L, cast(pos % $BitsPerWord as int))").as("mask"))
      .groupBy("file_id", "word")
      .agg(expr("bit_or(mask)").cast("long").as("bits"))
  }

  /** Candidate files for each probe key: every one of the probe's k bits
    * is set in the file's filter. The exploded probe-position table joins
    * the index on `word` (positions × files-having-that-word — index-sized,
    * never corpus-sized); a file is a candidate iff all k positions found
    * their word row AND their bit. Output: (probe, file_id, candidate). */
  def candidates(index: DataFrame, probes: DataFrame, probeCol: String,
                 k: Int = 4, mBits: Int = 16380): DataFrame = {
    val pos = probes
      .select(col(probeCol).as("probe"), explode(array(
        (0 until k).map(i => bitPosition(col(probeCol), i, mBits)): _*)).as("pos"))
      .select(col("probe"),
        (col("pos") / BitsPerWord).cast("int").as("word"),
        expr(s"shiftleft(1L, cast(pos % $BitsPerWord as int))").as("mask"))
    pos.join(broadcast(index), "word")
      .groupBy("probe", "file_id")
      .agg((count(lit(1)) === k &&
        expr("bool_and((bits & mask) = mask)")).as("candidate"))
  }

  /** Full audit table for a probe set: per (probe, file) the Bloom verdict
    * vs ground truth — `candidate`, `present`, `false_positive`. The
    * no-false-NEGATIVE guarantee is the absence of any (present ∧
    * ¬candidate) row; false-positive rows measure the filter's saturation
    * at the chosen (k, mBits). Rows are the sparse union of
    * bloom-positive and truly-present pairs, never a probe × file grid. */
  def probeAudit(df: DataFrame, fileCol: Column, keyCol: Column,
                 probes: Seq[Long], k: Int = 4, mBits: Int = 16380): DataFrame = {
    val base = df.select(fileCol.as("file_id"), keyCol.cast("long").as("_key"))
    val index = buildIndex(base, col("file_id"), col("_key"), k, mBits)
    val probeDf = base.sparkSession.range(1)
      .select(explode(array(probes.map(lit(_)): _*)).as("probe"))
    val cand = candidates(index, probeDf, "probe", k, mBits)
    val present = base
      .filter(col("_key").isin(probes: _*))
      .select(col("_key").as("probe"), col("file_id")).distinct()
      .withColumn("present", lit(true))
    cand.join(present, Seq("probe", "file_id"), "full_outer")
      .select(col("probe"), col("file_id"),
        coalesce(col("candidate"), lit(false)).as("candidate"),
        coalesce(col("present"), lit(false)).as("present"))
      .withColumn("false_positive", col("candidate") && !col("present"))
  }

  /**
   * Bloom PRE-FILTERED semi join — the shuffle-volume cutter for a
   * selective fact⋈dim join (the runtime-filter idea Spark's AQE applies
   * to broadcast joins, here as an explicit operator that also covers
   * shuffle joins): build ONE Bloom filter over all dim keys (a bit_or
   * hash-agg down to ⌈mBits/60⌉ words, collected to the driver — bounded
   * by mBits, independent of dim row count), apply it to the fact side
   * as an EXPRESSION-ONLY pre-filter that pushes to the scan, then run
   * the real semi join to drop the false positives.
   *
   * Output ≡ `fact LEFT SEMI JOIN dim` exactly: Bloom filters have no
   * false negatives, and every false positive dies in the verifying
   * join — the filter changes WHERE rows are dropped (before the
   * exchange instead of after), never WHICH. At 100 TB that is the
   * difference between shuffling the whole fact table and shuffling
   * `match-rate + ε` of it (ε = the false-positive mass, ~(1−e^(−kn/m))^k).
   *
   * Positions use xxhash64 (no oracle needs to replay them — the output
   * is oracle-checked against the plain semi join); the filter build is
   * one skinny shuffle of dim key positions.
   */
  private def xxPositions(c: Column, k: Int, mBits: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(c, lit(i)), lit(mBits)))

  /** Fold a dim key column into one Bloom filter: ⌈mBits/60⌉ packed words
    * via a bit_or hash-agg, collected to the driver (bounded by mBits,
    * never by dim row count). */
  def buildFilterWords(dim: DataFrame, dimKey: String,
                       k: Int = 4, mBits: Int = 16380): Seq[Long] = {
    require(k >= 1 && mBits >= BitsPerWord && mBits % BitsPerWord == 0,
      s"mBits must be a positive multiple of $BitsPerWord")
    val wordRows = dim
      .select(explode(array(xxPositions(col(dimKey), k, mBits): _*)).as("pos"))
      .select((col("pos") / BitsPerWord).cast("int").as("word"),
        expr(s"shiftleft(1L, cast(pos % $BitsPerWord as int))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").cast("long").as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until mBits / BitsPerWord).map(w => wordRows.getOrElse(w, 0L))
  }

  /** Expression-only might-contain test against a built filter: pushes to
    * the scan, no false negatives. The packed words expand to one
    * mBits-long boolean array riding the plan as a single reference
    * object (the l107 goto-table pattern) — `shiftright` can't take a
    * column shift amount, and an element_at probe is one codegen'd array
    * access per hash anyway. */
  def mightContain(key: Column, words: Seq[Long],
                   k: Int = 4, mBits: Int = 16380): Column = {
    require(words.length == mBits / BitsPerWord,
      s"filter has ${words.length} words, expected ${mBits / BitsPerWord}")
    val bits: Seq[Boolean] = (0 until mBits).map { p =>
      (words(p / BitsPerWord) >> (p % BitsPerWord) & 1L) == 1L
    }
    val bitsLit = typedlit(bits)
    xxPositions(key, k, mBits)
      .map(p => element_at(bitsLit, p.cast("int") + 1))
      .reduce(_ && _)
  }

  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    k: Int = 4, mBits: Int = 16380): DataFrame = {
    val words = buildFilterWords(dim, dimKey, k, mBits)
    fact.filter(mightContain(col(factKey), words, k, mBits))
      .join(dim.select(col(dimKey).as("_dk")).distinct(),
        col(factKey) === col("_dk"), "left_semi")
  }
}
