package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One packed document: its chunk, the bin within the chunk it landed in,
  * and its token count. `chunk * 1e6 + bin` is a convenient global bin id
  * (bins per chunk are bounded by the chunk's doc count). */
final case class PackedDoc(doc_id: Long, chunk: Long, bin: Long, n_tokens: Long)

/**
 * Sequence packing for training pipelines: assign documents, in id order,
 * to bins of at most `binCapacity` tokens (greedy first-fit-in-order — the
 * standard packing that preserves corpus order and wastes at most one
 * underfull bin per boundary). A document larger than the capacity gets a
 * bin of its own.
 *
 * Greedy packing over a GLOBAL order is inherently sequential, which does
 * not scale; the scale-honest form packs independently within fixed
 * id-range CHUNKS (`floorDiv(doc_id, chunkSize)`): chunks are embarrassingly
 * parallel (one `flatMapGroups` with O(1) state per chunk, one shuffle on
 * the chunk key; the chunk key is `floorDiv(doc_id, chunkSize)` — floor,
 * not truncating, division, so negative ids bin identically to the
 * oracle's `//`), deterministic, and the only loss vs the global greedy is
 * ≤ 1 underfull bin per chunk boundary — negligible at real chunk sizes.
 * At 100 TB this is exactly a keyed aggregation: no global sort, no driver
 * state, bins bounded by construction.
 *
 * Engine extension beyond the reference (north-star LLM surface); the
 * DuckDB oracle replays the identical greedy fold per chunk via a
 * recursive CTE ([[graft.queries.BpeOracles.packingSql]]).
 */
object Packing {

  /**
   * Pack `(id, tokenCount)` rows into bins. Rows with NULL token counts
   * are excluded (mirror any upstream null-text filtering explicitly).
   */
  def packByTokenBudget(df: DataFrame, idCol: String, nTokensCol: String,
                        binCapacity: Long, chunkSize: Long): Dataset[PackedDoc] = {
    require(binCapacity > 0 && chunkSize > 0)
    import df.sparkSession.implicits._
    // NULL counts are dropped on the TYPED side, not with a relational
    // isNotNull filter: Catalyst pushes such a filter below the projection
    // and re-evaluates the (expensive) count expression once for the
    // filter and once for the project — doubling the tokenize cost when
    // the count is a BPE expression (no CSE across Filter/Project).
    df.select(col(idCol).cast("long"), col(nTokensCol).cast("long"))
      .as[(Long, Option[Long])]
      // floorDiv, not truncating `/`: the DuckDB oracle's `doc_id //
      // chunkSize` floors, and the two diverge on negative ids (-1/10 = 0
      // truncating vs -1 floored), silently shifting bin assignments.
      .groupByKey { case (id, _) => Math.floorDiv(id, chunkSize) }
      .flatMapGroups { (chunk: Long, rows: Iterator[(Long, Option[Long])]) =>
        // chunk doc count ≤ chunkSize by construction — the sort is bounded
        val sorted = rows.collect { case (id, Some(n)) => (id, n) }.toArray.sortBy(_._1)
        var bin = 0L
        var running = 0L
        sorted.iterator.map { case (id, n) =>
          if (running > 0 && running + n > binCapacity) { bin += 1; running = 0L }
          running += n
          PackedDoc(id, chunk, bin, n)
        }
      }
  }

  /** [[packByTokenBudget]] over raw text via [[Bpe.countTokens]]. */
  def packTextByTokenBudget(docs: DataFrame, idCol: String, textCol: String,
                            binCapacity: Long, chunkSize: Long,
                            merges: Seq[(String, String)] = Bpe.DefaultMerges)
      : Dataset[PackedDoc] =
    packByTokenBudget(
      docs.select(col(idCol), Bpe.countTokens(col(textCol), merges).as("_n")),
      idCol, "_n", binCapacity, chunkSize)

  /**
   * Packing-EFFICIENCY audit (Johnson 1973's bin-packing heuristics as a
   * one-row corpus report): per chunk, the bins used by the production
   * next-fit-in-id-order fold ([[packByTokenBudget]] — streaming, never
   * reopens a bin), by first-fit-DECREASING (the classic ≤ 11/9·OPT + 1
   * offline heuristic — what a pre-sorted materialization could achieve),
   * and the ⌈tokens/capacity⌉ lower bound — the table that decides
   * whether the cheap streaming fold is leaving GPU-batch utilization on
   * the table. One row of exact integers; utilization in micro-units.
   *
   * Scale shape: identical to [[packByTokenBudget]] — ONE shuffle on the
   * chunk key, O(chunkSize²) worst-case FFD inside each bounded chunk,
   * then a single global agg of chunk stats (tiny).
   */
  def packingEfficiency(docs: DataFrame, idCol: String, textCol: String,
                        binCapacity: Long, chunkSize: Long,
                        merges: Seq[(String, String)] = Bpe.DefaultMerges)
      : DataFrame = {
    require(binCapacity > 0 && chunkSize > 0)
    import docs.sparkSession.implicits._
    val perChunk = docs
      .select(col(idCol).cast("long"), Bpe.countTokens(col(textCol), merges).cast("long"))
      .as[(Long, Option[Long])]
      // drop null-count rows BEFORE grouping (typed side, same reasoning
      // as packByTokenBudget): a chunk of only-null docs must emit NO
      // stats row, matching the oracle's text-IS-NOT-NULL universe
      .flatMap { case (id, on) => on.map(n => (id, n)) }
      .groupByKey { case (id, _) => Math.floorDiv(id, chunkSize) }
      .mapGroups { (chunk: Long, rows: Iterator[(Long, Long)]) =>
        val ds = rows.toArray
        // next-fit in id order — packByTokenBudget's exact fold
        val byId = ds.sortBy(_._1)
        var bin = 0L
        var running = 0L
        byId.foreach { case (_, n) =>
          if (running > 0 && running + n > binCapacity) { bin += 1; running = 0L }
          running += n
        }
        val nfBins = if (ds.isEmpty) 0L else bin + 1
        // first-fit-decreasing: (n DESC, id ASC), first bin that fits
        val fills = scala.collection.mutable.ArrayBuffer[Long]()
        ds.sortBy { case (id, n) => (-n, id) }.foreach { case (_, n) =>
          val i = fills.indexWhere(_ + n <= binCapacity)
          if (i < 0) fills += n else fills(i) += n
        }
        val total = ds.map(_._2).sum
        (chunk, ds.length.toLong, total, nfBins, fills.length.toLong,
          (total + binCapacity - 1) / binCapacity)
      }
    perChunk.toDF("chunk", "n_docs", "total_tokens", "bins_nf", "bins_ffd", "lb")
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum("n_docs").cast("long").as("n_docs"),
        sum("total_tokens").cast("long").as("total_tokens"),
        sum("bins_nf").cast("long").as("bins_next_fit"),
        sum("bins_ffd").cast("long").as("bins_ffd"),
        sum("lb").cast("long").as("bins_lower_bound"))
      .select(col("*"),
        expr(s"total_tokens * 1000000L div (bins_next_fit * $binCapacity)")
          .as("util_next_fit_micro"),
        expr(s"total_tokens * 1000000L div (bins_ffd * $binCapacity)")
          .as("util_ffd_micro"))
  }

  /**
   * Materialize packed bins into training SEQUENCES: one row per
   * (chunk, bin) with the member texts joined in id order by `docSep`
   * (the \<doc\> boundary marker a trainer splits on), the member count,
   * and the bin's token total. One extra shuffle on (chunk, bin) over
   * skinny rows; texts travel once.
   */
  def materializeBins(docs: DataFrame, idCol: String, textCol: String,
                      binCapacity: Long, chunkSize: Long,
                      docSep: String = " <doc> ",
                      merges: Seq[(String, String)] = Bpe.DefaultMerges): DataFrame = {
    val packed = packTextByTokenBudget(docs, idCol, textCol, binCapacity,
      chunkSize, merges).toDF()
    packed.join(docs.select(col(idCol).as("doc_id"), col(textCol).as("_text")), "doc_id")
      .groupBy("chunk", "bin")
      .agg(
        graft.ops.Agg.stringAggOrderedBy(col("_text"), col("doc_id"), docSep).as("seq_text"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))
  }

  /**
   * Prefix-cache-aware serving order — the batch-inference scheduling
   * step for engines with automatic prefix caching (vLLM's prefix cache,
   * SGLang's RadixAttention — both public): requests that share a prompt
   * prefix re-use each other's KV cache ONLY if they run adjacently, so
   * ordering a batch by prompt prefix converts shared boilerplate
   * (system prompts, few-shot headers) into cache hits. Each doc gets a
   * position within its first-token BUCKET (ordered by the full k-token
   * prefix, then id) plus `est_cached_tokens` — the exact token-LCP with
   * its predecessor, the KV re-use a prefix-caching server would get.
   *
   * Scale shape: the window partitions by the FIRST token, never a
   * global order — cache locality only exists within a co-scheduled
   * shard anyway, and a cross-bucket boundary has LCP 0 by definition,
   * so bucketing loses nothing while keeping every partition
   * independent. LCP is computed as Σ_{j≤k} 1[prefix_j(a) = prefix_j(b)]
   * — the indicators are monotone in j, so the sum IS the longest
   * common prefix, in pure slice-equality form any engine replays.
   *
   * Output: (doc_id, bucket, pos, n_prefix_tokens, est_cached_tokens).
   */
  def prefixCacheOrder(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        slice(filter(TextOps.whitespaceTokens(col(textCol)),
          t => length(t) > 0), 1, k).as("_pk"))
    val w = Window.partitionBy(element_at(col("_pk"), 1))
      .orderBy(array_join(col("_pk"), " "), col("doc_id"))
    val lcp = (1 to k).map(j =>
      when(slice(col("_pk"), 1, j) === slice(col("_prev"), 1, j), 1L)
        .otherwise(0L)).reduce(_ + _)
    base
      .withColumn("bucket", element_at(col("_pk"), 1))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("_prev", lag(col("_pk"), 1).over(w))
      .select(col("doc_id"), col("bucket"), col("pos"),
        size(col("_pk")).cast("long").as("n_prefix_tokens"),
        // cap at the shorter array: slice(a, 1, j) with j > size(a)
        // returns the WHOLE array, so identical prompts shorter than k
        // would otherwise fire all k indicators and report an LCP larger
        // than the tokens that exist (round-9 advisor finding)
        when(col("_prev").isNull, 0L)
          .otherwise(least(lcp, size(col("_pk")).cast("long"),
            size(col("_prev")).cast("long")))
          .as("est_cached_tokens"))
  }

  /**
   * Deterministic STRIDE-SCHEDULED interleave of a weighted source
   * mixture (Waldspurger–Weihl stride scheduling, OSDI '94 — public):
   * source s with weight wₛ serves its i-th item (1-based rank by id) at
   * virtual time vt = i·mₛ, mₛ = lcm(weights)/wₛ; the epoch streams in vt
   * order, ties broken by source name order then id. Every window of W
   * consecutive positions then carries ≈ W·wₛ/Σw items of source s — the
   * "every batch mixed to the target ratio" property a training data
   * loader wants, with no RNG and no shuffle buffer.
   *
   * The point of this formulation: the global 0-based position is a
   * CLOSED FORM, not a sort —
   *
   *   pos(s,i) = Σ_t min(⌊(vt−1)/m_t⌋, n_t)
   *            + Σ_{t with idx(t) < idx(s)} [vt mod m_t = 0 ∧ vt/m_t ≤ n_t]
   *
   * (the first sum counts every item of every source — including s's own
   * i−1 — with strictly earlier virtual time, capped by that source's
   * actual item count n_t; the second counts same-vt items of sources
   * that win the tie). Each row computes its position from per-source
   * totals alone: one rank window per SOURCE partition plus a
   * driver-collected count map bounded by the mixture size — never a
   * global ordering shuffle. The DuckDB oracle replays the order with an
   * actual global sort, independently validating the closed form.
   *
   * Sources absent from `weights` are excluded (a mixture spec names its
   * members). Output: (id, source, src_rank, vt, position) — position is
   * a permutation of 0..N−1.
   */
  def mixtureInterleave(docs: DataFrame, idCol: String, sourceCol: String,
                        weights: Map[String, Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val sources = weights.keys.toSeq.sorted
    @annotation.tailrec def gcd(a: Long, b: Long): Long =
      if (b == 0) a else gcd(b, a % b)
    val lcmAll = weights.values.map(_.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val m: Map[String, Long] = weights.map { case (s, w) => s -> lcmAll / w }
    val filtered = docs
      .filter(col(sourceCol).isin(sources: _*))
      .select(col(idCol).cast("long").as("_id"), col(sourceCol).as("source"))
    // per-source totals: bounded by the mixture size (the l33/l63 shape)
    val counts: Map[String, Long] = filtered.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val siMap: Map[String, Long] =
      sources.zipWithIndex.map { case (s, j) => s -> j.toLong }.toMap
    val rank = row_number().over(
      Window.partitionBy(col("source")).orderBy(col("_id"))).cast("long")
    val posTerms = sources.zipWithIndex.map { case (t, j) =>
      val mt = m(t); val nt = counts(t)
      s"least((vt - 1) div ${mt}L, ${nt}L)" +
        s" + (CASE WHEN _si > $j AND vt % ${mt}L = 0 AND vt div ${mt}L <= ${nt}L" +
        s" THEN 1L ELSE 0L END)"
    }.mkString(" + ")
    filtered
      .withColumn("src_rank", rank)
      .withColumn("vt", col("src_rank") * element_at(typedlit(m), col("source")))
      .withColumn("_si", element_at(typedlit(siMap), col("source")))
      .withColumn("position", expr(posTerms).cast("long"))
      .select(col("_id").as(idCol), col("source"), col("src_rank"),
        col("vt"), col("position"))
  }
}
