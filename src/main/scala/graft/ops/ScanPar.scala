package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * Scale-adaptive scan widening (optimization guide §2.5 "input skew: one
 * huge unsplittable file … repartition immediately after the read", §6
 * input-split sizing).
 *
 * Parquet splits at ROW-GROUP granularity: a table laid out as one file
 * with one row group scans as ONE task no matter how small
 * `spark.sql.files.maxPartitionBytes` is, so every expression computed
 * before the first exchange (shingle md5 pipelines, string fixture
 * derivations, partial aggregates) runs single-threaded. Measured at
 * sf0.1/32 cores (QueryProbe, round 14): l19's signature stage 3.0 s on
 * 1 task, c11's fixture-projection stage 6.5 s on 1 task — the dominant
 * stage of most of the bench's top-20 rows.
 *
 * `widen` round-robin-repartitions a freshly-read frame to the session's
 * default parallelism ONLY when the underlying file layout cannot fill the
 * cores on its own — total input bytes below
 * (defaultParallelism × maxPartitionBytes) — so:
 *
 *  - at bench scale (MB-sized single-file tables) the downstream pipeline
 *    fans out to every core for the price of shuffling the pruned input
 *    once (predicate/projection pushdown still reaches the scan — Catalyst
 *    pushes filters and column pruning through a Repartition);
 *  - at 100 TB the inputs split into ≫ parallelism scan tasks, the
 *    condition is false, and the plan is untouched — no corpus-wide
 *    re-shuffle ever sneaks into a production-sized run.
 *
 * The decision is derived from input size and core count, never a
 * hard-coded local constant (the "scale-adaptive partitioning" rule).
 * Frames with no file inputs (in-memory fixtures) are left alone.
 *
 * Correctness: round-robin repartition preserves multiset semantics and
 * (with Spark's default sort-before-repartition) is deterministic under
 * task retry; callers must be order-insensitive (every registered query
 * that uses this is — the driver gate sorts rows before hashing, and no
 * widened operator samples by partition or position).
 */
object ScanPar {

  /** Tables below this size stay un-widened: a sub-quarter-MB table (the
    * bench's dimension tables) can't host enough per-row work to repay an
    * exchange, and dims should stay trivially broadcastable. */
  val MinBytes: Long = 256L << 10

  /** Per-path file sizes, cached across query constructions (round 15,
    * ADVICE): widen runs at PLAN time, so on a multi-thousand-file
    * production table the per-file getFileStatus RPCs would add planning
    * latency exactly where widen then no-ops. Parquet data files are
    * immutable once written (new data = new files), so a cached length
    * never changes a widen decision. */
  private val sizeCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total size of `df`'s file inputs, via the per-path cache.
    * None = no file inputs (in-memory fixture); Some(-1) = listing or
    * stat failed (unknown layout — callers keep the conservative shape).
    * NonFatal only (round 15, ADVICE): a Throwable catch here swallowed
    * OOM/LinkageError/interrupts into a silent fallback. */
  private[graft] def inputBytes(df: DataFrame): Option[Long] = {
    val files = try df.inputFiles catch { case scala.util.control.NonFatal(_) => Array.empty[String] }
    if (files.isEmpty) return None
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    try {
      Some(files.map { f =>
        val cached = sizeCache.get(f)
        if (cached != null) cached.longValue()
        else {
          val path = new Path(f)
          val len = path.getFileSystem(hconf).getFileStatus(path).getLen
          sizeCache.put(f, len)
          len
        }
      }.sum)
    } catch { case scala.util.control.NonFatal(_) => Some(-1L) } // unknown layout
  }

  /** See object doc. No-ops when: single-core session; no file inputs
    * (in-memory fixtures); layout already yields ≥ parallelism splits;
    * or the table is under [[MinBytes]]. Nested calls are harmless —
    * Catalyst's CollapseRepartition merges adjacent repartitions. */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    if (p <= 1) return df
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    inputBytes(df) match {
      case Some(bytes) if bytes >= MinBytes && bytes < p.toLong * maxSplit => df.repartition(p)
      case _ => df // in-memory, unknown, tiny, or already wide enough
    }
  }
}
