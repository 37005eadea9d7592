package graft.publish

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Diff

/**
 * Object-store-safe transactional publish: compare-and-swap commit log.
 *
 * [[Publish.PointerCurrent]] swaps one `name_current.ptr` file via
 * ATOMIC_MOVE — correct on a POSIX filesystem, but S3/GCS have no atomic
 * rename, and the reference's publish gate
 * (cda_bq_etl/bq_helpers/lookup.py:650-727) runs against exactly such a
 * store. This variant needs only ONE primitive the object stores *do*
 * provide — conditional put ("create iff absent": S3 `If-None-Match: *`,
 * GCS `x-goog-if-generation-match: 0`) — and never renames data:
 *
 *  - data dirs are written once under a UNIQUE name
 *    (`name_d_<token>`) and are immutable thereafter (no O(files)
 *    dir-rename, which object stores also lack);
 *  - a commit is one tiny manifest `name_log/gen-<G>.json` created
 *    iff absent. Generation G's manifest names the data dir that IS
 *    version G. The highest committed generation is "current".
 *
 * Two concurrent publishers racing for generation G+1: exactly one
 * conditional put succeeds; the loser re-reads the new head, re-runs the
 * diff gate against the WINNER's content (identical → skip, the
 * reference's lookup.py:692-705 semantics; different → retry at G+2).
 * Readers resolve the latest manifest and read an immutable, fully
 * written data dir — old or new, never a mix, no read locks.
 *
 * The local primitive emulating conditional put is `Files.createLink`
 * (link(2)): write the payload to a private tmp file, hard-link it to the
 * target name — link fails with EEXIST if the target exists and is atomic
 * on POSIX. (A plain ATOMIC_MOVE cannot emulate it: rename(2) silently
 * REPLACES an existing target.) Swapping in a real S3/GCS/etcd backend
 * means reimplementing [[PointerStore.putIfAbsent]] only.
 */
object CasPublish {

  /** The one primitive a backend must provide: atomically create
    * generation `gen`'s record iff absent; plus list/read for recovery. */
  trait PointerStore {
    /** True iff this call created the record (won the race). */
    def putIfAbsent(gen: Long, payload: String): Boolean
    /** Highest committed generation, 0 if none. */
    def latestGen(): Long
    /** Payload of generation `gen` (must exist). */
    def read(gen: Long): String
  }

  /** Local-filesystem store: one `gen-<%020d>.json` per commit under
    * `logDir`, created via write-tmp + hard-link (create-iff-absent). */
  final class FileStore(logDir: Path) extends PointerStore {
    Files.createDirectories(logDir)
    private def genPath(gen: Long): Path = logDir.resolve(f"gen-$gen%020d.json")

    def putIfAbsent(gen: Long, payload: String): Boolean = {
      val tmp = Files.createTempFile(logDir, ".stage-", ".tmp")
      try {
        Files.write(tmp, payload.getBytes("UTF-8"))
        try { Files.createLink(genPath(gen), tmp); true }
        catch { case _: FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(tmp)
    }

    def latestGen(): Long = {
      if (!Files.isDirectory(logDir)) return 0L
      val s = Files.list(logDir)
      try {
        var max = 0L
        val it = s.iterator()
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("gen-") && n.endsWith(".json")) {
            val g = n.stripPrefix("gen-").stripSuffix(".json").toLong
            if (g > max) max = g
          }
        }
        max
      } finally s.close()
    }

    def read(gen: Long): String =
      new String(Files.readAllBytes(genPath(gen)), "UTF-8")
  }

  final case class CasResult(published: Boolean, generation: Long,
                             dataPath: String, attempts: Int)

  private def store(root: String, name: String): FileStore =
    new FileStore(Paths.get(root, s"${name}_log"))

  private def dataDirOf(payload: String): String =
    """"data":\s*"([^"]+)"""".r.findFirstMatchIn(payload)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(s"malformed commit manifest: $payload"))

  /**
   * Diff-gated CAS publish. Stages `df` once to a unique immutable dir,
   * then loops: re-read head, gate against head's content, try the
   * conditional put for head+1. `maxAttempts` bounds livelock under
   * pathological contention (each failed attempt means some OTHER
   * publisher committed — system-wide progress is guaranteed).
   */
  def publish(spark: SparkSession, df: DataFrame, root: String, name: String,
              maxAttempts: Int = 10): CasResult =
    publishWith(spark, df, root, name, store(root, name), maxAttempts)

  /** [[publish]] against an injected [[PointerStore]] — the seam for real
    * object-store backends AND for fault-model tests (PublishSpec injects
    * list-after-write lag and put-if-absent races the POSIX FileStore
    * cannot exhibit, proving the loop converges with one winner per
    * generation under eventual-consistency listings). */
  def publishWith(spark: SparkSession, df: DataFrame, root: String, name: String,
                  st: PointerStore, maxAttempts: Int = 10): CasResult = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataName = s"${name}_d_$token"
    val dataPath = s"$root/$dataName"
    df.write.mode("errorifexists").parquet(dataPath)
    val staged = spark.read.parquet(dataPath)

    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val head = st.latestGen()
      if (head > 0) {
        val headData = dataDirOf(st.read(head))
        val headDf = spark.read.parquet(s"$root/$headData")
        if (Diff.tablesMatch(headDf, staged)) {
          // identical to current head (possibly a racing winner's) → skip;
          // drop the staged dir, nothing references it
          deleteRecursively(Paths.get(dataPath))
          return CasResult(published = false, head, s"$root/$headData", attempt)
        }
      }
      val payload =
        s"""{"name": "$name", "gen": ${head + 1}, "data": "$dataName"}"""
      if (st.putIfAbsent(head + 1, payload))
        return CasResult(published = true, head + 1, dataPath, attempt)
      // lost the race: someone else committed head+1 — re-gate and retry
    }
    deleteRecursively(Paths.get(dataPath))
    throw new IllegalStateException(
      s"CAS publish of $name lost $maxAttempts consecutive races; giving up (staged data dropped)")
  }

  /** Highest committed generation (0 = family unpublished). */
  def currentGeneration(root: String, name: String): Long =
    store(root, name).latestGen()

  /** Read the current table: latest committed generation's data dir. */
  def readCurrent(spark: SparkSession, root: String, name: String): DataFrame = {
    val st = store(root, name)
    val g = st.latestGen()
    require(g > 0, s"no committed generation for $name under $root")
    spark.read.parquet(s"$root/${dataDirOf(st.read(g))}")
  }

  /** Time travel: read generation `gen` (immutable under this scheme). */
  def readGeneration(spark: SparkSession, root: String, name: String, gen: Long): DataFrame =
    spark.read.parquet(s"$root/${dataDirOf(store(root, name).read(gen))}")

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      val children = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) children += it.next()
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }
}
