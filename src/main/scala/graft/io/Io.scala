package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, StringType}
import graft.normalize.Normalize

/**
 * Readers/writers wrapping Spark sources with the reference's semantics:
 * null-marker spellings, duplicate-header dedup, per-cell normalization,
 * row-count invariants, CTAS zero-row guard.
 *
 * Reference: cda_bq_etl/data_helpers.py:489-557 (`create_normalized_tsv`),
 * :35-75 (TSV/JSONL writers), cda_bq_etl/bq_helpers/create_modify.py:108-208
 * (loads + CTAS guard).
 */
object Io {

  /** Pipeline-fatal zero-row CTAS (create_modify.py:126-128). */
  final class ZeroRowsException(msg: String) extends RuntimeException(msg)

  /**
   * S1 — TSV reader with reference semantics: tab-separated, first line is
   * the header; duplicate header names deduped to `name`, `name_1`, …
   * (data_helpers.py:497-516); all cells read as strings and normalized
   * per `normalize_value` (null markers → NULL, bool spellings →
   * True/False, trivial floats → ints) when `normalize = true`.
   *
   * Reads distributed (Spark csv source); only the header line is touched
   * on the driver. Scale: the normalization pass is pure `when/rlike`
   * expressions — codegen'd into the scan, no extra stage.
   */
  def readTsv(spark: SparkSession, path: String, normalize: Boolean = true,
              verifyHeaders: Boolean = false): DataFrame = {
    // Resolve the header from the lexicographically-FIRST non-empty visible
    // file: `spark.read.text(dir).limit(1)` picks an arbitrary split in
    // multi-file dirs, and a fully-empty input would throw a bare
    // ArrayIndexOutOfBounds instead of a diagnosable error.
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val globbed = Option(fs.globStatus(hp)).getOrElse(Array.empty)
    val files = globbed
      .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath) else Array(st))
      .filter(st => st.isFile && st.getLen > 0)
      .map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .sortBy(_.toString)
    require(files.nonEmpty, s"readTsv: no non-empty input files at $path")
    // a byte-non-empty file can still hold zero text rows (e.g. an empty
    // gzip member) — advance to the next sorted candidate rather than
    // aborting while valid input exists; fail diagnosably only when EVERY
    // candidate is line-empty
    val headerLine = files.view
      .flatMap(f => spark.read.text(f.toString).limit(1).collect().headOption)
      .headOption.map(_.getString(0))
      .getOrElse(throw new IllegalArgumentException(
        s"readTsv: no input file with any text rows at $path"))
    // csv(header=true) + an explicit schema DROPS the first line of EVERY
    // file without checking it: a file whose header disagrees in column
    // order is silently misaligned to the resolved header. Opt-in guard
    // (driver-side, one tiny job per file — O(files), not O(bytes); leave
    // off on hot multi-thousand-file dirs, on for audited loads):
    if (verifyHeaders) {
      files.drop(1).foreach { f =>
        val first = spark.read.text(f.toString).limit(1).collect()
          .headOption.map(_.getString(0))
        first.filter(_ != headerLine).foreach { h =>
          throw new IllegalArgumentException(
            s"readTsv: header mismatch in $f — expected '$headerLine', found '$h'; " +
              "files in one load must agree on column order")
        }
      }
    }
    val headers = Normalize.dedupHeader(headerLine.split("\t", -1).toSeq)
    val schema = StructType(headers.map(h => StructField(h, StringType, nullable = true)))
    val raw = spark.read
      .option("sep", "\t").option("header", "true")
      .schema(schema)
      .csv(path)
    if (normalize) Normalize.normalizeStringColumns(raw) else raw
  }

  /**
   * S1 row-count invariant (data_helpers.py:550-557): normalized output must
   * have exactly as many rows as the raw input. Runs two counts; call only
   * in audited loads, not per-query.
   */
  def readTsvChecked(spark: SparkSession, path: String): DataFrame = {
    // the audited load takes the belt-and-braces path: per-file header
    // agreement too, not just the row-count invariant
    val df = readTsv(spark, path, verifyHeaders = true)
    val rawCount = spark.read.option("sep", "\t").option("header", "true").csv(path).count()
    val outCount = df.count()
    require(rawCount == outCount,
      s"normalize row-count invariant violated: raw=$rawCount normalized=$outCount for $path")
    df
  }

  /** S4 — TSV writer with the reference's null marker (data_helpers.py:35-56). */
  def writeTsv(df: DataFrame, path: String, nullMarker: String = "None"): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t").option("header", "true").option("nullValue", nullMarker)
      .option("emptyValue", "").csv(path)

  /** S3 — JSONL writer (data_helpers.py:59-75): newline-delimited JSON. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC sink/source (engine extension — the columnar format Spark ships
    * alongside parquet; the reference's BQ loads have no counterpart). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S5 — JSONL → table load with explicit schema (create_modify.py:178-208). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S6 — typed TSV load with null marker + skip-header (create_modify.py:137-175). */
  def readTsvTyped(spark: SparkSession, path: String, schema: StructType,
                   nullMarker: String = "None"): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .option("nullValue", nullMarker).schema(schema).csv(path)

  /**
   * S7 — CTAS with the reference's 0-row guard: materialize `df` at `path`
   * (parquet, overwrite) and fail the pipeline when the result is empty
   * (create_modify.py:108-134, 280-303). Returns the re-read table.
   */
  def ctasParquet(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    val out = spark.read.parquet(path)
    if (out.isEmpty) throw new ZeroRowsException(s"CTAS produced 0 rows at $path")
    out
  }

  /**
   * Incremental file-watermark scan — the daily-ingest source shape: an
   * append-only parquet directory is read ONLY for files modified after
   * the caller's watermark, and the new watermark (max mtime seen) is
   * returned for the next run's checkpoint. This is the file-level twin
   * of the row-level incremental-dedup admission (llm/Dedup
   * .incrementalDedup): at 100 TB the win is identical — a daily batch
   * touches only the new files, never re-lists yesterday's data into the
   * scan. Listing cost is metadata-bounded (one `listStatus`); at real
   * lake scale the same contract is served by a manifest/commit log
   * (publish/CasPublish), which this API deliberately mirrors: callers
   * persist the returned watermark, not file sets.
   *
   * Boundary correctness (round-9 advisor finding): mtime has
   * millisecond granularity, so a file committed in the SAME millisecond
   * as the returned watermark — or landing while the listing runs with
   * an mtime equal to an already-consumed file's — would be permanently
   * skipped by a strict `mtime > watermark` filter. The admission rule
   * is therefore `mtime > watermark OR (mtime == watermark AND name ∉
   * consumedAtWatermark)`, and the checkpoint the caller persists is the
   * PAIR (watermark, names consumed AT that watermark) — exactly the
   * (ts, keys-at-ts) cursor shape of keyset pagination (o7). The name
   * set is bounded by files sharing one millisecond, not corpus size.
   *
   * Returns (rows from new files only, new watermark, names consumed at
   * the new watermark). With no new files, an EMPTY frame with the
   * directory's full schema and the unchanged checkpoint.
   */
  def readSince(spark: SparkSession, dir: String, watermarkMillis: Long,
                consumedAtWatermark: Set[String] = Set.empty)
      : (DataFrame, Long, Set[String]) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    val fresh = files.filter(s =>
      s.getModificationTime > watermarkMillis ||
        (s.getModificationTime == watermarkMillis &&
          !consumedAtWatermark.contains(s.getPath.getName)))
    val newWm = (watermarkMillis +: fresh.map(_.getModificationTime)).max
    // every file AT the new watermark is consumed after this read —
    // including ones admitted in a previous run when newWm == watermark
    val atBoundary = files.filter(_.getModificationTime == newWm)
      .map(_.getPath.getName).toSet ++
      (if (newWm == watermarkMillis) consumedAtWatermark else Set.empty)
    val df =
      if (fresh.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(fresh.map(_.getPath.toString): _*)
    (df, newWm, atBoundary)
  }

  /** S9 — table copy (create_modify.py:355-380), parquet-dir flavored. */
  def copyTable(spark: SparkSession, srcPath: String, dstPath: String,
                replace: Boolean = true): Unit = {
    val mode = if (replace) "overwrite" else "errorifexists"
    spark.read.parquet(srcPath).write.mode(mode).parquet(dstPath)
  }

  /** One column of a fixed-width layout: `width` characters, cast to
    * `dataType` after pad-trimming. */
  final case class FixedWidthCol(name: String, width: Int, dataType: String = "string")

  /**
   * Fixed-width text source (engine extension — the mainframe/COBOL-era
   * layout feeds still common in clinical registries; no BQ counterpart
   * in the reference, which loads only TSV/JSONL). Classic semantics:
   * fields are sliced at fixed character offsets, pad characters (spaces
   * on BOTH sides — numbers arrive right-aligned, strings left-aligned)
   * are trimmed, an all-blank field is NULL, and the typed cast runs
   * after trimming. One `substring` + `trim` + `cast` chain per column —
   * whole-stage-codegen'd, no UDF, no per-line split allocation.
   */
  def readFixedWidth(spark: SparkSession, path: String,
                     spec: Seq[FixedWidthCol]): DataFrame = {
    require(spec.nonEmpty && spec.forall(_.width > 0), "spec needs positive widths")
    val raw = spark.read.text(path)
    val offsets = spec.scanLeft(1)((off, c) => off + c.width)
    raw.select(spec.zip(offsets).map { case (c, off) =>
      nullif(trim(substring(col("value"), off, c.width)), lit(""))
        .cast(c.dataType).as(c.name)
    }: _*)
  }

  /** Fixed-width writer twin: right-align (lpad) numeric columns,
    * left-align (rpad) everything else, NULL → all blanks. Values wider
    * than their field are refused (truncation would corrupt silently). */
  def writeFixedWidth(df: DataFrame, path: String,
                      spec: Seq[FixedWidthCol]): Unit = {
    val numeric = Set("long", "int", "bigint", "integer", "short", "double", "decimal")
    val fields = spec.map { c =>
      val isNum = numeric.exists(c.dataType.toLowerCase.startsWith)
      val s = col(c.name).cast("string")
      val padded = when(s.isNull, lit(" " * c.width))
        .otherwise(if (isNum) lpad(s, c.width, " ") else rpad(s, c.width, " "))
      when(length(s) > c.width,
        raise_error(concat(lit(s"fixed-width overflow in ${c.name}: "), s)))
        .otherwise(padded)
    }
    df.select(concat(fields: _*).as("value")).write.mode("overwrite").text(path)
  }
}
