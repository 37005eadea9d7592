package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.{Io, SchemaInfer}
import Registry.td

/**
 * SURVEY §2.1 — sources/sinks S1–S7 as round-trip queries: each builds a
 * deterministic fixture under target/io_fixtures from the testdata tables,
 * writes it through the graft sink, reads it back through the graft source,
 * and oracle-checks against SQL over the original table.
 */
object IoQueries {

  private val FixtureRoot = "/root/repo/target/io_fixtures"

  val all: Seq[(String, Q)] = Seq(

    // S1/S2 — TSV write → header-dedup + normalize + sampled type inference
    //   read-back (create_normalized_tsv, data_helpers.py:489-557 + 220-277).
    //   Fixture: nation with messy spellings; two columns named "val".
    "s1_tsv_read_normalize" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s1_${new java.io.File(dir).getName}"
        val messy = td(s, dir, "nation").select(
          col("n_nationkey").cast("string").as("key"),
          expr("""CASE CAST(n_nationkey % 4 AS INT) WHEN 0 THEN 'NA' WHEN 1 THEN 'yes'
                 |WHEN 2 THEN '12.00' ELSE n_name END""".stripMargin).as("val"),
          col("n_name").as("val2"))
        // hand-write the TSV with a DUPLICATE header name (val, val) — the
        // csv sink can't emit duplicates, the reference's readers must fix them
        val lines = "key\tval\tval" +:
          messy.collect().map(r => Seq(r.getString(0), r.getString(1), r.getString(2)).mkString("\t")).toSeq
        val f = new java.io.File(path); f.mkdirs()
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$path/data.tsv"),
          lines.mkString("\n").getBytes("UTF-8"))
        Io.readTsv(s, s"$path/data.tsv")  // headers → key, val, val_1; cells normalized
          .select(col("key").cast("long").as("key"), col("val"), col("val_1"))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS key,
             |CASE CAST(n_nationkey % 4 AS INTEGER) WHEN 0 THEN NULL WHEN 1 THEN 'True'
             |  WHEN 2 THEN '12' ELSE n_name END AS val,
             |n_name AS val_1 FROM nation""".stripMargin), eager = true),

    // S3/S5 — JSONL writer → schema'd JSONL load round-trip
    //   (data_helpers.py:59-75; create_modify.py:178-208)
    "s3_jsonl_roundtrip" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s3_${new java.io.File(dir).getName}"
        val src = td(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        Io.writeJsonl(src, path)
        Io.readJsonl(s, path, StructType(Seq(
          StructField("c_custkey", LongType), StructField("c_name", StringType),
          StructField("c_acctbal", DoubleType), StructField("c_mktsegment", StringType))))
      },
      Some("SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer"), eager = true),

    // S4/S6 — TSV sink with "None" null marker → typed TSV load round-trip
    //   (data_helpers.py:35-56; create_modify.py:137-175)
    "s4_tsv_null_marker_roundtrip" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s4_${new java.io.File(dir).getName}"
        val src = td(s, dir, "supplier").select(
          col("s_suppkey"),
          nullif(col("s_name"), lit("Supplier#000000003")).as("s_name_opt"),
          col("s_nationkey").cast("long").as("s_nationkey"))
        Io.writeTsv(src, path)
        Io.readTsvTyped(s, path, StructType(Seq(
          StructField("s_suppkey", LongType), StructField("s_name_opt", StringType),
          StructField("s_nationkey", LongType))))
      },
      Some("""SELECT s_suppkey, nullif(s_name, 'Supplier#000000003') AS s_name_opt,
             |CAST(s_nationkey AS BIGINT) AS s_nationkey FROM supplier""".stripMargin), eager = true),

    // S2 — sampled distributed type inference feeding a typed load: infer on
    //   an all-string TSV of part, verify the inferred column types land
    //   (INT64 keys, FLOAT64 price, STRING names)
    "s2_infer_typed_load" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s2_${new java.io.File(dir).getName}"
        val src = td(s, dir, "part").select(
          col("p_partkey").cast("string"), col("p_name"),
          col("p_size").cast("string"), col("p_retailprice").cast("string"))
        Io.writeTsv(src, path)
        val typed = SchemaInfer.inferAndLoadTsv(s, s"$path/*.csv")
        typed.select(col("p_partkey"), col("p_name"), col("p_size"),
          col("p_retailprice"))
      },
      Some("""SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
             |CAST(p_size AS BIGINT) AS p_size,
             |CAST(p_retailprice AS DOUBLE) AS p_retailprice FROM part""".stripMargin), eager = true),

    // S19 — ORC sink → source round-trip (engine extension: the second
    //   columnar format Spark ships; exercises a non-parquet binary codec
    //   end to end)
    "s19_orc_roundtrip" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s19_${new java.io.File(dir).getName}"
        val src = td(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
        Io.writeOrc(src, path)
        Io.readOrc(s, path)
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer"), eager = true),

    // S20 — XML sink → source round-trip (engine extension: Spark 4's
    //   built-in XML format; explicit schema on read-back — XML inference
    //   is not round-trip-stable for numeric types)
    "s20_xml_roundtrip" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s20_${new java.io.File(dir).getName}"
        val src = td(s, dir, "region").select(
          col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
        src.write.format("xml").option("rowTag", "region")
          .mode("overwrite").save(path)
        s.read.format("xml").option("rowTag", "region")
          // default ignoreSurroundingSpaces=true would TRIM string values
          // on read-back — not a faithful round-trip
          .option("ignoreSurroundingSpaces", "false")
          .schema(StructType(Seq(
            StructField("r_regionkey", LongType), StructField("r_name", StringType))))
          .load(path)
      },
      Some("SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region"),
      eager = true),

    // S7 — CTAS with 0-row guard (create_modify.py:108-134, 280-303)
    "s7_ctas_guard" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s7_${new java.io.File(dir).getName}"
        val agg = td(s, dir, "lineitem").groupBy("l_returnflag")
          .agg(count(lit(1)).cast("long").as("cnt"))
        Io.ctasParquet(s, agg, path)
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem GROUP BY 1""".stripMargin), eager = true),

    // S21 — Hive-style partitioned layout + partition PRUNING: write the
    //   corpus partitioned by source, read ONE partition back. At 100 TB
    //   this is the difference between scanning one directory and the
    //   whole lake — the filter must become a PartitionFilter (asserted
    //   in IoSpec), never a post-scan predicate over all files
    "s21_partitioned_pruning" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s21_${new java.io.File(dir).getName}"
        // repartition ON the partition column before a partitionBy write —
        // without it every write task opens a file in every partition
        // (tasks × partitions tiny files; 640 at sf1, the round-12 s21/s32
        // regression). One writer per partition is the 100 TB-correct
        // layout AND the fast one at every SF
        td(s, dir, "documents").repartition(col("source"))
          .write.partitionBy("source")
          .mode("overwrite").parquet(path)
        s.read.parquet(path).filter(col("source") === "src7")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("n_chars").cast("long").as("n_chars"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM documents WHERE source = 'src7' GROUP BY 1""".stripMargin),
      eager = true),

    // S32 — DYNAMIC partition overwrite (partitionOverwriteMode=dynamic,
    //   the INSERT OVERWRITE ... PARTITION warehouse primitive): a
    //   re-run of one ingest slice must replace ONLY the partitions it
    //   writes — static mode would truncate the whole table, append mode
    //   would duplicate the slice. Fixture: full partitioned write, then
    //   a corrected src7 slice (doubled n_chars) overwrites dynamically;
    //   the read-back per-partition census proves src7 was replaced (not
    //   doubled) and every other partition kept its original rows
    "s32_dynamic_partition_overwrite" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s32_${new java.io.File(dir).getName}"
        val docs = td(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        // one writer per partition (the s21 rule): tasks × partitions
        // small files made this row 3× slower at sf1 under the 8 MB split
        docs.repartition(col("source"))
          .write.partitionBy("source").mode("overwrite").parquet(path)
        val corrected = docs.filter(col("source") === "src7")
          .withColumn("n_chars", col("n_chars") * 2)
        corrected.repartition(col("source"))
          .write.partitionBy("source")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(path)
        s.read.parquet(path).groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("n_chars").cast("long").as("n_chars"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |CAST(sum(CASE WHEN source = 'src7' THEN n_chars * 2
             |         ELSE n_chars END) AS BIGINT) AS n_chars
             |FROM documents GROUP BY 1""".stripMargin),
      eager = true),

    // S22 — schema EVOLUTION across parquet batches: an early batch
    //   without a column + a later batch with it, read back as one table
    //   under mergeSchema — the lake reality that a 100 TB corpus is
    //   written over months by evolving jobs; missing columns must read
    //   as NULL, not fail or silently drop
    "s22_schema_evolution" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s22_${new java.io.File(dir).getName}"
        val docs = td(s, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("source"))
          .write.mode("overwrite").parquet(s"$path/batch=old")
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("source"), col("lang"))
          .write.mode("overwrite").parquet(s"$path/batch=new")
        s.read.option("mergeSchema", "true").parquet(path)
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("lang").isNull, 1L).otherwise(0L)).cast("long")
              .as("n_missing_lang"),
            countDistinct(col("lang")).cast("long").as("n_langs"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |CAST(sum(CASE WHEN doc_id % 2 = 0 OR lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_lang,
             |CAST(count(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END) AS BIGINT) AS n_langs
             |FROM documents GROUP BY 1""".stripMargin),
      eager = true),

    // S24 — corrupt-record QUARANTINE on JSONL ingest: a fixture where
    //   every %7 line is truncated mid-object, read back in PERMISSIVE
    //   mode with columnNameOfCorruptRecord — parseable rows load typed,
    //   broken rows land whole in the quarantine column (raw bytes
    //   preserved for replay/debugging), and the job NEVER dies mid-scan
    //   (FAILFAST on 100 TB of crawl JSONL is an outage, not a policy).
    //   The oracle rebuilds the exact line strings and the portable-hash
    //   sum of the quarantined ones
    "s24_corrupt_quarantine" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s24_${new java.io.File(dir).getName}"
        val line = concat(lit("{\"doc_id\": "), col("doc_id"),
          lit(", \"source\": \""), col("source"),
          lit("\", \"n_chars\": "), col("n_chars"), lit("}"))
        td(s, dir, "documents")
          .withColumn("_l", line)
          .select(when(col("doc_id") % 7 === 0,
              expr("substring(_l, 1, length(_l) - 1)"))
            .otherwise(col("_l")).as("value"))
          .write.mode("overwrite").text(path)
        val back = s.read
          .schema("doc_id LONG, source STRING, n_chars LONG, _corrupt_record STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path)
        back.groupBy(when(col("_corrupt_record").isNull, "good")
            .otherwise("quarantined").as("status"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            sum("n_chars").cast("long").as("n_chars_sum"),
            sum(when(col("_corrupt_record").isNotNull,
              graft.llm.TextOps.portableHash60(col("_corrupt_record")))
              .cast("decimal(38,0)")).cast("decimal(38,0)").cast("string")
              .as("line_hash_sum"))
      },
      Some("""WITH l AS (SELECT doc_id, n_chars,
             |    '{"doc_id": ' || CAST(doc_id AS VARCHAR) || ', "source": "'
             |      || source || '", "n_chars": ' || CAST(n_chars AS VARCHAR) || '}' AS line
             |  FROM documents),
             |c AS (SELECT doc_id, n_chars,
             |    CASE WHEN doc_id % 7 = 0
             |      THEN substring(line, 1, length(line) - 1) ELSE line END AS line,
             |    doc_id % 7 = 0 AS bad
             |  FROM l)
             |SELECT CASE WHEN bad THEN 'quarantined' ELSE 'good' END AS status,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(CASE WHEN NOT bad THEN sum(n_chars) END AS BIGINT) AS n_chars_sum,
             |  CASE WHEN bad THEN CAST(sum(('0x'||substr(md5(line),1,15))::BIGINT::HUGEINT) AS VARCHAR)
             |  END AS line_hash_sum
             |FROM c GROUP BY bad""".stripMargin),
      eager = true),

    // S23 — Z-order (Morton) clustering key: the Delta/Iceberg ZORDER BY
    //   layout primitive — bit-interleaved (custkey, price-dollar) so
    //   min/max footer pruning works on BOTH dimensions (ZOrderSpec
    //   measures the skipping on real parquet footers vs a linear sort).
    //   floor() before the long cast on BOTH sides: Spark's double→long
    //   cast truncates, DuckDB's ROUNDS — floor makes them agree
    "s23_zorder_key" -> Q(
      (s, dir) => {
        val pb = floor(col("o_totalprice")).cast("long")
        td(s, dir, "orders").select(col("o_orderkey"),
          pb.as("price_bucket"),
          graft.ops.ZOrder.zValue(col("o_custkey"), pb).as("zval"))
      },
      Some {
        // joined on ONE line: a "\n | " separator would be eaten by the
        // surrounding stripMargin
        val terms = (0 until 21).flatMap(i => Seq(
          s"(((o_custkey >> $i) & 1) << ${2 * i})",
          s"(((pb >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
        s"""WITH t AS (SELECT o_orderkey, o_custkey,
           |    CAST(floor(o_totalprice) AS BIGINT) AS pb FROM orders)
           |SELECT o_orderkey, pb AS price_bucket,
           |  CAST($terms AS BIGINT) AS zval
           |FROM t""".stripMargin
      }),

    // S25 — per-file Bloom-filter index audit: the EQUALITY-probe
    //   file-skipping complement to s21/s23's min/max range pruning
    //   (parquet column blooms / Delta file stats). Portable-md5 bit
    //   positions, 60-bit words (DuckDB's << throws on 1<<63), one
    //   (file, word) bit_or hash-agg; the audit table proves no false
    //   negatives and prices the false-positive rate at the chosen
    //   (k=4, m=16380). Real-file skipping is measured in BloomIndexSpec
    "s25_bloom_file_index" -> Q(
      (s, dir) => graft.ops.BloomIndex.probeAudit(
        td(s, dir, "orders"), col("o_orderkey") % 16, col("o_custkey"),
        probes = Seq(7L, 42L, 701L, -12345L)),
      Some("""WITH base AS (SELECT o_orderkey % 16 AS file_id,
             |    CAST(o_custkey AS BIGINT) AS k FROM orders),
             |pos AS (SELECT file_id, k, unnest([0, 1, 2, 3]) AS i FROM base),
             |pb AS (SELECT file_id,
             |    ('0x'||substr(md5('bf'||i||'|'||CAST(k AS VARCHAR)),1,15))::BIGINT % 16380 AS p
             |  FROM pos),
             |idx AS (SELECT file_id, CAST(p // 60 AS INTEGER) AS word,
             |    bit_or(1::BIGINT << CAST(p % 60 AS INTEGER)) AS bits
             |  FROM pb GROUP BY 1, 2),
             |pr AS (SELECT unnest([7, 42, 701, -12345]::BIGINT[]) AS probe),
             |ppos AS (SELECT probe, unnest([0, 1, 2, 3]) AS i FROM pr),
             |ph AS (SELECT probe,
             |    ('0x'||substr(md5('bf'||i||'|'||CAST(probe AS VARCHAR)),1,15))::BIGINT % 16380 AS p
             |  FROM ppos),
             |pp AS (SELECT probe, CAST(p // 60 AS INTEGER) AS word,
             |    1::BIGINT << CAST(p % 60 AS INTEGER) AS mask FROM ph),
             |cand AS (SELECT probe, file_id,
             |    (count(*) = 4 AND bool_and((bits & mask) = mask)) AS candidate
             |  FROM pp JOIN idx USING (word) GROUP BY 1, 2),
             |pres AS (SELECT DISTINCT k AS probe, file_id, true AS present
             |  FROM base WHERE k IN (7, 42, 701, -12345))
             |SELECT COALESCE(cand.probe, pres.probe) AS probe,
             |  COALESCE(cand.file_id, pres.file_id) AS file_id,
             |  COALESCE(candidate, false) AS candidate,
             |  COALESCE(present, false) AS present,
             |  (COALESCE(candidate, false) AND NOT COALESCE(present, false)) AS false_positive
             |FROM cand FULL OUTER JOIN pres
             |  ON cand.probe = pres.probe AND cand.file_id = pres.file_id""".stripMargin)),

    // S26 — fixed-width text round-trip (COBOL/mainframe layout): write
    //   customer as right-aligned numbers + left-aligned strings with
    //   all-blank NULL fields, read back through the offset/trim/cast
    //   chain (codegen'd, no UDF). The oracle is the CLOSED FORM of the
    //   source projection — any off-by-one offset, pad side, or blank
    //   handling flips rows
    "s26_fixed_width" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s26_${new java.io.File(dir).getName}"
        val spec = Seq(
          graft.io.Io.FixedWidthCol("k", 10, "long"),
          graft.io.Io.FixedWidthCol("name", 20, "string"),
          graft.io.Io.FixedWidthCol("nation", 4, "long"),
          graft.io.Io.FixedWidthCol("bal_cents", 12, "long"),
          graft.io.Io.FixedWidthCol("segment", 10, "string"))
        val src = td(s, dir, "customer").select(
          col("c_custkey").cast("long").as("k"),
          col("c_name").as("name"),
          col("c_nationkey").cast("long").as("nation"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("segment"))
        graft.io.Io.writeFixedWidth(src, path, spec)
        graft.io.Io.readFixedWidth(s, path, spec)
      },
      Some("""SELECT c_custkey AS k, c_name AS name,
             |  CAST(c_nationkey AS BIGINT) AS nation,
             |  CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
             |  CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS segment
             |FROM customer""".stripMargin),
      eager = true),

    // S27 — bucketed-table layout (Spark bucketBy; the engine-level twin
    //   of the reference's CLUSTER BY table layouts): orders + customer
    //   are written bucketed by custkey ONCE, then the repeated join they
    //   exist for runs as a sort-merge join with ZERO Exchange on either
    //   side (BucketingSpec asserts the plan; at 100 TB this converts the
    //   per-query fact-table shuffle into a one-time write cost). The
    //   registered query is the post-join segment rollup; its only
    //   exchange is the final 5-group agg
    "s27_bucketed_join" -> Q(
      (s, dir) => {
        val sf = new java.io.File(dir).getName
        val path = s"$FixtureRoot/s27_$sf"
        graft.io.Bucketing.writeBucketed(td(s, dir, "orders"),
          s"graft_s27_orders_${sf.replace('.', '_')}", "o_custkey", 8, s"$path/orders")
        graft.io.Bucketing.writeBucketed(td(s, dir, "customer"),
          s"graft_s27_customer_${sf.replace('.', '_')}", "c_custkey", 8, s"$path/customer")
        graft.io.Bucketing.bucketedJoin(s,
            s"graft_s27_orders_${sf.replace('.', '_')}", "o_custkey",
            s"graft_s27_customer_${sf.replace('.', '_')}", "c_custkey")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      },
      Some("""SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin),
      eager = true),

    // small-file compaction planner (io/Compaction.planBins): order-
    // preserving contiguous bin packing — bin = preceding-cumsum div
    // target — over a micro-partition metadata snapshot (here: lineitem
    // ship-month cells at 64 B/row estimate; in production: the real file
    // listing, see CompactionSpec's physical rewrite). Cumsum-cut, not
    // greedy first-fit: replayable by any window SUM and preserves the
    // layout's clustering order. Metadata-bounded global window
    "s28_compaction_plan" -> Q(
      (s, dir) => graft.io.Compaction.planBins(
        td(s, dir, "lineitem").groupBy(
            year(col("l_shipdate")).cast("long").as("yr"),
            month(col("l_shipdate")).cast("long").as("mo"),
            col("l_returnflag"), col("l_linestatus"))
          .agg((count(lit(1)) * 64).cast("long").as("est_bytes")),
        Seq("yr", "mo", "l_returnflag", "l_linestatus"),
        "est_bytes", targetBytes = 262144L),
      Some("""WITH mp AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
             |    CAST(month(l_shipdate) AS BIGINT) AS mo,
             |    l_returnflag, l_linestatus,
             |    CAST(count(*) * 64 AS BIGINT) AS est_bytes
             |  FROM lineitem GROUP BY 1, 2, 3, 4)
             |SELECT yr, mo, l_returnflag, l_linestatus, est_bytes,
             |  CAST(COALESCE(sum(est_bytes) OVER (
             |      ORDER BY yr, mo, l_returnflag, l_linestatus
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    // 262144 AS BIGINT) AS bin_id
             |FROM mp""".stripMargin)),

    // incremental watermark scan (io/Io.readSince): an append-only dir is
    // read only for files NEWER than the checkpointed watermark — the
    // file-level twin of l56's row-level incremental dedup. Fixture:
    // even orders land as batch 1 (mtime T0), odd orders appended as
    // batch 2 (T0+5s); scanning since T0 must surface exactly batch 2,
    // which the oracle states directly over orders
    "s29_incremental_scan" -> Q(
      (s, dir) => {
        import org.apache.hadoop.fs.Path
        val sf = new java.io.File(dir).getName
        val path = s"$FixtureRoot/s29_$sf"
        val orders = td(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"))
        val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
        def names: Set[String] =
          if (!fs.exists(new Path(path))) Set.empty
          else fs.listStatus(new Path(path))
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .map(_.getPath.getName).toSet
        val t0 = 1700000000000L
        orders.filter(col("o_orderkey") % 2 === 0)
          .write.mode("overwrite").parquet(path)
        val batch1 = names
        batch1.foreach(n => fs.setTimes(new Path(s"$path/$n"), t0, -1))
        orders.filter(col("o_orderkey") % 2 === 1)
          .write.mode("append").parquet(path)
        (names -- batch1).foreach(n =>
          fs.setTimes(new Path(s"$path/$n"), t0 + 5000L, -1))
        // checkpoint = (watermark, names consumed AT it): batch 1 sits
        // exactly at t0 and is excluded by name — the boundary-safe
        // cursor shape (a same-millisecond lander is never lost)
        graft.io.Io.readSince(s, path, t0, batch1)._1
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderkey % 2 = 1""".stripMargin),
      eager = true),

    // S30 — RFC-4180 quoted-CSV round-trip: the s1 TSV reader's hostile
    //   cousin — values carrying the delimiter, DOUBLED double quotes,
    //   and EMBEDDED NEWLINES must survive write → read byte-identical.
    //   Writer escapes quotes RFC-style (escape = quote, not backslash);
    //   reader runs multiLine (records span lines, so files can't split —
    //   the documented cost of newline-bearing CSV at scale: prefer
    //   parquet, this exists for interchange) with an explicit schema.
    //   NULLs stay distinguishable from the quoted empty string
    "s30_csv_quoted_roundtrip" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s30_${new java.io.File(dir).getName}"
        val src = td(s, dir, "customer").select(
          col("c_custkey"),
          concat(lit("a,\"b\"\n "), col("c_name"), lit(", x")).as("tricky"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("seg"))
        src.write.mode("overwrite")
          .option("header", "true")
          .option("escape", "\"") // RFC 4180: "" inside quoted fields
          .csv(path)
        s.read
          .option("header", "true")
          .option("escape", "\"")
          .option("multiLine", "true")
          .schema(StructType(Seq(
            StructField("c_custkey", LongType),
            StructField("tricky", StringType),
            StructField("seg", StringType))))
          .csv(path)
      },
      Some("""SELECT c_custkey,
             |  'a,"b"' || chr(10) || ' ' || c_name || ', x' AS tricky,
             |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
             |FROM customer""".stripMargin),
      eager = true),

    // S31 — DYNAMIC partition pruning: s21 prunes on a literal predicate
    //   at plan time; here the pruning values are only known at RUNTIME —
    //   they come from the dim side of a join (month dimension filtered
    //   to one quarter). Spark plants a dynamicpruning subquery into the
    //   fact scan's PartitionFilters (asserted in IoSpec), so only 3 of
    //   12 month partitions are read — on a date-partitioned 100 TB fact
    //   table this is THE lever that makes dim-filtered joins feasible
    "s31_dynamic_partition_pruning" -> Q(
      (s, dir) => {
        val path = s"$FixtureRoot/s31_${new java.io.File(dir).getName}"
        // one writer per partition (the s21/s32 rule): without the
        // repartition every write task opens a file in all 12 month
        // partitions — tasks × partitions tiny files, and the widened
        // 32-task input made that 384 files per fixture write
        td(s, dir, "lineitem")
          .withColumn("ship_month", month(col("l_shipdate")))
          .repartition(col("ship_month"))
          .write.partitionBy("ship_month").mode("overwrite").parquet(path)
        val fact = s.read.parquet(path)
        val dim = td(s, dir, "lineitem")
          .select(month(col("l_shipdate")).as("m")).distinct()
          .withColumn("quarter", expr("(m - 1) div 3 + 1"))
        fact.join(broadcast(dim.filter(col("quarter") === 2)),
            col("ship_month") === col("m"))
          .groupBy(col("ship_month"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))
          .select(col("ship_month").cast("long").as("ship_month"),
            col("n"), col("rev_cents"))
      },
      Some("""SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
             |FROM lineitem
             |WHERE (month(l_shipdate) - 1) // 3 + 1 = 2
             |GROUP BY 1""".stripMargin),
      eager = true),

    // S33 — semi-structured VARIANT ingestion (Spark 4's open-ended JSON
    //   type, the lakehouse answer to BigQuery's JSON columns the
    //   reference stores API payloads in): parse a JSON document into a
    //   VARIANT once, then typed-path extraction — variant_get with a
    //   target type, a present-but-NULL field (is_variant_null, distinct
    //   from absent), and an OPTIONAL field read with try_variant_get
    //   (absent → NULL, never an error). The oracle builds the identical
    //   JSON text and replays every path through DuckDB's JSON extraction,
    //   so a wrong path walk, type coercion, or null-vs-absent conflation
    //   on either side flips rows. Scale shape: expression-only scan map —
    //   parse once per row, extract many (the VARIANT contract)
    "s33_variant_json" -> Q(
      (s, dir) => {
        val js = concat(
          lit("""{"id": """), col("doc_id"),
          lit(""", "meta": {"lang": """"), col("lang"),
          lit("""", "source": """"), col("source"),
          lit(""""}, "metrics": ["""), col("n_chars"),
          lit(", "), pmod(col("doc_id"), lit(7)),
          lit("]"),
          when(col("doc_id") % 5 === 0, lit(""", "flag": null""")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            concat(lit(""", "extra": {"score": """), col("n_chars") * 2, lit("}")))
            .otherwise(lit("")),
          lit("}"))
        td(s, dir, "documents")
          .select(col("doc_id"), parse_json(js).as("v"))
          .select(col("doc_id"),
            expr("variant_get(v, '$.meta.lang', 'string')").as("lang_v"),
            expr("variant_get(v, '$.metrics[1]', 'bigint')").as("metric1"),
            // present-and-null vs absent: flag exists (as JSON null) only
            // on the %5 lane — is_variant_null is false/NULL elsewhere
            expr("coalesce(is_variant_null(try_variant_get(v, '$.flag')), false)")
              .as("flag_is_null"),
            expr("try_variant_get(v, '$.extra.score', 'bigint')").as("extra_score"))
      },
      Some("""WITH j AS (SELECT doc_id,
             |    '{"id": ' || doc_id || ', "meta": {"lang": "' || lang ||
             |    '", "source": "' || source || '"}, "metrics": [' || n_chars ||
             |    ', ' || (doc_id % 7) || ']' ||
             |    CASE WHEN doc_id % 5 = 0 THEN ', "flag": null' ELSE '' END ||
             |    CASE WHEN doc_id % 3 = 0
             |      THEN ', "extra": {"score": ' || (n_chars * 2) || '}'
             |      ELSE '' END || '}' AS js
             |  FROM documents)
             |SELECT doc_id,
             |  json_extract_string(js, '$.meta.lang') AS lang_v,
             |  CAST(json_extract(js, '$.metrics[1]') AS BIGINT) AS metric1,
             |  coalesce(json_type(js, '$.flag') = 'NULL', false) AS flag_is_null,
             |  CAST(json_extract(js, '$.extra.score') AS BIGINT) AS extra_score
             |FROM j""".stripMargin))
  )
}
