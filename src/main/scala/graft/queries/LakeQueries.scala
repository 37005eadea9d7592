package graft.queries

import org.apache.spark.sql.functions._
import Registry.td

/**
 * Lake-maintenance registry rows (round 13; the s-family's IoQueries is
 * at its file-size bar, so the family continues here — Registry.all
 * concatenates this right after IoQueries).
 */
object LakeQueries {

  private val FixtureRoot = "/root/repo/target/io_fixtures"

  val all: Seq[(String, Q)] = Seq(

    // s34 — file-level INCREMENTAL ingestion (io/Incremental): batch 1
    // lands, its files go in the processed ledger, batch 2 appends; the
    // delta read returns batch-2 rows ONLY (verified by a per-source
    // census equal to the complement census from the raw table), and is
    // idempotent: a second delta read against the updated ledger is
    // empty. Listing is a driver metadata op; ledger membership is a
    // distributed anti-join; only the delta's paths collect
    "s34_incremental_ingest" -> Q(
      (s, dir) => {
        import s.implicits._
        val path = s"$FixtureRoot/s34_${new java.io.File(dir).getName}"
        val docs = td(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        docs.filter(col("doc_id") % 3 === 0)
          .write.mode("overwrite").parquet(path)
        val ledger = graft.io.Incremental.dataFiles(s, path).toDF("path")
        docs.filter(col("doc_id") % 3 =!= 0)
          .write.mode("append").parquet(path)
        val (delta, newPaths) = graft.io.Incremental.readNewFiles(s, path, ledger)
        // idempotence: with the ledger caught up, the next delta is empty
        val caughtUp = ledger.union(newPaths.toDF("path"))
        val (again, againPaths) = graft.io.Incremental.readNewFiles(s, path, caughtUp)
        require(againPaths.isEmpty && again.count() == 0L,
          s"incremental re-read must be empty, got ${againPaths.size} files")
        delta.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_new"),
            sum("n_chars").cast("long").as("n_chars_new"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_new,
             |CAST(sum(n_chars) AS BIGINT) AS n_chars_new
             |FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1""".stripMargin),
      eager = true),

    // s35 — foreign SQL-dump import (io/SqlDump; reference: the
    // TP53/P53_Database .sql and Targetome/init-targetome.sql loads):
    // the nation table is exported as a CREATE TABLE + multi-row INSERT
    // dump (quotes escaped '', comments and a constraint clause included
    // to exercise the parser), read back through readSqlDump, and must
    // round-trip exactly — the oracle is the ORIGINAL table. Statement
    // scan is driver-side under a size guard (a dump is a fixture, not
    // lake data); rows distribute
    "s35_sql_dump_import" -> Q(
      (s, dir) => {
        import graft.io.SqlDump
        val path = s"$FixtureRoot/s35_${new java.io.File(dir).getName}.sql"
        val rows = td(s, dir, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"),
            col("n_regionkey").cast("long"))
          .collect().sortBy(_.getLong(0))
        val inserts = rows.grouped(8).map { g =>
          "INSERT INTO nation_dump (n_nationkey, n_name, n_regionkey) VALUES\n" +
            g.map(r => s"  (${SqlDump.sqlLiteral(r.get(0))}, " +
              s"${SqlDump.sqlLiteral(r.get(1))}, ${SqlDump.sqlLiteral(r.get(2))})")
              .mkString(",\n") + ";"
        }.mkString("\n")
        val dump =
          s"""-- synthetic export of the nation table (s35 fixture)
             |CREATE TABLE nation_dump (
             |  n_nationkey BIGINT,
             |  n_name VARCHAR(25), -- trailing clause exercises the filter
             |  n_regionkey BIGINT,
             |  PRIMARY KEY (n_nationkey)
             |);
             |$inserts
             |""".stripMargin
        new java.io.File(FixtureRoot).mkdirs()
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          dump.getBytes("UTF-8"))
        SqlDump.readSqlDump(s, path, "nation_dump")
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             |CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""".stripMargin),
      eager = true)
  )
}
