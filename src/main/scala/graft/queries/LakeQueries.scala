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
      eager = true)
  )
}
