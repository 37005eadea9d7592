package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.llm.Ann

/**
 * Scale-path evidence for semantic dedup (l38): with the cell count k
 * FIXED, ×10 data grows in-cell pair work ×100 — quadratic by
 * construction, which is what the registered oracle form (k=16, exact
 * DuckDB replay) necessarily measures. The SCALE form holds expected
 * cell SIZE constant by growing k ∝ N (SemDeDup runs k in the tens of
 * thousands at web scale for exactly this reason). This probe times
 * `Ann.semanticDedup` at a given (sfDir, k) so PERF.md can show the
 * fixed-size-cell path is ~linear where the fixed-k path is ~17×.
 *
 * Usage: runMain graft.tools.CellScaleProbe <sfDir> <k> [reps]
 */
object CellScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val centroids = Ann.firstKCentroids(e, "embedding", "vec_id", k)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Ann.semanticDedup(e, "embedding", "vec_id", centroids, threshold = 0.35)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val n = e.count()
    println(f"""{"sf_dir":"$sfDir","n_vectors":$n,"k":$k,"avg_cell":${n / k},"sec_median":${times.sorted.apply(reps / 2)}%.3f,"reps":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
