package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for crawl curation. A web-scale corpus is curated
 * partly by GRAPH signals — CommonCrawl publishes host/domain-level
 * centrality ranks, and crawl frontiers prioritize by them (Page et al.
 * 1999; the harmonic-centrality ranking of Web Data Commons is the same
 * shape). This is the domain-quality complement to the content-side
 * signals (l4/l46): a domain nobody links to is a spam prior no text
 * classifier sees.
 *
 * INTEGER PageRank: ranks in micro-units (1 000 000 = 1.0), damping as a
 * rational dampNum/dampDen, per-edge share = floor(rank/outdeg), fixed
 * iteration count. Every operation is BIGINT floor arithmetic, so the
 * ranks are bit-identical on any engine — a DuckDB oracle replays all
 * iterations exactly (the w10 integer-z-test strategy applied to an
 * iterative algorithm). Floating-point PageRank cannot be oracle-checked
 * this way: summation order changes the bits.
 *
 * Dangling nodes (no out-edges) leak their damped mass instead of
 * redistributing it — the common simplification (Google's original
 * formulation); ranks then UNDER-estimate by the leaked share, uniformly
 * enough for ranking use. Total mass is conserved only under
 * column-stochastic variants, which need a global mass re-broadcast per
 * iteration; documented trade for determinism + one-shuffle iterations.
 *
 * Scale shape: each iteration is ONE equi-join of the edge list with the
 * skinny (node, rank) table on the source key plus ONE hash-agg on the
 * destination — the standard distributed PageRank step. Edges partition
 * by src; rank rows are |V|-sized, orders of magnitude smaller than
 * edges. At 100 TB the edge list is bucketed by src so the per-iteration
 * join co-locates without reshuffling edges (the dominant cost); the
 * fixed iteration count bounds the DAG (deep lazy plans localCheckpoint
 * between rounds in the l13 style if iters grows past ~10).
 */
object Graph {

  /**
   * PageRank over an edge list, `iters` fixed iterations.
   *
   * Output: (node, rank_micro BIGINT) for every node appearing as a src
   * or dst; initial rank 1.0 (1 000 000 micro).
   */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 5, dampNum: Long = 85L,
                  dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      "need iters >= 1 and damping in [0,1]")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("long").as("od"))
    val baseMicro = ((dampDen - dampNum) * 1000000L) / dampDen

    var rank = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(outDeg, "src")
        .join(rank.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        // integral div BEFORE the sum: each edge carries its floor share,
        // so partial aggregation order cannot change the result
        .agg(sum(expr("rank_micro div od")).cast("long").as("inflow"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(baseMicro) +
            expr(s"($dampNum * coalesce(inflow, 0L)) div $dampDen"))
            .cast("long").as("rank_micro"))
    }
    rank
  }
}
