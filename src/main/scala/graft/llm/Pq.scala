package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization (Jégou et al. 2011, "Product Quantization for
 * Nearest Neighbor Search", public): split a D-dim vector into `m`
 * subvectors, learn a k-centroid codebook per subspace, and store each
 * vector as m small codes — 64 floats (256 B) become 8 bytes at
 * m=8, k=16. This is the storage form billion-vector ANN actually ships:
 * IVF partitions the corpus ([[Ann.ivfTopK]]), PQ compresses what lives
 * inside each cell.
 *
 * Codebook determinism: [[seedCodebooks]] slices the first-k-by-id
 * vectors — a pure function of the DATA, so a DuckDB oracle can rebuild
 * the identical codebook from the same parquet and replay encoding
 * end-to-end with zero interpolated constants. [[trainCodebooks]] then
 * runs Lloyd refinement per subspace for real use (spec-verified to cut
 * distortion); its result depends on float summation and is checked by
 * property, not hash.
 *
 * Scale shape: encoding is expression-only (the m·k·(D/m) codebook rides
 * the plan as literals — 1 024 doubles at the registry's 8×16×8, far
 * under the [[Ann.ivfLiteralFoldMaxK]]-scale ceiling; past that, ship
 * the codebook as a broadcast (sub, cell, cent) table exactly like
 * [[Ann]]'s centroid table). Training shuffles ONE skinny
 * (sub, cell, dim, sum) frame per iteration for all subspaces at once —
 * only m·k·(D/m) rows reach the driver.
 */
object Pq {

  /** m per-subspace codebooks (each k centroids of D/m dims) sliced from
    * the first `k` vectors by id order. */
  def seedCodebooks(df: DataFrame, vecCol: String, idCol: String,
                    m: Int, k: Int): Seq[Seq[Array[Float]]] = {
    val seeds = Ann.firstKCentroids(df, vecCol, idCol, k)
    require(seeds.nonEmpty && seeds.head.length % m == 0,
      s"dim ${seeds.headOption.fold(0)(_.length)} must divide by m=$m")
    val d = seeds.head.length / m
    (0 until m).map(j => seeds.map(v => v.slice(j * d, j * d + d)))
  }

  /** Squared-L2 distance between two pre-cast double arrays, left-fold
    * order (the same order the oracle's list_sum uses). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** (cell, cent) literal array for one subspace. */
  private def subCodebookLit(cb: Seq[Array[Float]]): Column =
    array(cb.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"),
        array(c.map(v => lit(v.toDouble)): _*).as("cent"))
    }: _*)

  /**
   * Encode every vector: per subspace, the nearest codebook cell by
   * (squared L2 @ 6 dp, cell) — the engine-stable rank key. Output:
   * (id, codes = "c0,c1,…" string, recon_err = Σ per-subspace min
   * distance, summed exactly in DECIMAL then cast to double).
   */
  def encode(df: DataFrame, vecCol: String, idCol: String,
             codebooks: Seq[Seq[Array[Float]]]): DataFrame = {
    val m = codebooks.size
    val d = codebooks.head.head.length
    val dv = df.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("_dv"))
    val best: Seq[Column] = (0 until m).map { j =>
      val sv = slice(col("_dv"), j * d + 1, d)
      array_min(transform(subCodebookLit(codebooks(j)), s =>
        struct(round(sqDist(sv, s.getField("cent")), 6).as("d"),
          s.getField("cell").as("cell"))))
    }
    val staged = dv.select(col("id") +: best.zipWithIndex.map {
      case (b, j) => b.as(s"_b$j") }: _*)
    val codes = concat_ws(",",
      (0 until m).map(j => col(s"_b$j").getField("cell").cast("string")): _*)
    val recon = (0 until m)
      .map(j => col(s"_b$j").getField("d")
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .reduce(_ + _)
    staged.select(col("id"), codes.as("codes"),
      recon.cast("double").as("recon_err"))
  }

  /**
   * Lloyd refinement of [[seedCodebooks]], all m subspaces trained in the
   * SAME distributed loop: explode each vector into (sub, subvec) rows
   * once per iteration, assign via the nested codebook literal, and
   * recompute means with one skinny (sub, cell, dim) aggregation.
   */
  def trainCodebooks(df: DataFrame, vecCol: String, idCol: String,
                     m: Int, k: Int, iters: Int): Seq[Seq[Array[Float]]] = {
    var cbs = seedCodebooks(df, vecCol, idCol, m, k)
    val d = cbs.head.head.length
    val dv = df.select(transform(col(vecCol), _.cast("double")).as("_dv"))
    var it = 0
    while (it < iters) {
      val cbAll = array(cbs.map(subCodebookLit): _*)
      val rows = dv
        .select(explode(transform(sequence(lit(0), lit(m - 1)), j =>
          struct(j.as("sub"), slice(col("_dv"), j * d + 1, lit(d)).as("sv")))).as("r"))
        .select(col("r.sub").as("sub"), col("r.sv").as("sv"))
      val assigned = rows.select(col("sub"), col("sv"),
        array_min(transform(element_at(cbAll, col("sub") + 1), s =>
          struct(round(sqDist(col("sv"), s.getField("cent")), 6).as("d"),
            s.getField("cell").as("cell")))).getField("cell").as("cell"))
      val sums = assigned
        .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("sub", "cell", "dim")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cbs.map(_.map(_.clone()))
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          (r.getDouble(3) / r.getLong(4)).toFloat
      }
      cbs = next
      it += 1
    }
    cbs
  }

  /**
   * ADC (asymmetric distance computation) top-k: score every ENCODED
   * vector against an uncompressed query using per-subspace lookup
   * tables — the query side of PQ retrieval, where distance to a corpus
   * vector is Σ_j table_j[code_j] and the corpus is never decompressed.
   * The m·k table entries are computed driver-side with the same
   * left-fold arithmetic and 6-dp rounding as [[encode]]'s distances and
   * ride the plan as DECIMAL literals; the score sums them exactly, so
   * an external engine replays the ranking bit-for-bit. Plan: cell
   * choice + table lookup are expression-only, then TakeOrderedAndProject
   * — no shuffle, no decompression, O(m·k) plan growth.
   *
   * Output: (id, adc_score) ascending, ties by id, first `k` rows.
   */
  def adcTopK(df: DataFrame, vecCol: String, idCol: String,
              codebooks: Seq[Seq[Array[Float]]], query: Array[Float],
              k: Int): DataFrame = {
    val dv = df.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("_dv"))
    adcScore(dv, Nil, codebooks, query)
      .orderBy(col("adc_score"), col("id"))
      .limit(k)
  }

  /** Shared ADC core: `dv` must carry ("id", "_dv") plus any `carry`
    * columns, which pass through to the output next to (id, adc_score). */
  private def adcScore(dv: DataFrame, carry: Seq[String],
                       codebooks: Seq[Seq[Array[Float]]],
                       query: Array[Float]): DataFrame = {
    val m = codebooks.size
    val d = codebooks.head.head.length
    require(query.length == m * d, s"query dim ${query.length} != ${m * d}")
    val qTables: Seq[Seq[java.math.BigDecimal]] = (0 until m).map { j =>
      val q = query.slice(j * d, j * d + d).map(_.toDouble)
      codebooks(j).map { cent =>
        var acc = 0.0
        var i = 0
        while (i < d) {
          val t = q(i) - cent(i).toDouble; acc += t * t; i += 1
        }
        // valueOf (shortest-decimal), NOT new BigDecimal(acc) (exact binary
        // expansion): Spark's Round and DuckDB's round both round the
        // shortest decimal rendering, and the two constructors disagree
        // exactly at .xxxxxx5 boundaries
        java.math.BigDecimal.valueOf(acc).setScale(6, java.math.RoundingMode.HALF_UP)
      }
    }
    val cells: Seq[Column] = (0 until m).map { j =>
      val sv = slice(col("_dv"), j * d + 1, d)
      array_min(transform(subCodebookLit(codebooks(j)), s =>
        struct(round(sqDist(sv, s.getField("cent")), 6).as("d"),
          s.getField("cell").as("cell")))).getField("cell")
    }
    val staged = dv.select((col("id") +: carry.map(col)) ++
      cells.zipWithIndex.map { case (c, j) => c.as(s"_c$j") }: _*)
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val score = (0 until m).map { j =>
      element_at(array(qTables(j).map(v => lit(v).cast(dec)): _*), col(s"_c$j") + 1)
    }.reduce(_ + _)
    staged.select(col("id") +: carry.map(col) :+
      score.cast("double").as("adc_score"): _*)
  }

  /**
   * Composed IVF-PQ retrieval — the query path of FAISS's `IndexIVFPQ`
   * with `by_residual=false` (Jégou et al. 2011 §IV.A call the residual
   * form IVFADC; the non-residual variant keeps one global codebook and
   * is what this deterministic, oracle-replayable registry form uses):
   *
   *  1. coarse-quantize every corpus vector to its nearest of
   *     `centroids.size` cells with the SAME deterministic cosine argmin
   *     as [[Ann.ivfTopK]] (shared `scoredCells` fold — bit-identical
   *     tie-break),
   *  2. rank cells against the query DRIVER-side with the identical
   *     left-fold arithmetic and keep the `nProbe` best (the probe list
   *     is a handful of ints — no job, no broadcast),
   *  3. ADC-score only members of probed cells via the per-subspace
   *     lookup tables and keep the global top `k`.
   *
   * Scale shape: cell choice + ADC are expression-only on a corpus scan
   * filtered to nProbe/nCells of the data, then TakeOrderedAndProject —
   * zero shuffles end to end. At real scale cells and codes are
   * precomputed once ([[encode]]) and the filter prunes on a stored cell
   * column (partition pruning); here both derive in-plan so the oracle
   * can replay the whole pipeline from the parquet alone.
   *
   * Output: (id, cell, adc_score) ascending by (adc_score, id), `k` rows.
   */
  def ivfAdcTopK(df: DataFrame, vecCol: String, idCol: String,
                 centroids: Seq[Array[Float]],
                 codebooks: Seq[Seq[Array[Float]]],
                 query: Array[Float], nProbe: Int, k: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size,
      s"nProbe=$nProbe out of range for ${centroids.size} cells")
    // driver-side probe ranking: identical ops in identical order to the
    // in-plan scorer (left-fold dot, sqrt-of-fold norms, zero-norm guard,
    // (neg, cell) lexicographic tie-break)
    val dq = query.map(_.toDouble)
    val na = {
      var acc = 0.0; var i = 0
      while (i < dq.length) { acc += dq(i) * dq(i); i += 1 }
      math.sqrt(acc)
    }
    val probed: Seq[Int] = centroids.zipWithIndex.map { case (c, cell) =>
      val dc = c.map(_.toDouble)
      var dot = 0.0; var sq = 0.0; var i = 0
      while (i < dc.length) { dot += dq(i) * dc(i); sq += dc(i) * dc(i); i += 1 }
      val nb = math.sqrt(sq)
      val neg = if (na == 0 || nb == 0) 0.0 else 0.0 - dot / (na * nb)
      (neg, cell)
    }.sorted.take(nProbe).map(_._2)
    val scorer = Ann.scoredCells(Ann.centroidLit(centroids)) _
    val dv = df.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("_dv"))
      .withColumn("cell",
        array_min(scorer(col("_dv"), Ann.norm(col("_dv"))))
          .getField("cell").cast("long"))
      .filter(col("cell").isin(probed.map(_.toLong): _*))
    adcScore(dv, Seq("cell"), codebooks, query)
      .orderBy(col("adc_score"), col("id"))
      .limit(k)
  }

  /** Mean reconstruction error of an encoding — the distortion the
    * trainer minimizes; spec-checked to drop after Lloyd refinement. */
  def meanDistortion(df: DataFrame, vecCol: String, idCol: String,
                     codebooks: Seq[Seq[Array[Float]]]): Double =
    encode(df, vecCol, idCol, codebooks)
      .agg(avg(col("recon_err"))).collect()(0).getDouble(0)
}
