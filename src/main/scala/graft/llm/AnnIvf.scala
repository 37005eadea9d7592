package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The IVF / k-means family of [[Ann]] (round-12 file split, pure move,
 * no behavior change): centroid literals and broadcast centroid tables,
 * cell assignment/probing on both paths, ivfTopK, the Lloyd trainer, and
 * the assignment-cost objective. Mixed into `object Ann`, so every call
 * site keeps addressing `Ann.<member>`.
 */
private[llm] trait AnnIvf { this: Ann.type =>

  /**
   * IVF (inverted-file) ANN: corpus vectors are assigned to their nearest
   * centroid cell; queries probe only the `nProbe` nearest cells. Centroids
   * are provided by the caller (e.g. first-k deterministic sample or an
   * offline k-means) — no training pass inside the operator. Join is equi
   * on cell id: shuffle-bounded, no crossJoin.
   */
  /** ONE literal array<struct<cell,c,nb>> shared by every row — not one
    * cloned cosine tree per centroid. The old per-centroid-clone shape
    * (each re-casting the vector ~5×) was a huge expression tree with
    * redundant per-row array materializations — the source of l12's
    * unpinned run-to-run variance. Centroid norms are precomputed in Scala
    * with the same left-fold order as the [[norm]] expression, so scores
    * are bit-identical to the clone formulation. */
  private[llm] def centroidLit(centroids: Seq[Array[Float]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      val ds = c.map(_.toDouble)
      struct(lit(i).as("cell"), array(ds.map(lit(_)): _*).as("c"),
        lit(math.sqrt(ds.map(v => v * v).sum)).as("nb"))
    }: _*)

  /** Per-centroid (negSim, cellId) structs from a pre-cast vector and its
    * pre-computed norm; array_min = nearest cell, sort+slice = nProbe. */
  private[llm] def scoredCells(centLit: Column)(dvec: Column, na: Column): Column =
    transform(centLit, s => {
      val d = dot(dvec, s.getField("c")); val nb = s.getField("nb")
      struct((lit(0.0) - when(na === 0 || nb === 0, lit(0.0))
        .otherwise(d / (na * nb))).as("neg"), s.getField("cell").as("cell"))
    })

  /** Above this k the IVF family switches from the shared centroid-literal
    * fold (fastest at small k; but plan size grows with k·dim literal nodes,
    * a hard analysis/codegen ceiling at real IVF cell counts of 10⁴–10⁵) to
    * a broadcast centroid TABLE — plan stays O(1) in k, centroid data ships
    * once per executor as a broadcast relation instead of inside the plan. */
  val ivfLiteralFoldMaxK = 256

  /** Centroid set as a (cell, c: array<double>, nb) DataFrame. Norms use the
    * same formula as [[centroidLit]], so both paths score bit-identically. */
  private[llm] def centroidTable(spark: org.apache.spark.sql.SparkSession,
                            centroids: Seq[Array[Float]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) =>
      val ds = c.map(_.toDouble).toSeq
      (i, ds, math.sqrt(ds.map(v => v * v).sum))
    }.toDF("cell", "c", "nb")
  }

  /** One row per (input row, centroid): the broadcast-join centroid scorer.
    * The join key is a NON-FOLDABLE constant (`xxhash64(id) % 1`): both
    * sides carry the same single value, so Catalyst plans a
    * BroadcastHashJoin (never a BroadcastNestedLoopJoin — a foldable `true`
    * condition would degenerate to a cross join and trip the plan audit).
    * `neg` mirrors [[scoredCells]] exactly: −cosine with the zero-norm
    * guard, so argmin tie-break order matches the fold path bit for bit. */
  private def joinedCellScores(withDvec: DataFrame, id: String,
                               cents: DataFrame): DataFrame = {
    val probe = withDvec.withColumn("_k", pmod(xxhash64(col(id)), lit(1)))
    val ct = broadcast(cents.withColumn("_k", pmod(xxhash64(col("cell")), lit(1))))
    probe.join(ct, "_k")
      .select(col(id), col("vec"), col("cell"),
        (lit(0.0) - when(col("_na") === 0 || col("nb") === 0, lit(0.0))
          .otherwise(dot(col("_dv"), col("c")) / (col("_na") * col("nb")))).as("neg"))
  }

  /** Nearest-cell assignment via the broadcast path: deterministic argmin =
    * min over (neg, cell) structs — identical tie-break to the fold path's
    * `array_min`. Partial aggregation collapses each row's k candidates
    * map-side (they are co-located by construction), so the exchange moves
    * one row per input row. */
  private[llm] def assignCellsBroadcast(withDvec: DataFrame, id: String,
                                   cents: DataFrame): DataFrame =
    joinedCellScores(withDvec, id, cents)
      .groupBy(col(id))
      .agg(min(struct(col("neg"), col("cell"))).as("_best"),
        first(col("vec")).as("vec"))
      .select(col(id), col("vec"), col("_best.cell").as("cell"))

  /** Top-`nProbe` cells per query row via the broadcast path: window rank
    * over (neg, cell) — the same order `array_sort` gives the fold path. */
  private def probeCellsBroadcast(withDvec: DataFrame, id: String,
                                  cents: DataFrame, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(id)).orderBy(col("neg"), col("cell"))
    joinedCellScores(withDvec, id, cents)
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= nProbe)
      .select(col(id), col("vec"), col("cell"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, centroids: Seq[Array[Float]], k: Int,
              nProbe: Int = 2): DataFrame =
    ivfTopKPath(corpus, queries, vecCol, idCol, centroids, k, nProbe,
      broadcastCentroids = centroids.size > ivfLiteralFoldMaxK)

  /** Path-forced variant ([[ivfTopK]] picks by k): `broadcastCentroids`
    * selects the O(1)-plan broadcast-table scorer over the literal fold.
    * Package-private so specs can parity-test both paths at the same k. */
  private[graft] def ivfTopKPath(corpus: DataFrame, queries: DataFrame,
                                 vecCol: String, idCol: String,
                                 centroids: Seq[Array[Float]], k: Int,
                                 nProbe: Int,
                                 broadcastCentroids: Boolean): DataFrame = {
    def withDvec(df: DataFrame, id: String): DataFrame = df
      .select(col(idCol).as(id), col(vecCol).as("vec"),
        transform(col(vecCol), _.cast("double")).as("_dv"))
      .select(col(id), col("vec"), col("_dv"), norm(col("_dv")).as("_na"))
    val (cb, qb) =
      if (broadcastCentroids) {
        val ct = centroidTable(corpus.sparkSession, centroids)
        (assignCellsBroadcast(withDvec(corpus, "corpus_id"), "corpus_id", ct)
           .select(col("corpus_id"), col("vec").as("cvec"), col("cell")),
         probeCellsBroadcast(withDvec(queries, "query_id"), "query_id", ct, nProbe)
           .select(col("query_id"), col("vec").as("qvec"), col("cell")))
      } else {
        val scoredCells = this.scoredCells(centroidLit(centroids)) _
        (withDvec(corpus, "corpus_id")
           .select(col("corpus_id"), col("vec").as("cvec"),
             array_min(scoredCells(col("_dv"), col("_na"))).getField("cell").as("cell")),
         withDvec(queries, "query_id")
           .select(col("query_id"), col("vec").as("qvec"),
             explode(transform(slice(array_sort(scoredCells(col("_dv"), col("_na"))), 1, nProbe),
               _.getField("cell"))).as("cell")))
      }
    // per-ROW norms before the cell join (native dot widens floats exactly
    // like the former per-pair casts — bit-identical sims)
    val scored = qb.withColumn("_nq", norm(col("qvec")))
      .join(cb.withColumn("_nc", norm(col("cvec"))), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosinePrepped(col("qvec"), col("cvec"), col("_nq"), col("_nc")).as("cosine_sim"))
      .distinct()
    import org.apache.spark.sql.expressions.Window
    // rounded rank key — engine-stable boundary (see bruteForceTopK)
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("cosine_sim"), 6).desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k).drop("rank")
  }

  /** Deterministic centroid pick: the first k corpus vectors by id — the
    * zero-training-pass seed for [[kmeansCentroids]] or a quick IVF run. */
  def firstKCentroids(df: DataFrame, vecCol: String, idCol: String, k: Int): Seq[Array[Float]] =
    df.orderBy(col(idCol)).limit(k).select(vecCol)
      .collect().map(_.getSeq[Float](0).toArray).toSeq

  /**
   * Distributed Lloyd iterations: the offline k-means trainer for
   * [[ivfTopK]]'s centroids. Per iteration: assign each vector its nearest
   * cell with the same shared centroid-literal fold the IVF query uses (no
   * shuffle), then recompute means via ONE skinny shuffle of (cell, dim,
   * component) rows — posexplode sidesteps the k·dim-wide aggregation
   * buffers that fall out of codegen (PERF.md rule 6), and only k·dim sum
   * rows ever reach the driver. Empty cells keep their previous centroid.
   *
   * At 100 TB the standard practice this mirrors: train on a `df.sample`
   * (centroid quality needs a fraction of the corpus), then assign the full
   * corpus once. Float means are summed in double but partial-sum order is
   * nondeterministic, so trained centroids are bit-approximate across runs —
   * fine for IVF routing, which is why the trainer is spec-verified on
   * cluster recovery rather than oracle-hashed.
   */
  def kmeansCentroids(df: DataFrame, vecCol: String, idCol: String, k: Int,
                      iters: Int = 5): Seq[Array[Float]] = {
    var cents = firstKCentroids(df, vecCol, idCol, k)
    var it = 0
    while (it < iters) {
      val withDvec = df
        .select(col(idCol).as("_id"), col(vecCol).as("vec"),
          transform(col(vecCol), _.cast("double")).as("_dv"))
        .select(col("_id"), col("vec"), col("_dv"), norm(col("_dv")).as("_na"))
      val assigned =
        if (k > ivfLiteralFoldMaxK)
          assignCellsBroadcast(withDvec, "_id", centroidTable(df.sparkSession, cents))
            .select(col("vec"), col("cell"))
        else {
          val sc = scoredCells(centroidLit(cents)) _
          withDvec.select(col("vec"),
            array_min(sc(col("_dv"), col("_na"))).getField("cell").as("cell"))
        }
      val sums = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        rows.foreach { r =>
          next(cell)(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat
        }
      }
      cents = next.toSeq
      it += 1
    }
    cents
  }

  /**
   * Mean assignment cost of a centroid set: avg over rows of
   * (1 − cos(vec, nearest centroid)) — the routing-quality objective a
   * trained IVF index is judged by. One scan, no shuffle beyond the final
   * scalar agg.
   */
  def meanAssignmentCost(df: DataFrame, vecCol: String,
                         centroids: Seq[Array[Float]]): Double =
    meanAssignmentCostPath(df, vecCol, centroids,
      useBroadcast = centroids.size > ivfLiteralFoldMaxK)

  /** Path-forced variant (package-private for parity specs). */
  private[graft] def meanAssignmentCostPath(df: DataFrame, vecCol: String,
                                            centroids: Seq[Array[Float]],
                                            useBroadcast: Boolean): Double =
    if (useBroadcast) {
      // broadcast path needs a per-row grouping key for the argmin; a
      // partition-stable synthetic id suffices (rows are never re-identified)
      val withDvec = df
        .select(monotonically_increasing_id().as("_id"),
          col(vecCol).as("vec"), transform(col(vecCol), _.cast("double")).as("_dv"))
        .select(col("_id"), col("vec"), col("_dv"), norm(col("_dv")).as("_na"))
      joinedCellScores(withDvec, "_id", centroidTable(df.sparkSession, centroids))
        .groupBy(col("_id")).agg(min(col("neg")).as("neg"))
        .select((col("neg") + lit(1.0)).as("cost"))
        .agg(avg(col("cost"))).head().getDouble(0)
    } else {
      val sc = scoredCells(centroidLit(centroids)) _
      df.select(transform(col(vecCol), _.cast("double")).as("_dv"))
        .select(col("_dv"), norm(col("_dv")).as("_na"))
        .select((array_min(sc(col("_dv"), col("_na"))).getField("neg") + lit(1.0)).as("cost"))
        .agg(avg(col("cost"))).head().getDouble(0)
    }
}
