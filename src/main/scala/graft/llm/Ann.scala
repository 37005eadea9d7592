package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`): brute-force
 * cosine top-k as the exact baseline, plus a hyperplane-LSH bucketed variant
 * as the 100 TB scale path (probe only matching buckets — no full scan per
 * query, no crossJoin).
 *
 * All vector math is expression-only (`zip_with`/`aggregate` folds in double
 * precision) — stays in whole-stage codegen.
 */
object Ann extends AnnPairs with AnnIvf {

  /** Sequential-fold dot product in double precision. Native codegen'd
    * expression ([[DotProductExpr]]): same left-to-right accumulation as
    * the original `aggregate(zip_with(…))` fold — bit-identical scores —
    * without the per-evaluation product-array allocation (the hot inner
    * op of every brute-force / rerank / mining stage). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(DotProductExpr(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
  }

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Pair-stage cosine from norms hoisted to the per-ROW preps: identical
    * arithmetic to [[cosine]] (d/(na·nb), zero-guard, same fold order) but
    * the pair loop pays ONE native dot instead of re-folding both sides'
    * norms per candidate pair. Callers compute `na`/`nb` with [[norm]] on
    * the same vectors at prep time — sims are bit-identical. */
  def cosinePrepped(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot(a, b) / (na * nb))

  /** L2-normalize a vector to unit length (zero vectors pass through). */
  def l2Normalize(vec: Column): Column = {
    val n = norm(vec)
    when(n === 0, transform(vec, _.cast("double")))
      .otherwise(transform(vec, v => v.cast("double") / n))
  }

  /**
   * Symmetric int8 quantization: clamp to [-1,1], scale to [-127,127],
   * round — the storage form embedding pipelines ship at scale (4× smaller
   * than float32; pair with [[l2Normalize]] first).
   */
  def quantizeInt8(vec: Column): Column =
    transform(vec, v =>
      round(greatest(lit(-1.0), least(lit(1.0), v.cast("double"))) * 127).cast("long"))

  /**
   * Deterministic random projection to `outDim` dimensions (Johnson-
   * Lindenstrauss style): output d = Σ v(i)·coeff(d,i) with hash-derived
   * coefficients — the no-training dimensionality-reduction path.
   */
  def randomProjection(vec: Column, inDim: Int, outDim: Int): Column = {
    val comps = (0 until outDim).map { d =>
      val coeffs = array((0 until inDim).map(i => lit(planeCoeff(d + 1000, i))): _*)
      aggregate(zip_with(vec, coeffs, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
    }
    array(comps: _*)
  }

  /**
   * Exact brute-force top-k cosine neighbors of one query vector. The query
   * vector is a literal (broadcast into codegen); the scan computes one
   * similarity per row and TakeOrderedAndProject keeps k — a single pass,
   * no shuffle beyond the final top-k merge.
   */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     query: Array[Float], k: Int,
                     excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val base = excludeId.map(id => df.filter(col(idCol) =!= id)).getOrElse(df)
    // rank on the 6-dp-ROUNDED similarity (raw sim still returned): the
    // rank key must be engine-stable — two near-tied candidates straddling
    // the top-k boundary would otherwise be decided by the last ulp of the
    // fold order, which an external oracle cannot reproduce
    base.select(col(idCol),
        cosine(transform(col(vecCol), _.cast("double")), q).as("cosine_sim"))
      .orderBy(round(col("cosine_sim"), 6).desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Maximum-inner-product top-k via norm AUGMENTATION (Bachrach et al.
   * 2014, "Speeding up the Xbox recommender system using a euclidean
   * transformation"; Neyshabur & Srebro 2015, asymmetric LSH for MIPS) —
   * the retrieval problem unnormalized embeddings pose: rank by ⟨q,x⟩,
   * which has no locality-sensitive family of its own. The transform
   * x̂ = [x; √(M² − ‖x‖²)] with M = max corpus norm and q̂ = [q; 0]
   * makes every augmented corpus vector length exactly M, so
   * cos(q̂, x̂) = ⟨q,x⟩ / (‖q‖·M) is MONOTONE in the inner product and
   * the whole cosine index stack (LSH / IVF / PQ) serves MIPS unchanged.
   *
   * Engine-stability: ⟨q̂,x̂⟩ ≡ ⟨q,x⟩ bit-exactly (the appended component
   * multiplies the query's literal 0.0, and adding +0.0 to a running
   * double sum is the identity), so the rank key is the 6-dp-rounded
   * inner product — the [[bruteForceTopK]] convention — while
   * `aug_cosine` carries the reduced score an index would bucket on,
   * computed from the ACTUAL augmented vectors (same formula an oracle
   * replays: append, dot, divide).
   *
   * Scale shape: M² is a one-row aggregate that rides a
   * BroadcastHashJoin on a non-foldable constant key (the
   * [[joinedCellScores]] device) — two corpus scans, zero collects,
   * TakeOrderedAndProject keeps k. The augmentation column itself is
   * what a 100 TB deployment would precompute once at ingest; here it is
   * inlined so the operator is self-contained.
   */
  def mipsTopK(df: DataFrame, vecCol: String, idCol: String,
               query: Array[Float], k: Int,
               excludeId: Option[Long] = None): DataFrame = {
    val base0 = excludeId.map(id => df.filter(col(idCol) =!= id)).getOrElse(df)
    val base = base0.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("_v"))
    val m2 = base.agg(max(dot(col("_v"), col("_v"))).as("_m2"))
      .withColumn("_k", pmod(xxhash64(col("_m2")), lit(1)))
    val q = array(query.map(v => lit(v.toDouble)) :+ lit(0.0): _*)
    base.withColumn("_k", pmod(xxhash64(col(idCol)), lit(1)))
      .join(broadcast(m2), "_k")
      .select(col(idCol),
        cosine(concat(col("_v"),
          array(sqrt(greatest(lit(0.0), col("_m2") - dot(col("_v"), col("_v")))))),
          q).as("aug_cosine"),
        dot(col("_v"), array(query.map(v => lit(v.toDouble)): _*)).as("inner_product"))
      .select(col(idCol), round(col("inner_product"), 6).as("inner_product"),
        round(col("aug_cosine"), 6).as("aug_cosine"))
      .orderBy(col("inner_product").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Exact top-k cosine neighbors for EVERY query row — the multi-query
   * brute-force baseline (ground truth for index-quality evaluation,
   * [[RetrievalEval]]). The query side rides a BroadcastHashJoin on a
   * shared non-foldable constant key (the [[joinedCellScores]] device: a
   * foldable `true` condition would degenerate to a
   * BroadcastNestedLoopJoin and trip the plan audit), so the corpus is
   * scanned ONCE and each partition scores its rows against the
   * broadcast query set — the O(|Q|·N) work brute force genuinely is,
   * with no shuffle of the corpus. Rank key is the 6-dp-rounded sim
   * (engine-stable boundary, see [[bruteForceTopK]]).
   */
  def bruteForceTopKJoin(corpus: DataFrame, queries: DataFrame,
                         vecCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), _.cast("double")).as("_qv"))
      .withColumn("_nq", norm(col("_qv")))
      .withColumn("_k", pmod(xxhash64(col("query_id")), lit(1)))
    val c = corpus.select(col(idCol).as("corpus_id"),
        transform(col(vecCol), _.cast("double")).as("_cv"))
      .withColumn("_nc", norm(col("_cv")))
      .withColumn("_k", pmod(xxhash64(col("corpus_id")), lit(1)))
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("cosine_sim"), 6).desc, col("corpus_id").asc)
    c.join(broadcast(q), "_k")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosinePrepped(col("_qv"), col("_cv"), col("_nq"), col("_nc")).as("cosine_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * Matryoshka truncation evaluation (Kusupati et al. 2022, MRL — the
   * embedding-deployment question every retrieval stack now asks: how
   * much recall does serving the FIRST d dimensions cost?): for each
   * candidate prefix length, rank by cosine over the truncated vectors
   * and measure overlap@k against the full-dimension ranking. The output
   * is the dim-vs-recall table that picks the serving dimension.
   *
   * Exact integers out (hit counts; mean recall in floor micro-units) —
   * rankings use the 6-dp-rounded sim + id tie-break (engine-stable, the
   * l9 rule). Scale shape: one [[bruteForceTopKJoin]] per dim (queries
   * broadcast, corpus scanned once per dim, no shuffle); an eval-set
   * operator — per-query cost is O(N·d), run it on the eval slice, not
   * the corpus.
   */
  def matryoshkaEval(emb: DataFrame, vecCol: String, idCol: String,
                     dims: Seq[Int], k: Int, nQueries: Int): DataFrame = {
    val queries = emb.filter(col(idCol) < nQueries)
    val truth = bruteForceTopKJoin(emb, queries, vecCol, idCol, k)
      .select(col("query_id"), col("corpus_id"))
    dims.map { d =>
      val sliced = emb.select(col(idCol), slice(col(vecCol), 1, d).as("_mv"))
      val top = bruteForceTopKJoin(sliced, sliced.filter(col(idCol) < nQueries),
        "_mv", idCol, k)
      top.join(truth, Seq("query_id", "corpus_id"), "left_semi")
        .agg(count(lit(1)).cast("long").as("sum_hits"))
        .select(lit(d.toLong).as("dim"),
          lit(nQueries.toLong).as("n_queries"),
          col("sum_hits"),
          expr(s"(sum_hits * 1000000L) div (${nQueries.toLong}L * ${k}L)")
            .cast("long").as("mean_recall_micro"))
    }.reduce(_ unionByName _)
  }

  /**
   * Hard-negative mining for contrastive training data: per query, the
   * k most cosine-similar corpus vectors with a DIFFERENT label — the
   * "looks like the anchor but isn't its class" examples a retrieval /
   * classifier trainer wants next to each positive.
   *
   * Same 100 TB shape as [[bruteForceTopKJoin]]: queries broadcast on a
   * non-foldable constant key (BroadcastHashJoin, never a
   * BroadcastNestedLoopJoin), the corpus scanned ONCE with no shuffle;
   * the label filter prunes before the per-query window. Rank key is the
   * 6-dp-rounded sim with id tie-break — engine-stable boundaries.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("query_label"),
        transform(col(vecCol), _.cast("double")).as("_qv"))
      .withColumn("_nq", norm(col("_qv")))
      .withColumn("_k", pmod(xxhash64(col("query_id")), lit(1)))
    val c = corpus.select(col(idCol).as("corpus_id"),
        col(labelCol).as("corpus_label"),
        transform(col(vecCol), _.cast("double")).as("_cv"))
      .withColumn("_nc", norm(col("_cv")))
      .withColumn("_k", pmod(xxhash64(col("corpus_id")), lit(1)))
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("cosine_sim"), 6).desc, col("corpus_id").asc)
    c.join(broadcast(q), "_k")
      .filter(col("query_label") =!= col("corpus_label"))
      .select(col("query_id"), col("query_label"), col("corpus_id"),
        col("corpus_label"),
        cosinePrepped(col("_qv"), col("_cv"), col("_nq"), col("_nc")).as("cosine_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("cosine_sim", round(col("cosine_sim"), 6))
  }

  /**
   * Candidate-path hard-negative mining — the scale form of
   * [[hardNegatives]] and the registered l73 row since round 10 (the
   * exact form's work grows as |Q|·|corpus| = quadratically when queries
   * are a fixed fraction of the corpus — the one >15× sf0.1→sf1 mover
   * left after the l84 swap): per query, the k most-similar
   * DIFFERENT-label vectors among multi-table LSH candidates, retrieved
   * with exactly [[lshTopK]]'s probe discipline (per table: own bucket +
   * every 1-bit flip), then the label filter and the engine-stable
   * rounded-sim window. Contrastive training mines hard negatives from
   * an ANN index in practice (the l84 lesson applies verbatim); the
   * exact form stays as the small-corpus cross-check, spec-proven to
   * agree on a retrieval-certain fixture.
   */
  def hardNegativesLsh(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, labelCol: String, k: Int, dim: Int,
      nPlanes: Int = 10, nTables: Int = 8): DataFrame = {
    require(nPlanes > 0 && nTables > 0 && nPlanes + ceilLog2(nTables) <= 62,
      s"table tag (nTables=$nTables) must fit above $nPlanes bucket bits in a long")
    val spark = corpus.sparkSession
    val tagged = (0 until nTables).map { t =>
      lit(t.toLong << nPlanes).bitwiseOR(
        HyperplaneBucket.bucketCol(spark, "cvec", nPlanes, t * nPlanes))
    }
    val cb = corpus.select(col(idCol).as("corpus_id"),
        col(labelCol).as("corpus_label"), col(vecCol).as("cvec"))
      .withColumn("_nc", norm(col("cvec"))) // once per row, BEFORE the table explode
      .withColumn("bucket", explode(array(tagged: _*)))
    val qtagged = (0 until nTables).map { t =>
      lit(t.toLong << nPlanes).bitwiseOR(
        HyperplaneBucket.bucketCol(spark, "qvec", nPlanes, t * nPlanes))
    }
    val qbase = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("query_label"), col(vecCol).as("qvec"))
      .withColumn("_nq", norm(col("qvec")))
      .withColumn("qbucket", explode(array(qtagged: _*)))
    val probes = col("qbucket") +: (0 until nPlanes).map(p => col("qbucket").bitwiseXOR(lit(1L << p)))
    val qb = qbase.select(col("query_id"), col("query_label"), col("qvec"), col("_nq"),
      explode(array(probes: _*)).as("bucket"))
    val scored = qb.join(cb, "bucket")
      .filter(col("query_label") =!= col("corpus_label")) // implies corpus_id ≠ query_id
      .select(col("query_id"), col("query_label"), col("corpus_id"), col("corpus_label"),
        cosinePrepped(col("qvec"), col("cvec"), col("_nq"), col("_nc")).as("cosine_sim"))
      .distinct() // candidates found by several tables/probes collapse (same sim bits)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("cosine_sim"), 6).desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("cosine_sim", round(col("cosine_sim"), 6))
  }

  /**
   * Deterministic pseudo-random unit-free hyperplanes: plane p, dim d →
   * a fixed hash-derived coefficient in [-1, 1). No RNG state — the same
   * plane set on every executor and every run.
   */
  private[graft] def planeCoeff(plane: Int, dim: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, dim))
    (h.toDouble / Int.MaxValue.toDouble)
  }

  /** Bits needed to tag `n` distinct table ids (0 for n=1). */
  private[llm] def ceilLog2(n: Int): Int = 64 - java.lang.Long.numberOfLeadingZeros(math.max(n - 1, 0).toLong).toInt

  /** Sign-bit bucket key from `nPlanes` hyperplanes starting at global
    * plane index `planeOffset` (expression-only twin of the native
    * [[HyperplaneBucket]]). */
  def hyperplaneBucket(vec: Column, dim: Int, nPlanes: Int,
                       planeOffset: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      val coeffs = array((0 until dim).map(d => lit(planeCoeff(planeOffset + p, d))): _*)
      val proj = aggregate(zip_with(vec, coeffs, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * LSH-bucketed ANN with STANDARD AMPLIFICATION: `nTables` independent
   * hash tables of `nPlanes` sign bits each (table t draws planes
   * `[t·nPlanes, (t+1)·nPlanes)` of the one deterministic coefficient
   * family; its bucket keys are tagged `t << nPlanes`, so tables can share
   * one equi-join). Each query probes, PER TABLE, its own bucket and the
   * single-bit-flip neighbors (multi-probe); exact cosine then ranks the
   * unioned candidates.
   *
   * Why tables: a single b-bit table recalls a true neighbor with
   * per-plane agreement p only with probability ≈ pᵇ (plus b·pᵇ⁻¹(1-p)
   * from multi-probe) — at p = 0.6 (cosine ≈ 0.3, this fixture's top-5
   * regime) a lone 12-bit table measures recall@5 = 0.013. L tables
   * amplify to 1-(1-pᵇ…)ᴸ: b=6, L=8 measures 0.92+ (AnnRecallSpec pins
   * the floor). Candidate volume scales as L·(b+1)·N/2ᵇ — still bucketed,
   * one shuffle on the tagged key, no crossJoin; at 100 TB you raise b as
   * corpus density (and target similarity) rises and L buys recall back.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, dim: Int, k: Int, nPlanes: Int = 6,
              nTables: Int = 8): DataFrame = {
    require(nPlanes > 0 && nTables > 0 && nPlanes + ceilLog2(nTables) <= 62,
      s"table tag (nTables=$nTables) must fit above $nPlanes bucket bits in a long")
    val spark = corpus.sparkSession
    // one row per (vector, table): tagged bucket keys, native expression
    val tagged = (0 until nTables).map { t =>
      lit(t.toLong << nPlanes).bitwiseOR(
        HyperplaneBucket.bucketCol(spark, "cvec", nPlanes, t * nPlanes))
    }
    val cb = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
      .withColumn("_nc", norm(col("cvec"))) // once per row, BEFORE the table explode
      .withColumn("bucket", explode(array(tagged: _*)))
    // query probes: per table, own bucket + each 1-bit flip (XOR touches
    // only the low nPlanes bits — the table tag is preserved). Buckets are
    // computed ONCE per (row, table); probes derived by XOR.
    val qtagged = (0 until nTables).map { t =>
      lit(t.toLong << nPlanes).bitwiseOR(
        HyperplaneBucket.bucketCol(spark, "qvec", nPlanes, t * nPlanes))
    }
    val qbase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("_nq", norm(col("qvec"))) // once per row, before explodes
      .withColumn("qbucket", explode(array(qtagged: _*)))
    val probes = col("qbucket") +: (0 until nPlanes).map(p => col("qbucket").bitwiseXOR(lit(1L << p)))
    val qb = qbase.select(col("query_id"), col("qvec"), col("_nq"),
        explode(array(probes: _*)).as("bucket"))
    // native dot widens float elements exactly like the former
    // transform-cast-per-pair, so sims (and the dedup distinct) are
    // bit-identical with the per-pair casts and norm folds gone
    val scored = qb.join(cb, "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosinePrepped(col("qvec"), col("cvec"), col("_nq"), col("_nc")).as("cosine_sim"))
      .distinct()
    // per-query top-k via window rank, keyed on the 6-dp-ROUNDED similarity
    // (engine-stable boundary; see bruteForceTopK)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("cosine_sim"), 6).desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("rank")
  }
}
