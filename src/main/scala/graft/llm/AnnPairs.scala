package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The in-bucket PAIR-GENERATION family of [[Ann]] (round-10 file split,
 * pure move, no behavior change): member prep, capped exploded pairs,
 * embedding near-dups, the LSH kNN self-join, SemDeDup semantic dedup,
 * and margin-based bitext mining (exact + LSH candidate path). Mixed into
 * `object Ann`, so every call site keeps addressing `Ann.<member>`.
 */
private[llm] trait AnnPairs { this: Ann.type =>

  /** Per-member prep for in-bucket pair generation: (id, dv, na) with the
    * float→double cast and the L2 norm hoisted OUT of the per-pair lambdas.
    * The inline form re-cast BOTH vectors and re-derived BOTH norms for
    * every pair (no CSE inside lambda bodies — 5 array traversals/pair);
    * with this prep a pair costs ONE zip_with/aggregate dot. Cast
    * float→double is exact and the norm expression is unchanged, so
    * downstream sims are bit-identical to the inline form. */
  private def memberStruct(idC: Column, vecC: Column): Column = {
    val dv = transform(vecC, _.cast("double"))
    struct(idC.as("id"), dv.as("dv"), norm(dv).as("na"))
  }

  /** [[memberStruct]] plus the population side — carried through the one
    * bucket agg so cross-side pair generation needs no second shuffle. */
  private def sideMemberStruct(idC: Column, vecC: Column, sideC: Column): Column = {
    val dv = transform(vecC, _.cast("double"))
    struct(idC.as("id"), dv.as("dv"), norm(dv).as("na"), sideC.as("side"))
  }

  /** Exploded in-bucket candidate pairs (id1 < id2, sim) from a grouped
    * frame carrying `members: array<struct<id,dv,na>>`. The sorted array
    * is materialized as its OWN projection stage first: referencing
    * `array_sort` from inside the pair lambda re-sorts the members once
    * per outer element (no CSE in lambda bodies); a bound attribute is an
    * O(1) read, and CollapseProject leaves the stage alone because the
    * attribute is referenced more than once. Sims are bit-identical to
    * the former inline-cosine form (see [[memberStruct]]). */
  private def explodedPairs(buckets: DataFrame): DataFrame = {
    val ms = col("ms")
    buckets.select(array_sort(col("members")).as("ms"))
      .select(explode(flatten(transform(ms, (a, i) =>
        transform(slice(ms, i + 2, size(ms)), bb => {
          // native dot (DotProductExpr): inside a HOF lambda everything is
          // interpreted, so the zip_with form built a product array per
          // pair and folded it element-by-element; the native loop is one
          // eval call — same accumulation order, bit-identical sims
          val d = dot(a.getField("dv"), bb.getField("dv"))
          val sim = when(a.getField("na") === 0 || bb.getField("na") === 0, lit(0.0))
            .otherwise(d / (a.getField("na") * bb.getField("na")))
          struct(a.getField("id").as("id1"), bb.getField("id").as("id2"),
            sim.as("sim"))
        })))).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"), col("p.sim").as("sim"))
  }

  /** Multi-table hyperplane bucket prep shared by [[embeddingNearDups]],
    * [[lshKnnJoin]] and [[marginBitextMineLsh]] (extracted round 10 — the
    * tag/require/cap logic lived in three verbatim copies that could
    * drift): `prepped` must carry a `vec` column plus the per-row member
    * struct as `m`; table t's buckets are tagged `t << nPlanes` over plane
    * slice t·nPlanes, exploded one row per (vector, table), collected into
    * capped per-bucket member lists — ONE shuffle on bucket. */
  private def cappedBuckets(prepped: DataFrame, nPlanes: Int, nTables: Int,
      maxBucketSize: Int, dropStats: Option[DropStats]): DataFrame = {
    require(nPlanes > 0 && nTables > 0 && nPlanes + ceilLog2(nTables) <= 62,
      s"table tag (nTables=$nTables) must fit above $nPlanes bucket bits in a long")
    val spark = prepped.sparkSession
    val tagged = (0 until nTables).map { t =>
      lit(t.toLong << nPlanes).bitwiseOR(
        HyperplaneBucket.bucketCol(spark, "vec", nPlanes, t * nPlanes))
    }
    val grouped = prepped.withColumn("bucket", explode(array(tagged: _*)))
      .groupBy("bucket").agg(collect_list(col("m")).as("members"))
    Dedup.observeDrops(grouped, "members", maxBucketSize, dropStats)
      .filter(size(col("members")).between(2, maxBucketSize))
  }

  /**
   * Embedding-cosine near-dup pairs at scale: bucket by hyperplane signs,
   * pair within buckets only, keep pairs with cosine ≥ threshold.
   *
   * `nTables` independent tables amplify recall exactly as in [[lshTopK]]
   * (table t on plane slice t·nPlanes, keys tagged `t << nPlanes`; the
   * final `distinct()` dedups pairs found by several tables). In the
   * realistic near-dup regime (cosine ≥ 0.9, per-plane agreement ≈ 0.86)
   * a single 8-plane table catches ~30% of true pairs; 4 tables ≈ 76%,
   * 8 ≈ 94% — AnnRecallSpec measures this on planted duplicates. Scale
   * knobs: nPlanes sets bucket COUNT (occupancy, and with it pair volume,
   * grows as corpus/2^nPlanes — raise nPlanes as the corpus grows, the
   * same saturation lesson as the r8 SimHash re-banding), nTables buys
   * the recall back.
   */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        dim: Int, threshold: Double, nPlanes: Int = 10,
                        maxBucketSize: Int = 2000,
                        dropStats: Option[DropStats] = None,
                        nTables: Int = 1): DataFrame = {
    val buckets = cappedBuckets(
      df.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("m", memberStruct(col("id"), col("vec"))), // prep once, pre-explode
      nPlanes, nTables, maxBucketSize, dropStats)
    explodedPairs(buckets)
      .select(col("id1"), col("id2"), col("sim").as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
      .distinct()
  }

  /**
   * Approximate k-NN SELF-join: every vector's top-`k` neighbors among
   * LSH-candidate pairs (the retrieval-augmentation shape — "for each
   * training doc, its k nearest corpus docs" — where a per-query probe
   * like [[lshTopK]] would be one job per row). Candidate generation is
   * [[embeddingNearDups]] at threshold −1 (all bucketed pairs, same
   * multi-table amplification and per-bucket caps), mirrored to both
   * directions, then a per-id window keeps k by the engine-stable rounded
   * rank key.
   *
   * Scale shape: pair volume stays bounded by nTables·cap²/2 per bucket —
   * never all-pairs. BOTH directions of each pair are emitted inside the
   * one in-bucket pair expression (each cosine computed once), so the plan
   * keeps a SINGLE candidate-generation subtree — a mirror `union` of an
   * undirected pair frame would recompute the whole explode+agg per arm
   * (Spark has no cross-arm CSE). One scan, then: bucket agg → directed
   * distinct → window on id. Raise nPlanes with corpus density exactly as
   * documented on [[embeddingNearDups]].
   *
   * Output: (id, neighbor_id, rank, cosine_sim@6dp), rank 1-based.
   */
  def lshKnnJoin(df: DataFrame, vecCol: String, idCol: String, dim: Int,
                 k: Int, nPlanes: Int = 8, nTables: Int = 4,
                 maxBucketSize: Int = 2000,
                 dropStats: Option[DropStats] = None): DataFrame = {
    val buckets = cappedBuckets(
      df.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("m", memberStruct(col("id"), col("vec"))), // prep once, pre-explode
      nPlanes, nTables, maxBucketSize, dropStats)
    // mirror AFTER the pair explode, on materialized columns — each sim is
    // genuinely computed once (the former in-lambda two-struct form inlined
    // the cosine tree twice; a union of arms would recompute the whole
    // explode+agg subtree per arm)
    val directed = explodedPairs(buckets)
      .select(explode(array(
        struct(col("id1").as("id"), col("id2").as("neighbor_id"), col("sim").as("cosine_sim")),
        struct(col("id2").as("id"), col("id1").as("neighbor_id"), col("sim").as("cosine_sim")))).as("p"))
      .select(col("p.id").as("id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.cosine_sim").as("cosine_sim"))
      .distinct() // pairs found by several tables collapse (same sim bits)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id")
      .orderBy(round(col("cosine_sim"), 6).desc, col("neighbor_id").asc)
    directed.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("neighbor_id"), col("rank"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
   * data-efficient learning at web-scale through semantic deduplication",
   * public): assign every vector to its nearest centroid, compare pairs
   * ONLY within a cell, and drop each vector that has a LOWER-id neighbor
   * at cosine ≥ `threshold` — keep-first inside semantic neighborhoods.
   * Near-dup dedup ([[embeddingNearDups]]) catches copies; this catches
   * *paraphrases* that land in the same semantic cell.
   *
   * Cell assignment reuses the IVF scorer family — centroid-literal fold
   * below [[ivfLiteralFoldMaxK]] cells, broadcast centroid table above —
   * so assignment is bit-identical to [[ivfTopK]]'s and the plan stays
   * O(1) in k at real cell counts. In-cell pair generation is the same
   * capped sorted-slice expression as [[embeddingNearDups]]: a cell larger
   * than `maxCellSize` yields no pairs (its members are all kept) rather
   * than an O(cell²) blow-up, and the cap is observable via `dropStats`.
   *
   * Scale shape: one broadcast (centroids), one shuffle on cell, one
   * left-anti-style join back on id. At 100 TB you raise the centroid
   * count so expected cell occupancy stays under the cap — the same
   * density knob as IVF. That rule is EXECUTABLE, not prose: pass
   * `corpusSize` (callers usually know it) and the call fails fast when
   * cells × maxCellSize < corpus — a model whose total capacity can't
   * hold the corpus would silently drop nearly every cell whole — or use
   * [[semanticDedupAuto]], which derives the cell count from the corpus.
   *
   * Output: (id, cell, kept) for EVERY input row — the release-gate form
   * (downstream filters `kept`; auditors count drops per cell).
   */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
                    centroids: Seq[Array[Float]], threshold: Double,
                    maxCellSize: Int = 2000,
                    dropStats: Option[DropStats] = None,
                    corpusSize: Option[Long] = None): DataFrame = {
    corpusSize.foreach { n =>
      require(centroids.size.toLong * maxCellSize >= n,
        s"semanticDedup: ${centroids.size} cells x maxCellSize=$maxCellSize " +
          s"= capacity ${centroids.size.toLong * maxCellSize} < corpus $n — " +
          "over-cap cells are dropped WHOLE, so this model would skip most " +
          "of the corpus; raise the centroid count (cells ~ corpus / " +
          "targetCellSize, see semanticDedupAuto) or the cap")
    }
    val spark = df.sparkSession
    val wd = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        transform(col(vecCol), _.cast("double")).as("_dv"))
      .select(col("id"), col("vec"), col("_dv"), norm(col("_dv")).as("_na"))
    val assigned =
      if (centroids.size > ivfLiteralFoldMaxK)
        assignCellsBroadcast(wd, "id", centroidTable(spark, centroids))
          .select(col("id"), col("vec"), col("cell").cast("long").as("cell"))
      else wd.select(col("id"), col("vec"),
        array_min(scoredCells(centroidLit(centroids))(col("_dv"), col("_na")))
          .getField("cell").cast("long").as("cell"))
    val grouped = assigned
      .select(col("cell"), memberStruct(col("id"), col("vec")).as("m"))
      .groupBy("cell").agg(collect_list(col("m")).as("members"))
    val pairs = Dedup.observeDrops(grouped, "members", maxCellSize, dropStats)
      .filter(size(col("members")).between(2, maxCellSize))
    val dropIds = explodedPairs(pairs)
      .filter(col("sim") >= threshold)
      .select(col("id2").as("_drop_id")).distinct()
    assigned.join(dropIds, col("id") === col("_drop_id"), "left")
      .select(col("id"), col("cell"), col("_drop_id").isNull.as("kept"))
  }

  /** Cells needed so EXPECTED occupancy is `targetCellSize`:
    * ceil(n / target). SemDeDup itself runs ~10⁵ clusters at web scale —
    * the cell count is a function of the corpus, never a fixed knob. */
  def deriveCellCount(corpusSize: Long, targetCellSize: Int): Int = {
    require(corpusSize >= 0 && targetCellSize > 0,
      s"corpusSize=$corpusSize targetCellSize=$targetCellSize")
    math.max(1L, (corpusSize + targetCellSize - 1) / targetCellSize)
      .min(Int.MaxValue.toLong).toInt
  }

  /**
   * [[semanticDedup]] with the cell count DERIVED from the corpus instead
   * of hard-coded: count once, size the model as ceil(n / targetCellSize)
   * cells, train centroids with the distributed Lloyd trainer
   * ([[kmeansCentroids]] — at 100 TB train on `df.sample` upstream, the
   * trainer's documented practice), and run the dedup with the capacity
   * guard armed. `maxCellSize` defaults to 4× the target, so a cell must
   * be 4× over-dense before its members are exempted — k-means cells are
   * uneven, but drop mass stays bounded as the corpus grows because the
   * cell count grows WITH it (spec'd in SemanticDedupScaleSpec at ×10).
   */
  def semanticDedupAuto(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double, targetCellSize: Int = 1000,
                        capFactor: Int = 4, kmeansIters: Int = 3,
                        dropStats: Option[DropStats] = None): DataFrame = {
    require(capFactor >= 1, s"capFactor must be >= 1, got $capFactor")
    val n = df.count()
    val cells = deriveCellCount(n, targetCellSize)
    val cents = kmeansCentroids(df, vecCol, idCol, cells, kmeansIters)
    semanticDedup(df, vecCol, idCol, cents, threshold,
      maxCellSize = targetCellSize * capFactor, dropStats = dropStats,
      corpusSize = Some(n))
  }

  /**
   * Margin-based bitext mining (Artetxe & Schwenk 2019, public): align
   * two embedding populations (source vs target language, old vs new
   * crawl) by MUTUAL nearest neighbors scored with the margin criterion —
   * `margin(x,y) = cos(x,y) / mean(topK cos of x and of y)` — which
   * suppresses hub vectors that are "everyone's neighbor" and would
   * flood a raw-cosine threshold with false pairs.
   *
   * Shape: the side-B table rides a broadcast on a non-foldable constant
   * key (BroadcastHashJoin — the l9/l73 pattern, never a nested-loop),
   * so side A streams ONCE; then two windows over the scored pairs
   * (partition a_id, partition b_id) give ranks and top-k means in the
   * same pass. This registered brute-force form is exact and
   * oracle-replayable; at 100 TB the pair generation swaps to the
   * LSH/IVF candidate paths (l10/l12) unchanged downstream, since
   * ranking/margin only ever see (a_id, b_id, sim) rows. Mean-of-top-k
   * uses the DECIMAL-exact sum of 6-dp-rounded sims (registry rule), so
   * margins are bit-identical across engines.
   */
  def marginBitextMine(df: DataFrame, vecCol: String, idCol: String,
      sideCol: Column, k: Int = 4, minMargin: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = df.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("_v"), sideCol.as("_side"))
    // norms hoisted OUT of the pair loop: cosine's norm(a)/norm(b) would
    // otherwise re-fold each 64-dim vector per PAIR (|A|·|B| times); here
    // each row folds its own norm once and the pair stage is a single dot.
    // d/(na·nb) on the same doubles in the same order — bit-identical sims.
    val a = e.filter(col("_side") === 0)
      .select(col("id").as("a_id"), col("_v").as("_av"), norm(col("_v")).as("_na"))
      .withColumn("_k", pmod(xxhash64(col("a_id")), lit(1)))
    val b = e.filter(col("_side") === 1)
      .select(col("id").as("b_id"), col("_v").as("_bv"), norm(col("_v")).as("_nb"))
      .withColumn("_k", pmod(xxhash64(col("b_id")), lit(1)))
    val sim = when(col("_na") === 0 || col("_nb") === 0, lit(0.0))
      .otherwise(dot(col("_av"), col("_bv")) / (col("_na") * col("_nb")))
    val pairs = a.join(broadcast(b), "_k")
      .select(col("a_id"), col("b_id"), round(sim, 6).as("sim"))
    marginTail(pairs, k, minMargin)
  }

  /** Mutual-top-1 + margin ranking over scored `(a_id, b_id, sim)` rows —
    * the tail shared by the exact ([[marginBitextMine]]) and candidate-path
    * ([[marginBitextMineLsh]]) forms: rank + top-k sum/count ride the SAME
    * per-side partitioning (two Window ops per exchange, zero groupBy
    * branches — a 3-branch rank/aAgg/bAgg/join-back form would recompute
    * the full pair pipeline per branch). `sim` must already be the
    * 6-dp-rounded engine-stable rank key; top-k means sum it as DECIMAL
    * (exact, order-free) so margins replay bit-identically in SQL. */
  private def marginTail(pairs: DataFrame, k: Int, minMargin: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wa = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val wb = Window.partitionBy("b_id").orderBy(col("sim").desc, col("a_id").asc)
    val pa = Window.partitionBy("a_id")
    val pb = Window.partitionBy("b_id")
    val simDec = col("sim").cast("decimal(18,6)")
    pairs
      .withColumn("ra", row_number().over(wa))
      .withColumn("_sa", sum(when(col("ra") <= k, simDec)).over(pa).cast("double"))
      .withColumn("_na", count(when(col("ra") <= k, lit(1))).over(pa))
      .withColumn("rb", row_number().over(wb))
      .withColumn("_sb", sum(when(col("rb") <= k, simDec)).over(pb).cast("double"))
      .withColumn("_nb", count(when(col("rb") <= k, lit(1))).over(pb))
      .filter(col("ra") === 1 && col("rb") === 1)
      .withColumn("margin",
        round(col("sim") / (lit(0.5) * (col("_sa") / col("_na") + col("_sb") / col("_nb"))), 6))
      .filter(col("margin") >= minMargin)
      .select(col("a_id"), col("b_id"), col("sim"), col("margin"))
  }

  /**
   * Candidate-path margin bitext mining — the scale form of
   * [[marginBitextMine]], and the registered/benched headline since round
   * 10: candidate (a, b) pairs come from the multi-table hyperplane-LSH
   * index (the l10/l11 plane family — table t on plane slice t·nPlanes,
   * bucket keys tagged `t << nPlanes`) instead of the exact cross
   * product, and mutual-top-1 + margin rank ONLY the retrieved lists.
   * That is exactly the Artetxe & Schwenk 2019 construction: in the
   * paper, margins are computed over FAISS-retrieved k-NN lists, never
   * over all |A|·|B| pairs — the exact form is the small-corpus oracle,
   * not the production shape.
   *
   * Scale shape: one explode (nTables rows per vector), one shuffle on
   * bucket, capped in-bucket cross-SIDE pair generation (a bucket larger
   * than `maxBucketSize` yields no pairs rather than an O(bucket²)
   * blow-up, observable via `dropStats`), then the shared window tail.
   * Pair volume is bounded by nTables · cap²/4 per bucket — never
   * all-pairs. Raise nPlanes as the corpus grows (bucket occupancy ~
   * corpus/2^nPlanes), nTables buys recall back, exactly as documented on
   * [[embeddingNearDups]]. Cross-checked against the exact form on
   * planted alignments in AnnSpec; the candidate set is replayed in SQL
   * by AnnOracles.marginBitextLshSql with literal plane coefficients.
   */
  def marginBitextMineLsh(df: DataFrame, vecCol: String, idCol: String,
      sideCol: Column, k: Int = 4, minMargin: Double = 1.0,
      nPlanes: Int = 8, nTables: Int = 8, maxBucketSize: Int = 2000,
      dropStats: Option[DropStats] = None): DataFrame = {
    val buckets = cappedBuckets(
      df.select(col(idCol).as("id"), col(vecCol).as("vec"),
          sideCol.cast("long").as("side"))
        .withColumn("m", sideMemberStruct(col("id"), col("vec"), col("side"))),
      nPlanes, nTables, maxBucketSize, dropStats)
    // side split as its OWN projection stage (bound attributes — filter()
    // referenced from inside the pair lambda would re-scan the members
    // array once per outer element; no CSE in lambda bodies)
    val pairs = buckets
      .select(filter(col("members"), m => m.getField("side") === 0).as("ma"),
              filter(col("members"), m => m.getField("side") === 1).as("mb"))
      .filter(size(col("ma")) > 0 && size(col("mb")) > 0)
      .select(explode(flatten(transform(col("ma"), a =>
        transform(col("mb"), bb => {
          val d = dot(a.getField("dv"), bb.getField("dv"))
          val sim = when(a.getField("na") === 0 || bb.getField("na") === 0, lit(0.0))
            .otherwise(d / (a.getField("na") * bb.getField("na")))
          struct(a.getField("id").as("a_id"), bb.getField("id").as("b_id"),
            sim.as("sim"))
        })))).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        round(col("p.sim"), 6).as("sim"))
      .distinct() // pairs found by several tables collapse (same sim bits)
    marginTail(pairs, k, minMargin)  }
}
