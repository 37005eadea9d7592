package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Ann, Dedup}
import graft.multimodal.Multimodal
import Registry.{td, tdw}

/**
 * Embedding/ANN-family registry rows (split from LlmQueries, round 9 —
 * pure mechanical move, registry content unchanged): brute-force /
 * LSH / IVF retrieval, embedding near-dups, kNN self-join, SemDeDup,
 * quantization (int8 + product quantization + ADC), k-means training,
 * per-source centroids, and the multimodal decode plumbing (m1/m2; m3+ live in MediaQueries).
 */
object AnnQueries {

  val all: Seq[(String, Q)] = Seq(
    // brute-force cosine top-k vs the vec_id=0 query vector (exact baseline)
    "l9_ann_bruteforce_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        Ann.bruteForceTopK(e, "embedding", "vec_id", q, k = 10, excludeId = Some(0L))
          .select(col("vec_id"), round(col("cosine_sim"), 6).as("cosine_sim"))
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
             |s AS (SELECT e.vec_id,
             |  list_dot_product(e.embedding::DOUBLE[], q.qv)
             |    / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
             |       * sqrt(list_dot_product(q.qv, q.qv))) AS sim
             |  FROM embeddings e, q WHERE e.vec_id <> 0)
             |SELECT vec_id, round(sim, 6) AS cosine_sim FROM s
             |ORDER BY round(sim, 6) DESC, vec_id LIMIT 10""".stripMargin), eager = true),

    // LSH-bucketed ANN: 16 queries probe hyperplane buckets only. Oracle:
    // literal-coefficient hyperplane twin; rank on the 6-dp-ROUNDED sim on
    // both sides (engine-stable rank key: a last-ulp divergence between
    // Spark's fold dot product and DuckDB's summation can't flip the
    // row_number boundary), output rounded to 6 dp
    // 8 tables × 6 planes (the amplified default): a single 12-plane table
    // measured recall@5 = 0.013 on this fixture (AnnRecallSpec) — useless
    // as a search structure even though its oracle replayed it exactly.
    "l10_ann_lsh_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 16)
        Ann.lshTopK(e, queries, "embedding", "vec_id", dim = 64, k = 5,
            nPlanes = 6, nTables = 8)
          .select(col("query_id"), col("corpus_id"),
            round(col("cosine_sim"), 6).as("cosine_sim"))
      },
      Some(AnnOracles.lshTopKSql(nPlanes = 6, dim = 64, nQueries = 16, k = 5,
        nTables = 8))),

    // embedding-cosine near-dup pairs, hyperplane-bucketed with 4-table
    // amplification (recall in the realistic >=0.9-cosine regime is gated
    // by AnnRecallSpec on planted dups; nPlanes=8 keeps buckets sparse as
    // the corpus grows). Oracle: same tagged buckets from the same
    // interpolated per-slice coefficients; threshold on raw sim
    "l11_embedding_neardups" -> Q(
      (s, dir) => Ann.embeddingNearDups(
        td(s, dir, "embeddings"), "embedding", "vec_id",
        dim = 64, threshold = 0.2, nPlanes = 8, nTables = 4)
        .select(col("id1"), col("id2"),
          round(col("cosine_sim"), 6).as("cosine_sim")),
      Some(AnnOracles.embeddingNearDupsSql(nPlanes = 8, dim = 64,
        threshold = 0.2, cap = 2000, nTables = 4))),

    // embedding preprocessing: L2-normalize → int8-quantize (the 4×-smaller
    // storage form); norms oracle-checked alongside
    // q8 serialized to CSV on BOTH sides: the driver's pandas comparator
    // cannot hash an array column. Zero-norm guard mirrored in the oracle
    // (l2Normalize passes zero vectors through; a raw divide would NaN).
    "l15_embedding_quantize" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
          .select(col("vec_id"), Ann.l2Normalize(col("embedding")).as("unit"))
        // compare the SQUARED norm: the left-to-right dot-product fold is
        // identical IEEE arithmetic on both engines (+,·,/ are correctly
        // rounded by the standard), while sqrt-then-round belongs to the
        // round-of-math-fn pattern the registry bans since the l104 ULP flip
        e.select(col("vec_id"),
          array_join(transform(Ann.quantizeInt8(col("unit")), _.cast("string")), ",").as("q8_csv"),
          round(Ann.dot(col("unit"), col("unit")), 6).as("unit_norm_sq"))
      },
      Some("""WITH u AS (SELECT vec_id,
             |  CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0
             |    THEN embedding::DOUBLE[]
             |    ELSE list_transform(embedding::DOUBLE[],
             |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) END AS unit
             |  FROM embeddings)
             |SELECT vec_id,
             |array_to_string(list_transform(unit,
             |  x -> CAST(CAST(round(greatest(-1.0, least(1.0, x)) * 127) AS BIGINT) AS VARCHAR)), ',') AS q8_csv,
             |round(list_dot_product(unit, unit), 6) AS unit_norm_sq FROM u""".stripMargin)),

    // multimodal plumbing: binary payload → typed feature extraction via
    // per-partition batch decode (decode itself is a deterministic stub);
    // byte-level fields are oracle-checked, the stub hash is not exposed here
    "m1_media_features" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.packText(td(s, dir, "documents"), "doc_id", "text")
        Multimodal.extractFeatures(media.as[graft.multimodal.MediaRecord])
          .toDF().select(
            col("media_id"), col("byte_len"), col("first_byte").cast("long").as("first_byte"),
            col("width").cast("long").as("width"), col("height").cast("long").as("height"))
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS media_id,
             |CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
             |CAST(64 + octet_length(encode(text)) % 1024 AS BIGINT) AS width,
             |CAST(64 + (ascii(substr(text, 1, 1)) * 7) % 768 AS BIGINT) AS height
             |FROM documents""".stripMargin)),

    // IVF k-means trainer: distributed Lloyd iterations over the embedding
    // corpus. Trained centroids are float-sum nondeterministic at the bit
    // level, so (like a15) the OUTPUT is the externally checkable property:
    // training must not worsen mean routing cost vs the first-k seeds
    // (asserted in-query with a small float-jitter tolerance).
    "l16_ivf_kmeans_train" -> Q(
      (s, dir) => {
        import s.implicits._
        val e = td(s, dir, "embeddings")
        val k = 16
        val seeds = Ann.firstKCentroids(e, "embedding", "vec_id", k)
        val trained = Ann.kmeansCentroids(e, "embedding", "vec_id", k, iters = 3)
        val seedCost = Ann.meanAssignmentCost(e, "embedding", seeds)
        val trainedCost = Ann.meanAssignmentCost(e, "embedding", trained)
        // no assert-throw: cosine-assignment + mean-update Lloyd is not
        // strictly monotone in the 1−cos objective, and the sums are
        // float-nondeterministic — a regression should fail THIS row's
        // hash compare visibly, not kill the whole verify/bench dump
        val improved = trainedCost <= seedCost + 1e-6
        Seq((k.toLong, improved)).toDF("k", "improved")
      },
      Some("SELECT CAST(16 AS BIGINT) AS k, true AS improved"), eager = true),

    // multimodal frame sampling: video-like payload → per-frame rows.
    // The stub decode is a pure function of the payload bytes, so even this
    // path is oracle-checked: DuckDB replays the wrap-around rolling hash
    // via HUGEINT arithmetic mod 2^64 (MediaOracles.sampleFramesSql)
    "m2_media_frames" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.packText(td(s, dir, "documents"), "doc_id", "text", "video")
        Multimodal.sampleFrames(media.as[graft.multimodal.MediaRecord], stride = 64)
          .toDF().select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("frame_hash"))
      },
      Some(MediaOracles.sampleFramesSql(stride = 64))),

    // approximate k-NN SELF-join: every vector's top-3 neighbors among
    // multi-table LSH candidates (same 8-plane × 4-table index as l11) —
    // the "for each doc, its k nearest corpus docs" retrieval shape. The
    // oracle replays buckets, mirrors pairs, and ranks by the same
    // rounded key
    "l37_knn_join" -> Q(
      (s, dir) => Ann.lshKnnJoin(td(s, dir, "embeddings"), "embedding",
        "vec_id", dim = 64, k = 3, nPlanes = 8, nTables = 4),
      Some(AnnOracles.lshKnnJoinSql(nPlanes = 8, dim = 64, k = 3,
        cap = 2000, nTables = 4))),

    // SemDeDup-style semantic dedup: nearest-of-16-centroids cells (IVF
    // scorer family, firstKCentroids seed), in-cell pairs only, drop on a
    // lower-id neighbor at cosine >= 0.35 (12% of the fixture — the
    // SemDeDup paper's single-digit-to-low-tens regime); every row comes
    // back with its cell and kept flag (the release-gate form)
    "l38_semantic_dedup" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val centroids = Ann.firstKCentroids(e, "embedding", "vec_id", k = 16)
        Ann.semanticDedup(e, "embedding", "vec_id", centroids, threshold = 0.35)
          .select(col("id").as("vec_id"), col("cell"), col("kept"))
      },
      Some(AnnOracles.semanticDedupSql(nCentroids = 16, threshold = 0.35,
        cap = 2000))),

    // product quantization encode (Jégou 2011): 64 floats -> 8 codes via
    // per-subspace seed codebooks sliced from the first-16 vectors — a
    // pure function of the DATA, so the oracle rebuilds the identical
    // codebook from the same parquet and replays encoding exactly
    "l52_pq_encode" -> Q(
      (s, dir) => {
        val e = tdw(s, dir, "embeddings")
        graft.llm.Pq.encode(e, "embedding", "vec_id",
            graft.llm.Pq.seedCodebooks(e, "embedding", "vec_id", m = 8, k = 16))
          .select(col("id").as("vec_id"), col("codes"), col("recon_err"))
      },
      Some("""WITH s AS (SELECT unnest(range(8)) AS sub),
             |seeds AS (
             |  SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS cell
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
             |cb AS (
             |  SELECT s.sub, seeds.cell,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS cent
             |  FROM seeds CROSS JOIN s),
             |v AS (
             |  SELECT vec_id, s.sub,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS sv
             |  FROM embeddings CROSS JOIN s),
             |d AS (
             |  SELECT v.vec_id, v.sub, cb.cell,
             |    round(list_sum(list_transform(range(1, 9),
             |      i -> (sv[i]-cent[i])*(sv[i]-cent[i]))), 6) AS dist
             |  FROM v JOIN cb USING (sub)),
             |r AS (
             |  SELECT vec_id, sub, cell, dist, row_number() OVER (
             |    PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
             |  FROM d)
             |SELECT vec_id,
             |  string_agg(CAST(cell AS VARCHAR), ',' ORDER BY sub) AS codes,
             |  CAST(sum(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS recon_err
             |FROM r WHERE rn = 1 GROUP BY vec_id""".stripMargin)),

    // per-source embedding centroids: elementwise mean vector per domain
    // (the domain-centroid step behind SemDeDup cell seeding and per-
    // source drift monitoring). Output as (source, dim, c) ROWS — no
    // array/string rendering to diverge across engines; one skinny
    // (source, dim) shuffle, map-side partials
    "l58_domain_centroids" -> Q(
      (s, dir) => {
        val j = td(s, dir, "embeddings")
          .join(td(s, dir, "documents").select(col("doc_id"), col("source")),
            col("vec_id") === col("doc_id"))
        // per-element round→DECIMAL before the sum: a raw-double avg is
        // accumulation-order-dependent (Spark partial-merge order is
        // nondeterministic), which can flip the 6-dp round between runs
        // let alone engines; decimal sums are exact and order-free
        j.select(col("source"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("source", "dim")
          .agg(round(
              sum(round(col("v").cast("double"), 9)
                .cast(org.apache.spark.sql.types.DecimalType(20, 9)))
                .cast("double") / count(lit(1)), 6).as("c"),
            count(lit(1)).as("n_docs"))
          .select(col("source"), col("dim").cast("long").as("dim"),
            col("c"), col("n_docs"))
      },
      Some("""WITH j AS (
             |  SELECT d.source, e.embedding
             |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
             |x AS (
             |  SELECT source, unnest(embedding) AS v,
             |    unnest(range(len(embedding))) AS dim
             |  FROM j)
             |SELECT source, CAST(dim AS BIGINT) AS dim,
             |  round(CAST(sum(CAST(round(CAST(v AS DOUBLE), 9) AS DECIMAL(20,9))) AS DOUBLE)
             |    / count(*), 6) AS c,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM x GROUP BY 1, 2""".stripMargin)),

    // PQ-ADC retrieval: the query side of product quantization — score
    // compressed codes against the first vector via per-subspace lookup
    // tables, never decompressing the corpus. Query + codebook + tables
    // all derive from the data, so the oracle replays the ranking exactly
    "l53_pq_adc_topk" -> Q(
      (s, dir) => {
        val e = tdw(s, dir, "embeddings")
        val cbs = graft.llm.Pq.seedCodebooks(e, "embedding", "vec_id", m = 8, k = 16)
        val query = graft.llm.Ann.firstKCentroids(e, "embedding", "vec_id", 1).head
        graft.llm.Pq.adcTopK(e, "embedding", "vec_id", cbs, query, k = 25)
          .select(col("id").as("vec_id"), col("adc_score"))
      },
      Some("""WITH s AS (SELECT unnest(range(8)) AS sub),
             |seeds AS (
             |  SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS cell
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
             |cb AS (
             |  SELECT s.sub, seeds.cell,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS cent
             |  FROM seeds CROSS JOIN s),
             |qv AS (SELECT embedding AS q FROM embeddings ORDER BY vec_id LIMIT 1),
             |qt AS (
             |  SELECT cb.sub, cb.cell,
             |    CAST(round(list_sum(list_transform(range(1, 9),
             |      i -> (CAST(q[cb.sub*8+i] AS DOUBLE)-cent[i])
             |         * (CAST(q[cb.sub*8+i] AS DOUBLE)-cent[i]))), 6)
             |      AS DECIMAL(18,6)) AS qd
             |  FROM cb CROSS JOIN qv),
             |v AS (
             |  SELECT vec_id, s.sub,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS sv
             |  FROM embeddings CROSS JOIN s),
             |d AS (
             |  SELECT v.vec_id, v.sub, cb.cell,
             |    round(list_sum(list_transform(range(1, 9),
             |      i -> (sv[i]-cent[i])*(sv[i]-cent[i]))), 6) AS dist
             |  FROM v JOIN cb USING (sub)),
             |r AS (
             |  SELECT vec_id, sub, cell, row_number() OVER (
             |    PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
             |  FROM d)
             |SELECT vec_id, CAST(sum(qt.qd) AS DOUBLE) AS adc_score
             |FROM r JOIN qt ON r.sub = qt.sub AND r.cell = qt.cell
             |WHERE r.rn = 1 GROUP BY vec_id
             |ORDER BY adc_score, vec_id LIMIT 25""".stripMargin)),

    // composed IVF-PQ retrieval (FAISS IndexIVFPQ, by_residual=false):
    // coarse cells prune the corpus to nProbe/nCells, then PQ-ADC lookup
    // tables rank what survives — the billion-vector serving shape with
    // every stage (cells, probes, codes, tables) derived from the data,
    // so the oracle replays the full pipeline. Zero shuffles: cell
    // choice + ADC are expressions, the top-k is TakeOrderedAndProject
    "l66_ivfpq_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val cells = Ann.firstKCentroids(e, "embedding", "vec_id", 16)
        val cbs = graft.llm.Pq.seedCodebooks(e, "embedding", "vec_id", m = 8, k = 16)
        val query = Ann.firstKCentroids(e, "embedding", "vec_id", 1).head
        graft.llm.Pq.ivfAdcTopK(e, "embedding", "vec_id", cells, cbs,
            query, nProbe = 4, k = 25)
          .select(col("id").as("vec_id"), col("cell"), col("adc_score"))
      },
      Some(AnnOracles.ivfAdcTopKSql(nCells = 16, nProbe = 4, m = 8,
        kCodes = 16, dim = 64, topK = 25))),

    // kNN label propagation: seed labels (every 5th doc's lang) spread to
    // unlabeled docs by sim-weighted vote over the SAME multi-table LSH
    // neighbor graph as l37 — the semi-supervised corpus-annotation step
    // (label a small trusted set, a kNN vote labels the rest). Weights
    // sum 6-dp sims as DECIMAL (exact, order-free); ties break to the
    // lexicographically smallest label on both engines
    "l67_knn_label_prop" -> Q(
      (s, dir) => {
        val labels = td(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("id"), col("lang").as("label"))
        graft.llm.LabelProp.knnLabelVote(td(s, dir, "embeddings"),
            "embedding", "vec_id", labels, dim = 64, k = 3,
            nPlanes = 8, nTables = 4)
          .select(col("id").as("vec_id"), col("pred_label"),
            col("weight"), col("n_votes"))
      },
      Some(AnnOracles.knnLabelPropSql(nPlanes = 8, dim = 64, k = 3,
        cap = 2000, nTables = 4, seedMod = 5))),

    // retrieval-quality evaluation as a query: per-query recall@5 +
    // reciprocal rank of the l10 LSH index vs the exact multi-query
    // brute-force baseline (bruteForceTopKJoin: corpus scanned once,
    // queries broadcast on a non-foldable constant key — BHJ, never
    // BNLJ). The CI recall gates SAMPLE; this measures the full corpus
    // on every build and is itself oracled
    "l68_retrieval_metrics" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 16)
        val truth = Ann.bruteForceTopKJoin(e, queries, "embedding", "vec_id", k = 5)
        val results = Ann.lshTopK(e, queries, "embedding", "vec_id",
          dim = 64, k = 5, nPlanes = 6, nTables = 8)
        graft.llm.RetrievalEval.retrievalMetrics(truth, results, k = 5)
      },
      Some(AnnOracles.retrievalMetricsSql(nPlanes = 6, dim = 64,
        nQueries = 16, k = 5, nTables = 8))),

    // hard-negative mining for contrastive training, CANDIDATE-PATH form
    // (registered since round 10 — the exact broadcast form's work is
    // |Q|·|corpus|, quadratic when queries are a fixed corpus fraction:
    // the one >15× sf0.1→sf1 mover left after the l84 swap): per query
    // (every 100th vector), the 5 most-similar DIFFERENT-label vectors
    // among multi-table LSH candidates with 1-bit-flip probes — the ANN
    // index mining contrastive pipelines actually run. The exact form
    // stays as Ann.hardNegatives, cross-checked in AnnSpec
    "l73_hard_negatives" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        Ann.hardNegativesLsh(e, e.filter(col("vec_id") % 100 === 0),
          "embedding", "vec_id", "label", k = 5, dim = 64,
          nPlanes = 10, nTables = 8)
      },
      Some(AnnOracles.hardNegativesLshSql(nPlanes = 10, dim = 64, k = 5,
        nTables = 8, queryMod = 100))),

    // margin-based bitext mining (Artetxe & Schwenk), CANDIDATE-PATH form
    // (the benched headline since round 10 — the r9 verdict's task 3: the
    // registered exact cross-pair form enumerated |A|·|B| pairs, 206 s =
    // quadratic OUTPUT at sf1; the paper itself scores FAISS-retrieved
    // k-NN lists, never all pairs): mutual top-1 + margin over multi-table
    // LSH candidates (the l10/l11 plane family), margin = sim / mean(top-4
    // retrieved sims of both endpoints). The exact form lives on as
    // Ann.marginBitextMine, cross-checked on planted alignments vs this
    // path in AnnSpec; DECIMAL-exact top-k means replay bit-identically
    "l84_bitext_margin" -> Q(
      (s, dir) => Ann.marginBitextMineLsh(td(s, dir, "embeddings"),
        "embedding", "vec_id", col("label") % 2, k = 4, minMargin = 1.0,
        nPlanes = 9, nTables = 8, maxBucketSize = 2000),
      Some(AnnOracles.marginBitextLshSql(nPlanes = 9, dim = 64, k = 4,
        cap = 2000, nTables = 8, minMargin = 1.0))),

    // Matryoshka truncation eval (Kusupati et al. 2022): overlap@5 of
    // truncated-dim cosine rankings vs the full 64-dim ranking, per
    // candidate serving dimension — the dim-vs-recall table that decides
    // how much of each stored vector retrieval actually reads. Exact
    // integer hits; 6-dp-rounded rank keys (the l9 rule) on both engines
    "l103_matryoshka_eval" -> Q(
      (s, dir) => Ann.matryoshkaEval(td(s, dir, "embeddings"),
        "embedding", "vec_id", dims = Seq(64, 32, 16, 8), k = 5, nQueries = 16),
      Some {
        def top(name: String, vq: String, vc: String) =
          s"""$name AS (SELECT query_id, corpus_id FROM (
             |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY round(list_dot_product($vc, $vq)
             |          / (sqrt(list_dot_product($vq, $vq)) * sqrt(list_dot_product($vc, $vc))), 6) DESC,
             |          c.vec_id) AS rk
             |    FROM ec c CROSS JOIN eq q WHERE c.vec_id <> q.vec_id) WHERE rk <= 5)""".stripMargin
        val dims = Seq(64, 32, 16, 8)
        val dimCtes = dims.map(d => top(s"t$d", s"q.v[1:$d]", s"c.v[1:$d]"))
        val hits = dims.map(d =>
          s"""SELECT CAST($d AS BIGINT) AS dim, CAST(16 AS BIGINT) AS n_queries,
             |  CAST(count(*) AS BIGINT) AS sum_hits,
             |  CAST((count(*) * 1000000) // 80 AS BIGINT) AS mean_recall_micro
             |FROM t$d JOIN truth USING (query_id, corpus_id)""".stripMargin)
        s"""WITH eq AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 16),
           |ec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |${top("truth", "q.v", "c.v")},
           |${dimCtes.mkString(",\n")}
           |${hits.mkString("\nUNION ALL\n")}""".stripMargin
      }),

    // MIPS top-k via norm augmentation (Ann.mipsTopK — Bachrach 2014 /
    // Neyshabur-Srebro 2015): x̂=[x;√(M²−‖x‖²)], q̂=[q;0] reduces
    // max-inner-product to cosine so the whole ANN stack serves it.
    // Rank key = 6-dp-rounded raw inner product (identical to ⟨q̂,x̂⟩ —
    // the appended term multiplies the query's 0); aug_cosine replayed
    // by the oracle from the same augmented lists
    "l108_mips_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        Ann.mipsTopK(e, "embedding", "vec_id", q, k = 10, excludeId = Some(0L))
      },
      Some("""WITH q AS (SELECT list_append(embedding::DOUBLE[], 0.0) AS qa
             |  FROM embeddings WHERE vec_id = 0),
             |m AS (SELECT max(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS m2
             |  FROM embeddings WHERE vec_id <> 0),
             |a AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
             |    list_append(e.embedding::DOUBLE[],
             |      sqrt(greatest(0.0, m.m2
             |        - list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))) AS va
             |  FROM embeddings e, m WHERE e.vec_id <> 0),
             |s AS (SELECT a.vec_id,
             |    round(list_dot_product(a.va, q.qa), 6) AS inner_product,
             |    round(list_dot_product(a.va, q.qa)
             |      / (sqrt(list_dot_product(a.va, a.va))
             |         * sqrt(list_dot_product(q.qa, q.qa))), 6) AS aug_cosine
             |  FROM a, q)
             |SELECT vec_id, inner_product, aug_cosine FROM s
             |ORDER BY inner_product DESC, vec_id LIMIT 10""".stripMargin),
      eager = true),
  )
}
