package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.TextOps
import Registry.{td, tdw, tdEventsUs}

/**
 * Post-training data-prep registry rows (split from TextEvalQueries,
 * round 11 — pure mechanical move, registry content unchanged): dialog
 * assembly (SFT transcripts), preference pairs (DPO), GRPO group-relative
 * advantage, T5 span corruption, curriculum schedule, and deterministic
 * weighted sampling.
 */
object PostTrainQueries {

  val all: Seq[(String, Q)] = Seq(
    // conversation/transcript assembly: the events stream becomes one
    // ordered multi-turn SFT document per user — group → in-group
    // struct-sort on (ts, event_id) → render; ONE shuffle on the
    // conversation key, no global sort, no window
    "l80_dialog_assembly" -> Q(
      (s, dir) => graft.llm.Dialog.assembleTranscripts(
        tdEventsUs(s, dir), "user_id", "ts_us", "event_id", "event_type", "props"),
      Some("""WITH t AS (SELECT user_id, ts, event_id,
             |    event_type || '=' || coalesce(json_extract_string(props, '$.k'), '?') AS line
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_turns,
             |  CAST(length(string_agg(line, chr(10) ORDER BY ts, event_id)) AS BIGINT) AS n_chars,
             |  string_agg(line, chr(10) ORDER BY ts, event_id) AS transcript
             |FROM t GROUP BY 1""".stripMargin)),

    // RLHF/DPO preference-pair construction: best-vs-worst scored
    // candidate per prompt, deterministic (score, id) struct-max/min
    // tiebreak, minimum-gap filter — ONE hash-aggregate on the prompt key
    // (llm/Preference.scala). Fixture: docs pooled into 100 prompts,
    // char-length as the integral score.
    "l85_preference_pairs" -> Q(
      (s, dir) => {
        val cands = td(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select((col("doc_id") % 100).as("prompt_id"),
            col("doc_id").as("cid"),
            length(col("text")).cast("long").as("score"))
        graft.llm.Preference.buildPairs(
          cands, "prompt_id", "cid", "score", minGap = 10)
      },
      Some("""WITH c AS (SELECT doc_id % 100 AS prompt_id, doc_id AS cid,
             |    CAST(length(text) AS BIGINT) AS score
             |  FROM documents WHERE text IS NOT NULL),
             |r AS (SELECT prompt_id, cid, score,
             |    row_number() OVER (PARTITION BY prompt_id
             |                       ORDER BY score DESC, cid DESC) AS rb,
             |    row_number() OVER (PARTITION BY prompt_id
             |                       ORDER BY score ASC, cid ASC) AS rw,
             |    CAST(count(*) OVER (PARTITION BY prompt_id) AS BIGINT) AS n
             |  FROM c)
             |SELECT prompt_id,
             |  max(CASE WHEN rb = 1 THEN cid END) AS chosen_id,
             |  max(CASE WHEN rw = 1 THEN cid END) AS rejected_id,
             |  max(CASE WHEN rb = 1 THEN score END) AS chosen_score,
             |  max(CASE WHEN rw = 1 THEN score END) AS rejected_score,
             |  max(CASE WHEN rb = 1 THEN score END)
             |    - max(CASE WHEN rw = 1 THEN score END) AS gap,
             |  max(n) AS n_candidates
             |FROM r GROUP BY 1
             |HAVING max(n) >= 2
             |  AND max(CASE WHEN rb = 1 THEN score END)
             |    - max(CASE WHEN rw = 1 THEN score END) >= 10""".stripMargin)),

    // l120 — GRPO group-relative advantage (Shao et al. 2024): per
    // CANDIDATE, reward − group mean in exact integer micro-units, gap to
    // the group best, best-of-n chosen flag ((score,cid) struct-max
    // tie-break, as l85) — the rejection-sampling/GRPO data-prep table
    // where l85 keeps only the two extremes. One explicitly-repartitioned
    // prompt-key exchange feeds both the group aggregate and the join
    // probe; no window sort. Same fixture as l85.
    "l120_grpo_advantage" -> Q(
      (s, dir) => graft.llm.Preference.groupAdvantage(
        td(s, dir, "documents").filter(col("text").isNotNull)
          .select((col("doc_id") % 100).as("prompt_id"),
            col("doc_id").as("cid"),
            length(col("text")).cast("long").as("score")),
        "prompt_id", "cid", "score"),
      Some("""WITH c AS (SELECT doc_id % 100 AS prompt_id, doc_id AS cid,
             |    CAST(length(text) AS BIGINT) AS score
             |  FROM documents WHERE text IS NOT NULL),
             |g AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_candidates,
             |    CAST(sum(score) AS BIGINT) AS total,
             |    CAST(max(score) AS BIGINT) AS best_score
             |  FROM c GROUP BY 1),
             |b AS (SELECT c.prompt_id, CAST(max(c.cid) AS BIGINT) AS best_cid
             |  FROM c JOIN g USING (prompt_id)
             |  WHERE c.score = g.best_score GROUP BY 1)
             |SELECT c.prompt_id, c.cid, c.score, g.n_candidates,
             |  CAST(c.score * 1000000 - (g.total * 1000000) // g.n_candidates AS BIGINT) AS adv_micro,
             |  CAST(g.best_score - c.score AS BIGINT) AS gap_to_best,
             |  (c.score = g.best_score AND c.cid = b.best_cid) AS is_chosen
             |FROM c JOIN g USING (prompt_id) JOIN b USING (prompt_id)""".stripMargin)),

    // T5-style span corruption: deterministic iid token masks collapsed
    // into sentinel-numbered spans, (input, target) emitted per doc —
    // the seq2seq denoising objective; one posexplode + ONE exchange
    // (lag/running-sum windows and the rebuild groupBy share the doc key)
    "l88_span_corruption" -> Q(
      (s, dir) => graft.llm.TextOps.spanCorrupt(
        td(s, dir, "documents"), "doc_id", "text", maskPct = 15, seed = "sc1"),
      Some(TextOracles.spanCorruptSql(maskPct = 15, seed = "sc1"))),

    // curriculum training schedule: quality-threshold phases (cleanest
    // first), hash shards + dense positions within each phase — the
    // epoch-shuffle shape with a curriculum axis; thresholds not
    // quantiles, so no global sort and phase meanings stay consistent
    // across separately-curated corpora
    "l90_curriculum_schedule" -> Q(
      (s, dir) => graft.llm.Sampling.curriculumSchedule(
        td(s, dir, "documents")
          .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q")),
        "doc_id", "q", thresholds = Seq(0.5, 0.25), nShards = 8, seed = "cu1"),
      Some(TextOracles.curriculumSql(Seq(0.5, 0.25), nShards = 8, seed = "cu1"))),


    // l123 — greedy bigram-LM generation (the deterministic core of a
    // synthetic-data / distillation rollout; graft/llm/Generate.scala):
    // corpus bigram table -> successor argmax (ties to smallest next) ->
    // bounded greedy rollouts from the 5 most frequent seeds. The ONLY
    // corpus-sized work is one bigram hash-agg; the successor table is
    // vocab-bounded and the rollout is a driver-side fold (the BPE-trainer
    // shape). Oracle replays table, seeds, and every rollout step in one
    // recursive CTE. eager: collects the bounded table at build time
    "l123_ngram_generate" -> Q(
      (s, dir) => graft.llm.Generate.greedyGenerate(
        s, td(s, dir, "documents"), "text", nSeeds = 5, steps = 12),
      Some("""WITH RECURSIVE
             |tk AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
             |bg AS (SELECT p[1] AS cur, p[2] AS nxt FROM (
             |  SELECT unnest(list_transform(range(1, len(t)), i -> [t[i], t[i+1]])) AS p
             |  FROM tk WHERE len(t) >= 2)),
             |bc AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
             |sc AS (SELECT cur, nxt FROM (SELECT cur, nxt,
             |    row_number() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS rn FROM bc)
             |  WHERE rn = 1),
             |un AS (SELECT unnest(t) AS tok FROM tk),
             |sd AS (SELECT tok FROM (SELECT tok, CAST(count(*) AS BIGINT) AS c
             |    FROM un WHERE length(tok) > 0 GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 5),
             |gen(seed, step, cur, txt) AS (
             |  SELECT tok, CAST(0 AS BIGINT), tok, tok FROM sd
             |  UNION ALL
             |  SELECT g.seed, g.step + 1, s.nxt, g.txt || ' ' || s.nxt
             |  FROM gen g JOIN sc s ON s.cur = g.cur WHERE g.step < 12)
             |SELECT seed, arg_max(txt, step) AS gen_text,
             |  CAST(max(step) AS BIGINT) AS n_steps
             |FROM gen GROUP BY 1""".stripMargin), eager = true),

    // l106 — weighted sampling without replacement (Ohlsson 1998
    // sequential Poisson order sampling, the exact-integer sibling of
    // Efraimidis-Spirakis A-ES — that ln(u)/w form stays spec-replayed
    // in SamplingSpec): k smallest of priority = (hash60+1) div w,
    // inclusion odds ∝ n_chars. All-int64 hash/div so order, tie-break
    // and cut replay bit-for-bit across engines (no libm ln in the
    // compare — the l104 round-9 lesson). Expression-only +
    // TakeOrderedAndProject
    "l106_weighted_sample" -> Q(
      (s, dir) => graft.llm.Sampling.weightedSamplePriority(
        td(s, dir, "documents"), "doc_id", "n_chars", k = 100, seed = "ws"),
      Some("""WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             |    ('0x'||substr(md5('ws' || chr(31) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT + 1 AS u_int
             |  FROM documents WHERE n_chars > 0)
             |SELECT doc_id, n_chars, u_int // n_chars AS priority
             |FROM t ORDER BY priority, doc_id LIMIT 100""".stripMargin)),

    // l126 — Bradley-Terry preference aggregation (Bradley & Terry 1952,
    // Hunter 2004 MM): pairwise "which response won" counts → per-item
    // strength weights, the RLHF reward-data primitive. Fixture: for
    // each user, the event type whose FIRST event is earlier beats the
    // later one (deterministic; ties dropped) — a preference stream over
    // 5 "policies". One corpus agg to the count matrix; the exact
    // integer MM recurrence runs driver-side over the bounded item
    // table (the l125 DoReMi shape); the oracle unrolls the rounds as
    // chained CTEs in HUGEINT floor arithmetic
    "l126_bradley_terry" -> Q(
      (s, dir) => {
        val ft = tdEventsUs(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(col("ts_us")).as("t0"))
        val a = ft.select(col("user_id").as("ua"), col("event_type").as("i"),
          col("t0").as("ta"))
        val b = ft.select(col("user_id").as("ub"), col("event_type").as("j"),
          col("t0").as("tb"))
        val prefs = a.join(b, col("ua") === col("ub") && col("i") < col("j"))
          .filter(col("ta") =!= col("tb"))
          .select(
            when(col("ta") < col("tb"), col("i")).otherwise(col("j")).as("winner"),
            when(col("ta") < col("tb"), col("j")).otherwise(col("i")).as("loser"))
          .groupBy("winner", "loser").agg(count(lit(1)).as("n"))
        graft.llm.PreferenceRank.bradleyTerry(prefs, "winner", "loser", "n",
          rounds = 6)
      },
      Some(PostTrainOracles.bradleyTerrySql(rounds = 6)),
      eager = true),

    // l131 — pairwise Cohen's kappa (Cohen 1960): inter-annotator
    // agreement over a (item, annotator, label) table, the labeling-QC
    // gate before any preference data is trusted. Fixture: events
    // become labels (item = event_id % 500, annotator = user_id % 5,
    // label = event_type, keep-first by (ts, event_id)). One item-keyed
    // equi-join reduced to the joint confusion matrix; everything
    // downstream is (pairs × classes²)-sized
    "l131_annotator_agreement" -> Q(
      (s, dir) => {
        graft.llm.Annotation.cohenKappaPairs(
          annotationFixture(s, dir), "item", "annot", "label")
      },
      Some(PostTrainOracles.annotatorAgreementSql(nItems = 500,
        nAnnotators = 5))),

    // l132 — majority-vote label resolution with deterministic
    // ties-to-largest-label policy, confidence basis points, and
    // tied/unanimous audit flags (the "send back for another label"
    // queue). Same keep-first label fixture; one corpus hash-agg +
    // one window over the per-item vote rows
    "l132_label_resolution" -> Q(
      (s, dir) => {
        graft.llm.Annotation.resolveLabels(
          annotationFixture(s, dir), "item", "annot", "label")
      },
      Some(PostTrainOracles.labelResolutionSql(nItems = 500,
        nAnnotators = 5))),

    // l133 — preference length-bias audit: win rate of the strictly
    // longer response + mean signed gap, per length-ratio decile and
    // overall (bucket -1) — the reward-hacking early warning on every
    // RLHF data card. Fixture pairs: best-vs-worst per 100 prompts
    // scored by DISTINCT-WORD count, so length correlates with but
    // does not determine preference. One rollup pass over the pairs
    "l133_length_bias" -> Q(
      (s, dir) => {
        val c = td(s, dir, "documents").filter(col("text").isNotNull)
          .select((col("doc_id") % 100).as("prompt_id"),
            col("doc_id").as("cid"),
            size(array_distinct(split(col("text"), " "))).cast("long")
              .as("score"),
            length(col("text")).cast("long").as("len"))
        val pairs = c.groupBy("prompt_id")
          .agg(max(struct(col("score"), col("cid"), col("len"))).as("_b"),
            min(struct(col("score"), col("cid"), col("len"))).as("_w"))
          .select(col("_b.len").as("chosen_len"),
            col("_w.len").as("rejected_len"))
        graft.llm.Annotation.lengthBiasAudit(pairs, "chosen_len",
          "rejected_len")
      },
      Some(PostTrainOracles.lengthBiasSql(nPrompts = 100))),

  )

  /** Keep-first (item, annotator, label) fixture shared by l131/l132:
    * struct-min on (ts_us, event_id) is deterministic because event_id
    * is unique — replayed in the oracle as a row_number() = 1 window. */
  private def annotationFixture(s: org.apache.spark.sql.SparkSession,
                                dir: String) =
    tdEventsUs(s, dir)
      .groupBy((col("event_id") % 500).as("item"),
        (col("user_id") % 5).as("annot"))
      .agg(min(struct(col("ts_us"), col("event_id"), col("event_type")))
        .as("_f"))
      .select(col("item"), col("annot"), col("_f.event_type").as("label"))
}
