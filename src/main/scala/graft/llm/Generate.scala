package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Greedy bigram-LM text generation — the deterministic core of a
 * synthetic-data / distillation pipeline: train a next-token table from
 * the corpus, then roll out greedy argmax continuations from seed
 * prompts. Real pipelines sample with temperature from a neural model;
 * the argmax bigram form is the part an ENGINE owns (count aggregation,
 * successor argmax, bounded rollout) and is exactly DuckDB-replayable,
 * so the whole generation — table, seeds, every rollout step — carries
 * an external oracle.
 *
 * Spec (shared with the SQL twin in the l123 registry row):
 *  1. tokens = whitespace split of `trim(lower(text))`, empty docs out;
 *  2. bigram counts over adjacent pairs, corpus-wide;
 *  3. successor(cur) = argmax count, ties to the LEXICOGRAPHICALLY
 *     SMALLEST next token (min of (−count, next));
 *  4. seeds = the `nSeeds` most frequent unigrams (count desc, token asc);
 *  5. rollout: from each seed, append successor(cur) up to `steps` times,
 *     stopping early when cur has no successor; emit (seed, gen_text,
 *     n_steps).
 *
 * Scale shape (the [[Bpe.trainFromCorpus]] precedent): the corpus-sized
 * work is ONE bigram hash-agg shuffle with map-side partials; the
 * successor table is vocab-bounded (capped at `maxVocab` rows by
 * (count desc, cur asc) — deterministic cut) and the rollout is a pure
 * fold over that bounded table, never a per-step distributed job.
 */
object Generate {

  /** Deterministic greedy rollouts. Runs two bounded collects at CALL
    * time (successor table + seeds) — register as `eager`. */
  def greedyGenerate(spark: SparkSession, df: DataFrame, textCol: String,
                     nSeeds: Int, steps: Int,
                     maxVocab: Int = 65536): DataFrame = {
    require(nSeeds >= 1 && steps >= 1)
    val toks = df
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(split(trim(lower(col(textCol))), "\\s+").as("t"))

    // corpus-sized part: one (cur, nxt) hash-agg
    val bigrams = toks.filter(size(col("t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("p"))
      .select(col("p.0").as("cur"), col("p.1").as("nxt"))
      .groupBy("cur", "nxt").agg(count(lit(1)).cast("long").as("c"))

    // successor argmax: min(struct(-c, nxt)) = (count desc, next asc)
    val succRows = bigrams
      .groupBy("cur")
      .agg(min(struct((-col("c")).as("negc"), col("nxt"))).as("best"),
        sum("c").cast("long").as("tot"))
      .select(col("cur"), col("best.nxt").as("nxt"), col("tot"))
      .orderBy(col("tot").desc, col("cur").asc)
      .limit(maxVocab)
      .collect()
    val succ = succRows.map(r => r.getString(0) -> r.getString(1)).toMap

    val seeds = toks
      .select(explode(col("t")).as("tok")).filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).cast("long").as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(nSeeds)
      .collect().map(_.getString(0)).toSeq

    val rows = seeds.map { seed =>
      var cur = seed
      val sb = new StringBuilder(seed)
      var n = 0L
      var continue = true
      while (continue && n < steps) {
        succ.get(cur) match {
          case Some(nxt) => sb.append(' ').append(nxt); cur = nxt; n += 1
          case None => continue = false
        }
      }
      (seed, sb.toString, n)
    }
    import spark.implicits._
    rows.toDF("seed", "gen_text", "n_steps")
  }
}
