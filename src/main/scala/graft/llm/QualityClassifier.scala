package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructField, StructType}

/**
 * Trainable document-quality classifier: logistic regression over hashed
 * bag-of-words features (the fastText-style linear text classifier, Joulin
 * et al. 2016, "Bag of Tricks for Efficient Text Classification" — public),
 * built from scratch like the BPE tokenizer ([[Bpe]]): a deterministic
 * seed-corpus model frozen at load time for the oracle-checked registry
 * row, plus a DISTRIBUTED Spark trainer for real corpora.
 *
 * Reference anchor: the reference pipelines gate rows with hand-written
 * config-driven filters (e.g. GDC-Metadata-Processing scripts filter on
 * column predicates); a learned quality gate is the LLM-pipeline
 * generalization of the same keep/drop decision.
 *
 * Design for cross-engine exactness (the driver hash-compares against
 * DuckDB):
 *  - tokens: `lower` → split on whitespace runs → drop empties (the same
 *    tokenizer as [[Index]] / its oracles);
 *  - feature hash: [[SimHashPortable60.hash60]] mod `nBuckets` — replayable
 *    in DuckDB as `('0x'||substr(md5(tok),1,15))::BIGINT % n`;
 *  - scoring stays in exact DECIMAL: weights are FROZEN AT 6 dp, a doc's
 *    score_sum is an exact decimal sum of per-token weights, and the keep
 *    decision is `score_sum + n_tokens·bias > 0` — the sign of the logit
 *    `z = bias + (Σ w)/n` scaled by n, with no division and NO `exp` (libm
 *    `exp` is not bit-identical across engines; the sigmoid is monotone in
 *    z so the decision is unchanged). [[sigmoid]] is provided for users
 *    who want the probability; it is deliberately not oracle-compared.
 *
 * Scale shape of [[score]]: one explode over tokens, one broadcast join
 * against the O(nBuckets) weight table, one hash aggregation per doc —
 * the same single-shuffle profile as token counting. The trainer runs ONE
 * distributed job per epoch (gradients for all buckets AND the bias come
 * back in a single O(nBuckets)-row collect — the bias rides as a synthetic
 * always-on feature at bucket `nBuckets`).
 */
object QualityClassifier {

  /** Weights at 6 dp (bucket → weight) + bias at 6 dp. Only non-zero
    * buckets are stored; unseen buckets score 0 exactly. */
  final case class Model(weights: Map[Int, java.math.BigDecimal],
                         bias: java.math.BigDecimal, nBuckets: Int)

  /** Pure-Scala tokenizer matching the Spark pipeline
    * `split(lower(text), "\\s+")` + drop-empties exactly: empties only
    * arise from leading whitespace or an empty string, and both sides drop
    * them, so trim placement is irrelevant. Locale.ROOT lowering matches
    * Spark's `lower` on ASCII (the seed corpus is ASCII by construction);
    * for non-ASCII corpora note Spark's `lower` delegates to
    * DEFAULT-locale `String.toLowerCase` off the ASCII fast path — a
    * Turkish-locale JVM would lower 'I' differently than this ROOT-locale
    * trainer, silently shifting hashed buckets between train and score.
    * Train and score on the same JVM locale (or pre-fold text) if the
    * corpus leaves ASCII. */
  private[llm] def tokenize(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq.filter(_.nonEmpty)

  private[llm] def bucketOf(token: String, nBuckets: Int): Int =
    (SimHashPortable60.hash60(token.getBytes("UTF-8")) % nBuckets).toInt

  private[llm] def sigmoidD(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /**
   * Local full-batch gradient-descent trainer (the reference
   * implementation the distributed trainer is parity-tested against, and
   * the trainer of the frozen [[DefaultModel]]). Features are RELATIVE
   * token frequencies per hashed bucket (length-invariant); gradient sums
   * run in sorted-bucket order so the result is bit-deterministic.
   */
  def trainLocal(docs: Seq[(String, Int)], nBuckets: Int = 256,
                 epochs: Int = 300, lr: Double = 1.0): Model = {
    require(docs.nonEmpty && nBuckets > 0)
    val feats: Seq[(Seq[(Int, Double)], Int)] = docs.map { case (t, y) =>
      val toks = tokenize(t)
      require(toks.nonEmpty, "seed docs must have at least one token")
      val n = toks.size.toDouble
      val x = toks.groupBy(bucketOf(_, nBuckets)).toSeq.sortBy(_._1)
        .map { case (b, g) => (b, g.size / n) }
      (x, y)
    }
    val w = new Array[Double](nBuckets)
    var b = 0.0
    val nDocs = feats.size.toDouble
    var e = 0
    while (e < epochs) {
      val gw = new Array[Double](nBuckets)
      var gb = 0.0
      feats.foreach { case (x, y) =>
        var z = b
        x.foreach { case (k, v) => z += w(k) * v }
        val r = sigmoidD(z) - y
        x.foreach { case (k, v) => gw(k) += r * v }
        gb += r
      }
      var k = 0
      while (k < nBuckets) { w(k) -= lr * gw(k) / nDocs; k += 1 }
      b -= lr * gb / nDocs
      e += 1
    }
    def d6(v: Double) = new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    Model(
      w.zipWithIndex.collect { case (v, i) if math.abs(v) >= 5e-7 => i -> d6(v) }.toMap,
      d6(b), nBuckets)
  }

  /**
   * Distributed trainer: identical math to [[trainLocal]] at corpus scale.
   * The (doc, bucket, rel-freq) feature frame is materialized ONCE
   * (localCheckpoint — the loop must not replay tokenize+hash per epoch);
   * each epoch is one job: per-doc logits via the weight literal, residuals,
   * then bucket-grouped gradients collected as O(nBuckets) rows. The bias
   * is a synthetic always-on feature at bucket `nBuckets` (x=1), so its
   * gradient arrives in the same collect. The O(nBuckets) weight literal
   * caps practical nBuckets at a few thousand — beyond that, swap the
   * literal for a broadcast-table join exactly as [[graft.llm.Ann]] does
   * for centroids past `ivfLiteralFoldMaxK`.
   */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
            nBuckets: Int = 256, epochs: Int = 50, lr: Double = 1.0): Model = {
    val hashCol: Column => Column = { c =>
      import org.apache.spark.sql.GraftExpressionBridge._
      column(PortableHash60Expr(expression(c)))
    }
    val toks = df.select(col(idCol).as("_id"), col(labelCol).cast("double").as("_y"),
        explode(split(lower(col(textCol)), "\\s+")).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .withColumn("_bucket", (hashCol(col("_tok")) % nBuckets).cast("int"))
      .groupBy("_id", "_y", "_bucket").agg(count(lit(1)).cast("double").as("_c"))
    val withN = toks
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col("_id"))))
      .select(col("_id"), col("_y"), col("_bucket"), (col("_c") / col("_n")).as("_x"))
    val feats = withN
      .unionByName(df.select(col(idCol).as("_id"), col(labelCol).cast("double").as("_y"),
        lit(nBuckets).as("_bucket"), lit(1.0).as("_x")))
      .localCheckpoint()
    val nDocs = df.count().toDouble
    val w = new Array[Double](nBuckets + 1) // w(nBuckets) = bias
    var e = 0
    while (e < epochs) {
      val wlit = array(w.map(lit(_)): _*)
      val perDoc = feats
        .withColumn("_wx", element_at(wlit, col("_bucket") + 1) * col("_x"))
        .groupBy("_id", "_y").agg(sum(col("_wx")).as("_z"))
        .select(col("_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("_z"))) - col("_y")).as("_r"))
      val grads = feats.join(perDoc, "_id")
        .groupBy("_bucket").agg(sum(col("_r") * col("_x")).as("_g"))
        .collect()
      grads.foreach { row =>
        val k = row.getInt(0)
        w(k) -= lr * row.getDouble(1) / nDocs
      }
      e += 1
    }
    def d6(v: Double) = new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    Model(
      w.take(nBuckets).zipWithIndex
        .collect { case (v, i) if math.abs(v) >= 5e-7 => i -> d6(v) }.toMap,
      d6(w(nBuckets)), nBuckets)
  }

  /**
   * Score a corpus under a frozen model. Output, per doc with ≥1 token
   * (exact-DECIMAL columns — see object doc for why no sigmoid here):
   * (id, n_tokens, score_sum = Σ w[bucket(tok)] as DOUBLE,
   *  keep = score_sum + n_tokens·(bias − minLogit) > 0) — i.e. keep docs
   * whose logit exceeds `minLogit`. The default 0 is the classifier's own
   * decision boundary (p > 0.5); production gates instead CALIBRATE
   * `minLogit` on a held-out sample to hit a target keep rate, which is
   * how the registry row sets it.
   */
  def score(df: DataFrame, idCol: String, textCol: String, model: Model,
            minLogit: java.math.BigDecimal = java.math.BigDecimal.ZERO): DataFrame = {
    val spark = df.sparkSession
    val hashCol: Column => Column = { c =>
      import org.apache.spark.sql.GraftExpressionBridge._
      column(PortableHash60Expr(expression(c)))
    }
    val wRows = model.weights.toSeq.sortBy(_._1).map { case (b, wt) =>
      org.apache.spark.sql.Row(b, wt)
    }
    val wdf = spark.createDataFrame(
      spark.sparkContext.parallelize(wRows, 1),
      StructType(Seq(StructField("bucket", IntegerType, nullable = false),
        StructField("wt", DecimalType(9, 6), nullable = false))))
    val zero = lit(new java.math.BigDecimal(0)).cast(DecimalType(9, 6))
    df.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("bucket", (hashCol(col("token")) % model.nBuckets).cast("int"))
      .join(broadcast(wdf), Seq("bucket"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(coalesce(col("wt"), zero)).as("_s"))
      .select(col("id"), col("n_tokens"),
        col("_s").cast("double").as("score_sum"),
        (col("_s") + col("n_tokens") *
          lit(model.bias.subtract(minLogit)).cast(DecimalType(9, 6)) > 0)
          .as("keep"))
  }

  /**
   * Expression-only scorer — the STREAMING-safe form of [[score]]: no
   * explode, no join, no aggregation, so it runs stateless inside any
   * Structured Streaming query (and batch plans keep whole-stage codegen
   * end to end). Weights ride as an O(nBuckets) literal array of exact
   * integer MICROS (6-dp weights × 10⁶ — long-fold accumulation is exact
   * and overflow-safe at ANSI mode: |w|·10⁶ ≤ 10⁹ per token), so
   * results are bit-identical to [[score]]'s DECIMAL path; the literal
   * array caps practical nBuckets at a few thousand — beyond that use
   * [[score]]'s broadcast weight table (which needs a shuffle and is
   * therefore the batch-only shape).
   *
   * Same output columns and semantics as [[score]] except zero-token
   * docs are KEPT in the output with n_tokens 0 and keep = false
   * (0 + 0·(bias−minLogit) > 0 never holds, whatever the gate) — a
   * stream must emit a verdict per document, it cannot drop rows into a
   * later join, and an empty doc passing any quality gate would be wrong.
   */
  def scoreStreamable(df: DataFrame, idCol: String, textCol: String,
                      model: Model,
                      minLogit: java.math.BigDecimal = java.math.BigDecimal.ZERO,
                      carry: Seq[String] = Nil): DataFrame = {
    val hashCol: Column => Column = { c =>
      import org.apache.spark.sql.GraftExpressionBridge._
      column(PortableHash60Expr(expression(c)))
    }
    val micros: Seq[Long] = (0 until model.nBuckets).map(b =>
      model.weights.get(b).fold(0L)(_.movePointRight(6).longValueExact()))
    val biasAdjMicro = model.bias.subtract(minLogit)
      .movePointRight(6).longValueExact()
    val warr = array(micros.map(lit(_)): _*)
    // `carry` columns (e.g. the normalized text a downstream dedup stage
    // needs) ride the staged projections unchanged — the lshBands pattern
    val carried = carry.map(col)
    // token array staged as its own projection — referencing the
    // split+filter expression from two consumers would evaluate it twice
    val micro = aggregate(col("_tk"), lit(0L), (acc, t) =>
      acc + element_at(warr, (hashCol(t) % model.nBuckets).cast("int") + 1))
    df.select(col(idCol).as("id") +: carried :+
        filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0).as("_tk"): _*)
      .select(col("id") +: carried :+ col("_tk") :+ micro.as("_m"): _*)
      .select(col("id") +: carried :+
        size(col("_tk")).cast("long").as("n_tokens") :+
        (col("_m").cast(org.apache.spark.sql.types.DecimalType(25, 6)) /
          lit(1000000L)).cast("double").as("score_sum") :+
        (col("_m") + size(col("_tk")).cast("long") * biasAdjMicro > 0).as("keep"): _*)
  }

  /**
   * Calibration / reliability table: bin the corpus into `nBins`
   * quantiles of the classifier's mean token weight (the monotone logit
   * surrogate — no exp, engine-stable) and report, per bin, how the
   * frozen gate's keep decision agrees with an independent reference
   * label — the "is the classifier actually separating quality?" audit a
   * curation run ships next to its funnel. A well-behaved classifier
   * shows agreement rising toward both extreme bins and the keep rate
   * increasing monotonically in bin rank; a flat table means the gate is
   * noise.
   *
   * `ref` is any boolean Column over `df`'s rows (e.g. the l4 heuristic
   * at a threshold) — evaluated once, joined back by id.
   *
   * Scale note: exact global quantiles need a total order (ntile over an
   * unpartitioned window — one sort partition). That is the correct
   * EVALUATION-table trade at audit sizes; at 100 TB run it over a
   * stratified sample ([[Sampling.stratifiedSample]]) or swap the ntile
   * for approx_percentile cutoffs — the output contract is unchanged.
   *
   * Output: (bin 1..nBins ascending mean weight, n_docs, n_keep,
   * n_ref_ok, n_agree, agree_rate).
   */
  def calibrationTable(df: DataFrame, idCol: String, textCol: String,
                       model: Model, minLogit: java.math.BigDecimal,
                       ref: Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val scored = score(df, idCol, textCol, model, minLogit)
    val labels = df.select(col(idCol).as("id"), ref.as("ref_ok"))
    // mean token weight, 6-dp rounded: score_sum is an exact DECIMAL on
    // both engines, so the quotient and its rounding are bit-identical;
    // (mw, id) is a total order → deterministic ntile on both sides
    val w = Window.orderBy(col("_mw"), col("id"))
    scored.join(labels, "id")
      .withColumn("_mw", round(col("score_sum") / col("n_tokens"), 6))
      .withColumn("bin", ntile(nBins).over(w).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_keep"),
        sum(when(col("ref_ok"), 1L).otherwise(0L)).cast("long").as("n_ref_ok"),
        sum(when(col("keep") === col("ref_ok"), 1L).otherwise(0L))
          .cast("long").as("n_agree"))
      .select(col("bin"), col("n_docs"), col("n_keep"), col("n_ref_ok"),
        col("n_agree"),
        round(col("n_agree").cast("double") / col("n_docs"), 6).as("agree_rate"))
  }

  /** Probability form for interactive use (NOT oracle-compared — libm exp
    * differs across engines in the last ulp): sigmoid(score_sum/n + bias). */
  def sigmoid(scoreSum: Column, nTokens: Column, model: Model): Column =
    lit(1.0) / (lit(1.0) +
      exp(-(scoreSum / nTokens + lit(model.bias.doubleValue()))))

  /**
   * Embedded ORIGINAL seed corpus (label 1 = keep, 0 = drop), written for
   * this repo in the register of the synthetic `documents` fixture:
   * positives are varied technical prose; negatives are the failure modes
   * a quality gate exists for — token repetition, keyword stuffing,
   * boilerplate, and filler — so the frozen model separates repetitive
   * spam from varied text in fixture-like vocabulary.
   */
  private[llm] val SeedCorpus: Seq[(String, Int)] = Seq(
    ("the query planner pushes each filter below the join so the scan reads fewer pages", 1),
    ("a sort merge join shuffles both sides by key while a broadcast join ships the small table", 1),
    ("each executor writes its partition of the shuffle then the reducers fetch sorted runs", 1),
    ("the optimizer prunes unused columns early which keeps the exchange narrow and fast", 1),
    ("window functions rank rows inside a partition without collapsing the group", 1),
    ("streaming state must be bounded by a watermark or the store grows without limit", 1),
    ("a salted key spreads one hot customer across many reducers to balance the stage", 1),
    ("the vector index buckets nearby points so a probe touches a small candidate set", 1),
    ("dictionary encoding compresses a low cardinality column far better than a plain page", 1),
    ("partial aggregation combines rows on the map side before any network transfer", 1),
    ("a range join bins both tables so each bin compares only local candidates", 1),
    ("checkpoints let a failed epoch resume from the last committed batch boundary", 1),
    ("the cost model picks a plan by comparing scan width row count and shuffle size", 1),
    ("late events fall outside the window and land in a side output for audit", 1),
    ("the catalog records each table version so a reader can time travel to a snapshot", 1),
    ("hash partitioning colocates equal keys which turns the big join into a local merge", 1),
    ("sampling a small fraction first gives a cheap estimate of the group cardinality", 1),
    ("the scheduler retries a lost task on another executor using the same input split", 1),
    ("column statistics feed the planner so selective predicates run before wide joins", 1),
    ("an ordered string aggregation builds a stable manifest line for every release", 1),
    ("compaction rewrites many small files into a few large ones to cut listing cost", 1),
    ("a bloom filter on the join key skips row groups that cannot match the probe side", 1),
    ("the lineage graph shows which upstream table produced every derived column", 1),
    ("batch size tunes the tradeoff between launch overhead and memory per task", 1),
    ("the fast scan merges each sorted batch so the slow path never blocks a reader", 1),
    ("a small dimension table broadcasts while the big fact stays partitioned in place", 1),
    ("each customer line lands in the order stream keyed by value and time", 1),
    ("a a a a a a a the the the the the a a the the a the a the", 0),
    ("the a the a the a the a the a the a the a the a the a the a", 0),
    ("a the a a the the a the a a the the a a the a the a a the", 0),
    ("the the the the a a a a the the the a a the the a a a the the", 0),
    ("slow small slow small slow small slow small slow small slow small", 0),
    ("small slow small small slow slow small slow small small slow slow", 0),
    ("buy buy buy cheap cheap cheap deal deal deal now now now click click", 0),
    ("click here click here click here best price best price best price", 0),
    ("subscribe now subscribe now subscribe now limited offer limited offer", 0),
    ("win a prize win a prize win a prize act now act now act now", 0),
    ("free free free free offer offer offer offer sale sale sale sale", 0),
    ("lorem ipsum dolor lorem ipsum dolor lorem ipsum dolor lorem ipsum", 0),
    ("xxxx yyyy zzzz xxxx yyyy zzzz xxxx yyyy zzzz xxxx yyyy zzzz", 0),
    ("asdf qwer zxcv asdf qwer zxcv asdf qwer zxcv asdf qwer zxcv", 0),
    ("untitled draft untitled draft untitled draft untitled draft untitled", 0),
    ("page not found page not found page not found page not found", 0),
    ("terms of service apply terms of service apply terms of service apply", 0),
    ("all rights reserved all rights reserved all rights reserved", 0),
    ("sign in to continue sign in to continue sign in to continue", 0),
    ("accept cookies to view accept cookies to view accept cookies to view", 0),
    ("loading loading loading loading loading loading loading loading", 0))

  /** The frozen seed model (deterministic: sorted-bucket gradient order,
    * fixed init, fixed schedule) — the registry row and its generated
    * DuckDB oracle both derive from THIS object, so they can never skew. */
  lazy val DefaultModel: Model = trainLocal(SeedCorpus, epochs = 3000, lr = 2.0)
}
