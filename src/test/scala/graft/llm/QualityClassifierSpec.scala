package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QualityClassifierSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("frozen model separates the seed corpus at the default boundary") {
    val m = QualityClassifier.DefaultModel
    val hits = QualityClassifier.SeedCorpus.count { case (text, y) =>
      val toks = QualityClassifier.tokenize(text)
      val s = toks.map(t => m.weights.getOrElse(
        QualityClassifier.bucketOf(t, m.nBuckets),
        java.math.BigDecimal.ZERO)).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      val z = s.add(new java.math.BigDecimal(toks.size).multiply(m.bias))
      (z.signum > 0) == (y == 1)
    }
    assert(hits.toDouble / QualityClassifier.SeedCorpus.size >= 0.95,
      s"seed accuracy $hits/${QualityClassifier.SeedCorpus.size}")
  }

  test("distributed trainer matches the local reference trainer") {
    val seedDf = QualityClassifier.SeedCorpus.zipWithIndex
      .map { case ((text, y), i) => (i.toLong, text, y) }
      .toDF("doc_id", "text", "label")
    val local = QualityClassifier.trainLocal(QualityClassifier.SeedCorpus, epochs = 30)
    val dist = QualityClassifier.train(seedDf, "doc_id", "text", "label", epochs = 30)
    assert(dist.nBuckets === local.nBuckets)
    // same non-zero support and 6-dp-identical weights: gradients differ
    // only by float addition order across partitions (~1e-15/step), far
    // below the 6-dp freeze
    assert(dist.weights.keySet === local.weights.keySet)
    val maxDiff = local.weights.map { case (k, v) =>
      math.abs(v.subtract(dist.weights(k)).doubleValue())
    }.max
    assert(maxDiff <= 1e-6, s"max weight diff $maxDiff")
    assert(math.abs(local.bias.subtract(dist.bias).doubleValue()) <= 1e-6)
  }

  test("keep flag equals sigmoid > 0.5 at the default boundary") {
    val m = QualityClassifier.DefaultModel
    val scored = QualityClassifier.score(docs, "doc_id", "text", m)
    val withP = scored.withColumn("p",
      QualityClassifier.sigmoid(col("score_sum"), col("n_tokens"), m))
    val disagree = withP.filter(col("keep") =!= (col("p") > 0.5)).count()
    assert(disagree === 0L)
  }

  test("scoreStreamable ≡ score on every common row (exact doubles)") {
    val m = QualityClassifier.DefaultModel
    val minLogit = m.bias.add(new java.math.BigDecimal("0.050000"))
    val a = QualityClassifier.score(docs, "doc_id", "text", m, minLogit)
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    val b = QualityClassifier.scoreStreamable(docs, "doc_id", "text", m, minLogit)
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    // streamable keeps zero-token docs; every scored doc matches exactly
    assert(a.keySet.subsetOf(b.keySet))
    a.foreach { case (id, row) => assert(b(id) === row, s"doc $id") }
    b.keySet.diff(a.keySet).foreach { id =>
      assert(b(id)._2 === 0L && !b(id)._4, s"zero-token doc $id")
    }
    // streaming-safe shape: no Exchange anywhere in the plan
    val plan = QualityClassifier.scoreStreamable(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("calibrationTable: bins partition the scored corpus, counts reconcile") {
    import org.apache.spark.sql.functions._
    val m = QualityClassifier.DefaultModel
    val minLogit = m.bias.add(new java.math.BigDecimal("0.050000"))
    val ref = TextOps.qualityScore(col("text")) >= 0.5
    val cal = QualityClassifier.calibrationTable(
        docs, "doc_id", "text", m, minLogit, ref, nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(cal.map(_._1).toSeq === (1L to 10L))
    val scored = QualityClassifier.score(docs, "doc_id", "text", m, minLogit)
    assert(cal.map(_._2).sum === scored.count())
    assert(cal.map(_._3).sum === scored.filter(col("keep")).count())
    cal.foreach { case (bin, n, nk, nr, na, rate) =>
      assert(nk <= n && nr <= n && na <= n, s"bin $bin")
      assert(math.abs(rate - na.toDouble / n) < 1e-6, s"bin $bin rate")
    }
    // the gate is monotone in the bin key (mean token weight), so keep
    // rate must not decrease from the bottom bin to the top bin
    assert(cal.head._3.toDouble / cal.head._2 <= cal.last._3.toDouble / cal.last._2)
  }

  test("calibrated gate discriminates on the fixture (both classes present)") {
    val m = QualityClassifier.DefaultModel
    val minLogit = m.bias.add(new java.math.BigDecimal("0.050000"))
    val byKeep = QualityClassifier.score(docs, "doc_id", "text", m, minLogit)
      .groupBy("keep").count().as[(Boolean, Long)].collect().toMap
    assert(byKeep.getOrElse(true, 0L) > 0L && byKeep.getOrElse(false, 0L) > 0L,
      s"degenerate gate: $byKeep")
    // every input doc with >=1 token is scored exactly once
    assert(byKeep.values.sum === docs.filter(length(trim(col("text"))) > 0).count())
  }
}
