package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/**
 * Executable scale rule for SemDeDup (the r13 verdict's l38 finding): the
 * cell count must be a FUNCTION of the corpus, never a fixed knob — a
 * 256-cell model at 100 TB silently drops nearly every cell whole. Proves
 * (a) the capacity guard fails fast on an under-sized model, (b) the
 * derived-cells path keeps over-cap drop mass bounded when the corpus
 * grows ×10, because the model grows with it.
 */
class SemanticDedupScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic pseudo-embeddings: 16 planted modes + per-row jitter,
    * so k-means has real structure at every corpus size. */
  private def corpus(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val mode = i % 16
      val v = Array.tabulate(Dim) { d =>
        val base = math.sin(mode * 1.7 + d * 0.9)
        val jitter = ((i * 2654435761L + d * 40503L) % 1000L) / 10000.0
        (base + jitter).toFloat
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("deriveCellCount: ceil(n/target), floor 1, grows with the corpus") {
    assert(Ann.deriveCellCount(0L, 100) === 1)
    assert(Ann.deriveCellCount(1L, 100) === 1)
    assert(Ann.deriveCellCount(100L, 100) === 1)
    assert(Ann.deriveCellCount(101L, 100) === 2)
    assert(Ann.deriveCellCount(10_000L, 100) === 100)
    // x10 corpus -> x10 cells: capacity scales with the data
    assert(Ann.deriveCellCount(100_000L, 100) === 10 * Ann.deriveCellCount(10_000L, 100))
  }

  test("capacity guard: an under-sized model fails fast with a readable error") {
    val df = corpus(600)
    val tiny = Ann.firstKCentroids(df, "embedding", "vec_id", 2)
    val e = intercept[IllegalArgumentException] {
      Ann.semanticDedup(df, "embedding", "vec_id", tiny, threshold = 0.9,
        maxCellSize = 100, corpusSize = Some(600L))
    }
    assert(e.getMessage.contains("capacity 200 < corpus 600"), e.getMessage)
    // same model without the declared corpus size keeps the legacy behavior
    // (caps silently exempt over-cap cells) - the registered l38 contract
    val legacy = Ann.semanticDedup(df, "embedding", "vec_id", tiny,
      threshold = 0.9, maxCellSize = 100)
    assert(legacy.count() === 600L)
  }

  test("derived-cells path bounds drop mass as the corpus grows x10") {
    def dropFraction(n: Int): Double = {
      val st = DropStats(spark, s"semdedup-scale-$n")
      val out = Ann.semanticDedupAuto(corpus(n), "embedding", "vec_id",
        threshold = 0.995, targetCellSize = 50, capFactor = 4,
        kmeansIters = 3, dropStats = Some(st))
      val total = out.count() // one action: counters populate exactly once
      assert(total === n.toLong)
      st.rows.toDouble / n
    }
    val small = dropFraction(300)
    val big = dropFraction(3000)
    // the model grows with the corpus (6 -> 60 cells), so the fraction of
    // rows exempted by the 4x-target cap stays bounded instead of
    // collapsing toward "drop everything" as a fixed-cell model would
    assert(small <= 0.25, s"small-corpus drop fraction $small")
    assert(big <= 0.25, s"x10-corpus drop fraction $big")
  }

  test("a FIXED-cell model degrades at x10 where the derived model holds") {
    // the anti-pattern the guard exists for: keep 4 cells while the corpus
    // grows; capacity 4*cap is eventually < corpus and the guard trips
    val df = corpus(3000)
    val fixed = Ann.kmeansCentroids(df, "embedding", "vec_id", 4, iters = 2)
    val e = intercept[IllegalArgumentException] {
      Ann.semanticDedup(df, "embedding", "vec_id", fixed, threshold = 0.995,
        maxCellSize = 200, corpusSize = Some(3000L))
    }
    assert(e.getMessage.contains("raise the centroid count"), e.getMessage)
  }
}
