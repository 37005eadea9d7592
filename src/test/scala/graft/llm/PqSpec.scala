package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PqSpec extends AnyFunSuite with SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("encode: valid code range, local recomputation parity, determinism") {
    val cbs = Pq.seedCodebooks(emb, "embedding", "vec_id", m = 8, k = 16)
    assert(cbs.size === 8 && cbs.forall(_.size === 16) &&
      cbs.forall(_.forall(_.length === 8)))
    val out = Pq.encode(emb, "embedding", "vec_id", cbs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out.length === vecs.size)
    out.foreach { case (id, codes, recon) =>
      val cs = codes.split(",").map(_.toInt)
      assert(cs.length === 8 && cs.forall(c => c >= 0 && c < 16), s"id $id")
      // local replay: nearest cell by (6dp distance, cell), summed error
      val v = vecs(id).map(_.toDouble)
      var err = BigDecimal(0)
      cs.zipWithIndex.foreach { case (code, j) =>
        val sv = v.slice(j * 8, j * 8 + 8)
        val scored = cbs(j).zipWithIndex.map { case (cent, cell) =>
          val dist = sv.zip(cent.map(_.toDouble)).foldLeft(0.0) {
            case (acc, (x, y)) => acc + (x - y) * (x - y) }
          (BigDecimal(dist).setScale(6, BigDecimal.RoundingMode.HALF_UP), cell)
        }
        val best = scored.min
        assert(best._2 === code, s"id $id sub $j: expected ${best._2} got $code")
        err += best._1
      }
      assert(math.abs(err.toDouble - recon) < 1e-9, s"id $id recon")
    }
    // deterministic rerun
    val again = Pq.encode(emb, "embedding", "vec_id", cbs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("Lloyd refinement cuts distortion vs the seed codebook") {
    val seeds = Pq.seedCodebooks(emb, "embedding", "vec_id", m = 8, k = 16)
    val trained = Pq.trainCodebooks(emb, "embedding", "vec_id", m = 8, k = 16, iters = 3)
    val d0 = Pq.meanDistortion(emb, "embedding", "vec_id", seeds)
    val d1 = Pq.meanDistortion(emb, "embedding", "vec_id", trained)
    assert(d1 < d0, s"trained $d1 !< seed $d0")
    // meaningful compression quality: at least 20% distortion reduction
    assert(d1 < 0.8 * d0, s"weak improvement: $d1 vs $d0")
  }
}
