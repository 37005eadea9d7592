package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class LabelPropSpec extends AnyFunSuite with SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("knnLabelVote: unlabeled targets only, exact local vote replay") {
    val labels = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id"), col("lang").as("label"))
    val got = LabelProp.knnLabelVote(emb, "embedding", "vec_id", labels,
        dim = 64, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    val labelMap = labels.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // targets are strictly unlabeled; vote counts bounded by k (weights
    // may be negative — a top-k neighbor can sit at negative cosine)
    got.foreach { case (id, _, _, n) =>
      assert(!labelMap.contains(id), s"labeled doc $id got a prediction")
      assert(n >= 1 && n <= 3, s"doc $id: n=$n")
    }
    // exact replay: take the (already spec-verified) kNN graph, vote
    // locally with BigDecimal weights and the (weight DESC, label ASC)
    // tie-break — must match the distributed result row for row
    val nn = Ann.lshKnnJoin(emb, "embedding", "vec_id", dim = 64, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val expected = nn
      .filter { case (id, nb, _) => !labelMap.contains(id) && labelMap.contains(nb) }
      .groupBy(_._1)
      .map { case (id, rows) =>
        val byLabel = rows.groupBy(r => labelMap(r._2)).map { case (lab, vs) =>
          (lab, vs.map(v => BigDecimal(v._3.toString)).sum, vs.length.toLong)
        }
        val (lab, w, n) = byLabel.minBy { case (l, w, _) => (-w, l) }
        (id, lab, w.toDouble, n)
      }
      .toSeq.sortBy(_._1)
    assert(got.sortBy(_._1).toSeq === expected)
  }

  test("knnLabelVote: fully labeled corpus yields no predictions") {
    val all = docs.select(col("doc_id").as("id"), col("lang").as("label"))
    assert(LabelProp.knnLabelVote(emb, "embedding", "vec_id", all,
      dim = 64, k = 3).isEmpty)
  }
}
