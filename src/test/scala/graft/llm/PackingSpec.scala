package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PackingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], cap: Long, chunk: Long = 1000L) =
    Packing.packByTokenBudget(rows.toDF("id", "n"), "id", "n", cap, chunk)
      .collect().map(p => p.doc_id -> (p.chunk, p.bin, p.n_tokens)).toMap

  test("greedy first-fit in id order: bins close when the next doc overflows") {
    val got = pack(Seq((0L, 300L), (1L, 200L), (2L, 20L), (3L, 500L), (4L, 10L)), cap = 512)
    // 300+200 = 500 fits; +20 overflows → bin 1; 20+500 overflows → bin 2; 500+10 fits
    assert(got(0L)._2 === 0L && got(1L)._2 === 0L)
    assert(got(2L)._2 === 1L)
    assert(got(3L)._2 === 2L && got(4L)._2 === 2L)
  }

  test("a doc larger than the capacity gets a bin of its own") {
    val got = pack(Seq((0L, 100L), (1L, 9999L), (2L, 100L)), cap = 512)
    assert(got(0L)._2 === 0L)
    assert(got(1L)._2 === 1L) // oversize: alone in bin 1
    assert(got(2L)._2 === 2L) // 9999+100 > cap → next bin
  }

  test("zero-token docs never close a bin; null counts are excluded") {
    val df = Seq((0L, Some(512L)), (1L, Some(0L)), (2L, None), (3L, Some(1L)))
      .toDF("id", "n")
    val got = Packing.packByTokenBudget(df, "id", "n", binCapacity = 512, chunkSize = 1000)
      .collect().map(p => p.doc_id -> p.bin).toMap
    assert(!got.contains(2L))
    assert(got(0L) === 0L && got(1L) === 0L) // 512+0 does not overflow
    assert(got(3L) === 1L)
  }

  test("chunks pack independently: same per-chunk bins regardless of other chunks") {
    val a = pack(Seq((0L, 400L), (1L, 400L)), cap = 512, chunk = 2)
    val b = pack(Seq((0L, 400L), (1L, 400L), (2L, 400L), (3L, 400L)), cap = 512, chunk = 2)
    // chunk 0 packs identically whether or not chunk 1 exists
    assert(a(0L) === b(0L) && a(1L) === b(1L))
    // chunk 1 restarts at bin 0 with running 0
    assert(b(2L) === (1L, 0L, 400L) && b(3L) === (1L, 1L, 400L))
  }

  test("randomized inputs match an independent per-chunk reference fold") {
    val rng = new scala.util.Random(42)
    // sparse, shuffled-looking ids; counts spanning 0 .. 3× capacity
    val rows = (0 until 500).map(_ => (rng.nextInt(10000).toLong, rng.nextInt(1500).toLong))
      .distinctBy(_._1)
    val cap = 512L
    val chunkSize = 64L
    def referencePack(rs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
      rs.groupBy(_._1 / chunkSize).flatMap { case (chunk, members) =>
        var bin = 0L; var running = 0L
        members.sortBy(_._1).map { case (id, n) =>
          if (running > 0 && running + n > cap) { bin += 1; running = 0L }
          running += n
          id -> (chunk, bin)
        }
      }
    val expected = referencePack(rows)
    val got = Packing.packByTokenBudget(rows.toDF("id", "n"), "id", "n", cap, chunkSize)
      .collect().map(p => p.doc_id -> (p.chunk, p.bin)).toMap
    assert(got === expected)
  }

  test("bin token sums never exceed capacity except for single oversize docs") {
    val rows = (0L until 200L).map(i => (i, (i * 37 % 700) + 1))
    val packed = Packing.packByTokenBudget(rows.toDF("id", "n"), "id", "n",
      binCapacity = 512, chunkSize = 32).collect()
    packed.groupBy(p => (p.chunk, p.bin)).foreach { case (key, ds) =>
      val sum = ds.map(_.n_tokens).sum
      assert(sum <= 512 || ds.length == 1, s"bin $key overfull with ${ds.length} docs: $sum")
    }
    assert(packed.length === 200)
  }

  test("prefixCacheOrder: shared-prefix docs run adjacently with exact token LCP") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sys prompt A task one"),
      (2L, "sys prompt A task two"),
      (3L, "sys prompt B other job"),
      (4L, "unique start here"),
      (5L, "sys"),                 // 1-token doc, prefix of the others
      (6L, "   "), (7L, null.asInstanceOf[String])) // dropped
      .toDF("doc_id", "text")
    val out = Packing.prefixCacheOrder(docs, "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size === 5)
    // bucket "sys" order: "sys" (5) < "sys prompt A task one" (1) <
    // "… two" (2) < "sys prompt B …" (3)
    assert(out(5L)._3 === 1L && out(5L)._5 === 0L && out(5L)._4 === 1L)
    assert(out(1L)._3 === 2L && out(1L)._5 === 1L)   // vs "sys": LCP 1
    assert(out(2L)._3 === 3L && out(2L)._5 === 4L)   // sys prompt A task
    assert(out(3L)._3 === 4L && out(3L)._5 === 2L)   // sys prompt
    assert(out(4L)._2 === "unique" && out(4L)._3 === 1L && out(4L)._5 === 0L)
    // cache win is real: 7 of the sys-bucket's scanned prefix tokens re-use
    assert(Seq(1L, 2L, 3L, 5L).map(out(_)._5).sum === 7L)
  }

  test("prefixCacheOrder: duplicate prompts shorter than k cap LCP at real length") {
    import spark.implicits._
    val docs = Seq((1L, "sys"), (2L, "sys"), (3L, "sys go"), (4L, "sys go"))
      .toDF("doc_id", "text")
    val out = Packing.prefixCacheOrder(docs, "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // bucket order: "sys"(1) < "sys"(2) < "sys go"(3) < "sys go"(4)
    assert(out(1L)._5 === 0L)
    assert(out(2L)._5 === 1L, "identical 1-token prompt must cache 1 token, not k")
    assert(out(3L)._5 === 1L)
    assert(out(4L)._5 === 2L, "identical 2-token prompt must cache 2 tokens, not k")
    out.values.foreach(r =>
      assert(r._5 <= r._4, s"est_cached_tokens must never exceed n_prefix_tokens: $r"))
  }

  test("mixtureInterleave: 2:1 stride pattern, tie order, positions a permutation") {
    import spark.implicits._
    // A weight 2, B weight 1 → L=2, m_A=1, m_B=2: expected epoch A A B A A B
    val docs = Seq((10L, "A"), (11L, "A"), (12L, "A"), (13L, "A"),
      (20L, "B"), (21L, "B"), (99L, "Z")) // Z not in the mixture: excluded
      .toDF("doc_id", "source")
    val out = Packing.mixtureInterleave(docs, "doc_id", "source",
        Map("A" -> 2, "B" -> 1))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._5)
    assert(out.map(_._5).toSeq === (0L until 6L), "positions must be 0..N-1")
    assert(out.map(_._2).mkString === "AABAAB")
    assert(out.map(_._1).toSeq === Seq(10L, 11L, 20L, 12L, 13L, 21L))
  }

  test("mixtureInterleave: closed-form positions equal a real global sort (with count caps)") {
    import spark.implicits._
    // uneven totals force the n_t caps to bind: A exhausts early
    val docs = (1L to 3L).map(i => (i, "A")) ++ (1L to 17L).map(i => (100 + i, "B")) ++
      (1L to 9L).map(i => (200 + i, "C"))
    val out = Packing.mixtureInterleave(docs.toDF("doc_id", "source"),
        "doc_id", "source", Map("A" -> 3, "B" -> 4, "C" -> 2))
      .as[(Long, String, Long, Long, Long)].collect()
    // replay with an actual sort: (vt, source index, id)
    val si = Map("A" -> 0, "B" -> 1, "C" -> 2)
    val sorted = out.sortBy(r => (r._4, si(r._2), r._1)).zipWithIndex
    sorted.foreach { case (r, i) =>
      assert(r._5 === i.toLong, s"row $r expected position $i")
    }
    assert(out.map(_._5).sorted.toSeq === (0L until out.length.toLong))
  }

  test("packingEfficiency: hand case where FFD beats streaming next-fit, exact micro utils") {
    // single-char 'q' words are 1 BPE token each → exact sizes 400/200/400/200;
    // next-fit in id order burns 4 bins, FFD reaches the LB of 3
    def qs(n: Int) = ("q " * n).trim
    val docs = Seq((0L, qs(400)), (1L, qs(200)), (2L, qs(400)), (3L, qs(200)))
      .toDF("doc_id", "text")
    val out = Packing.packingEfficiency(docs, "doc_id", "text",
        binCapacity = 512L, chunkSize = 32L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === ((1L, 4L, 1200L, 4L, 3L, 3L,
      1200000000L / (4 * 512), 1200000000L / (3 * 512))))
  }

  test("packingEfficiency: lower bound never exceeds either heuristic; null-only chunks emit nothing") {
    val rng = new scala.util.Random(3)
    // sizes ≤ capacity: ceil(total/cap) is only a valid lower bound when
    // no single doc overflows a bin (an oversized doc sits alone in one
    // over-full bin on both heuristics, beating the "bound")
    val docs = (0L until 200L).map { id =>
      (id, if (id >= 64 && id < 96) null else qs2(1 + rng.nextInt(512)))
    }.toDF("doc_id", "text")
    val out = Packing.packingEfficiency(docs, "doc_id", "text",
        binCapacity = 512L, chunkSize = 32L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(out._1 === 6L, "the all-null chunk [64,96) must not emit stats")
    assert(out._2 === 168L)
    assert(out._6 <= out._5 && out._6 <= out._4, s"LB must bound both heuristics: $out")
  }

  private def qs2(n: Int) = ("q " * n).trim
}
