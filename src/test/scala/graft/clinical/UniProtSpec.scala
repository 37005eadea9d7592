package graft.clinical

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Unit cases mirroring the reference's comparator/dict semantics
  * (create_tables_quant_data_matrix_pdc.py:299-330, 375-435). */
class UniProtSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("accession validator accepts/rejects the reference's shapes") {
    assert(UniProt.isAccession("P12345"))
    assert(UniProt.isAccession("Q1AB23"))
    assert(UniProt.isAccession("A0A023GPI8"))
    assert(!UniProt.isAccession("P1234"))     // wrong length
    assert(!UniProt.isAccession("A12345"))    // non-OPQ head needs alpha idx 2
    assert(!UniProt.isAccession(null))
  }

  test("oldestAccession breaks comparator ties by input order (stable sort)") {
    // both len-6, class P, digit 1 → comparator returns 0; Python's stable
    // sorted() keeps list order, so the FIRST listed id must win even though
    // it is lexicographically larger
    val out = Seq(Seq("P1ZZZ9", "P1AAA0")).toDF("ids")
      .select(UniProt.oldestAccession(col("ids")).as("oldest"))
      .as[String].head()
    assert(out === "P1ZZZ9")
    // and the comparator itself still orders distinct classes correctly:
    // P before Q before O, 6-char before 10-char
    assert(UniProt.swissprotAgeCompare("P12345", "Q12345") < 0)
    assert(UniProt.swissprotAgeCompare("Q12345", "O12345") < 0)
    assert(UniProt.swissprotAgeCompare("P12345", "A0A023GPI8") < 0)
  }

  private def parse(s: String): (String, String, Long) = {
    val r = Seq(s).toDF("auth")
      .select(UniProt.parseAuthority(col("auth")).as("a"))
      .select("a.authority", "a.authority_gene_id", "a.n_records")
      .collect()(0)
    (r.getString(0), r.getString(1), r.getLong(2))
  }

  test("parseAuthority: duplicate authority keeps the LAST gene_id, counted once") {
    // dict build: authority_records_dict[auth] = gene_id → last wins
    assert(parse("HGNC:1; HGNC:2") === (("HGNC", "2", 1L)))
    assert(parse("HGNC:1; MGI:9; HGNC:2") === (("HGNC", "2", 1L)))
  }

  test("parseAuthority: MGI popped after dict build; empty → nulls") {
    assert(parse("HGNC:7; MGI:3") === (("HGNC", "7", 1L)))
    assert(parse("MGI:3") === ((null, null, 0L)))
    assert(parse("") === ((null, null, 0L)))
    // two distinct non-MGI authorities: n_records exposes the reference's
    // hard-exit invariant; first-inserted authority is reported
    assert(parse("HGNC:1; ENSG:2") === (("HGNC", "1", 2L)))
  }
}
