package graft.publish

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import Masking.MaskMode._

/** Column masking: mode semantics, null preservation, floor buckets on
  * negatives, stable pseudonyms, and the fail-fast unknown-column guard. */
class MaskingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, "alice@example.org", "BUILDING", 12345L),
    (2L, "alice@example.org", "abc", -5L),
    (3L, null.asInstanceOf[String], null.asInstanceOf[String], 10000L))
  private def df = rows.toDF("id", "email", "seg", "cents")

  test("hash is a stable salted pseudonym; redact keeps the typed column") {
    val out = Masking.applyMasks(
        df.withColumn("nk", col("id").cast("int")),
        Seq("email" -> Hash("s:"), "nk" -> Redact))
      .select("id", "email", "nk")
      .as[(Long, Option[String], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // equal inputs → equal pseudonyms; 16 lowercase hex chars
    assert(out(1L)._1 === out(2L)._1)
    assert(out(1L)._1.get.matches("[0-9a-f]{16}"))
    // null in → null out; redact is null for every row
    assert(out(3L)._1.isEmpty)
    assert(out.values.forall(_._2.isEmpty))
    // a different salt moves the pseudonym
    val other = Masking.applyMasks(df, Seq("email" -> Hash("t:")))
      .filter(col("id") === 1).select("email").as[String].head()
    assert(other !== out(1L)._1.get)
  }

  test("last4 pads all but the tail; short strings mask whole; nulls survive") {
    val got = Masking.applyMasks(df, Seq("seg" -> Last4))
      .select("id", "seg").as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("****DING"))
    assert(got(2L) === Some("***"))
    assert(got(3L) === None)
  }

  test("bucket floors toward -inf on negatives (pmod, not %)") {
    val got = Masking.applyMasks(df, Seq("cents" -> Bucket(10000L)))
      .select("id", "cents").as[(Long, Long)].collect().toMap
    assert(got(1L) === 10000L)
    assert(got(2L) === -10000L) // -5 floors DOWN, not toward zero
    assert(got(3L) === 10000L)
  }

  test("unknown policy column fails fast") {
    val e = intercept[IllegalArgumentException] {
      Masking.applyMasks(df, Seq("emial" -> Redact))
    }
    assert(e.getMessage.contains("emial"))
  }
}
