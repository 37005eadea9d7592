package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The extension path must expose every native function to plain SQL with
 * no per-object `register` calls. One JVM = one SparkContext, and
 * `spark.sql.extensions` only applies at first-session creation, so the
 * installer is driven through [[org.apache.spark.sql.GraftTestBridge]]
 * against the shared session's registry — exercising exactly the
 * injectFunction tuples the conf path would consume.
 */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("GraftExtensions exposes the native functions to SQL") {
    org.apache.spark.sql.GraftTestBridge.applyExtensions(
      new GraftExtensions(),
      org.apache.spark.sql.GraftTestBridge.functionRegistry(spark))
    val r = spark.sql(
      """SELECT
        |  graft_simhash64(array('the', 'quick')) AS sh,
        |  graft_simhash_p60(array('the', 'quick')) AS shp,
        |  graft_phash60('the') AS ph,
        |  graft_hyperplane_bucket(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 4) AS hb
        |""".stripMargin).collect()(0)
    // values must agree with the library's Column-API path
    import org.apache.spark.sql.functions.lit
    val viaColumnApi = spark.range(1)
      .select(graft.llm.TextOps.portableHash60(lit("the")).as("h"))
      .collect()(0).getLong(0)
    assert(r.getLong(2) === viaColumnApi)
    assert(r.getLong(0) !== 0L)
    assert(r.getLong(1) !== 0L)
    assert(r.getLong(3) >= 0L && r.getLong(3) < 16L)
    // the aggregate registers too
    import spark.implicits._
    val types = Seq("1", "2.5", "x").toDF("v")
      .selectExpr("graft_type_set(v) AS t").as[Seq[String]].collect()(0)
    assert(types.nonEmpty)
    // BPE pair: count is consistent with the encoded sequence
    val bpe = spark.sql(
      "SELECT graft_bpe_count('the table') AS n, graft_bpe_encode('the table') AS s")
      .collect()(0)
    assert(bpe.getLong(0) === bpe.getString(1).split(" ").length.toLong)
    assert(bpe.getLong(0) === graft.llm.Bpe.defaultTable.countTokens("the table"))
    // malformed nPlanes surfaces as the guard's clean error, not a raw
    // ClassCastException/NPE out of the builder
    for (bad <- Seq("'4'", "NULL", "")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_hyperplane_bucket(array(CAST(1.0 AS FLOAT)), $bad)").collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("graft_hyperplane_bucket") || msgs.contains("WRONG_NUM_ARGS"),
        s"nPlanes=$bad: $msgs")
    }
  }

  test("unary builders reject wrong arity with a named error") {
    org.apache.spark.sql.GraftTestBridge.applyExtensions(
      new GraftExtensions(),
      org.apache.spark.sql.GraftTestBridge.functionRegistry(spark))
    for {
      fn   <- Seq("graft_simhash64", "graft_simhash_p60", "graft_phash60",
        "graft_bpe_count", "graft_bpe_encode")
      args <- Seq("", "array('a'), array('b')")
    } {
      val e = intercept[Exception] {
        spark.sql(s"SELECT $fn($args)").collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains(fn) || msgs.contains("WRONG_NUM_ARGS"),
        s"$fn($args): expected a named arity error, got: $msgs")
    }
  }

  test("a fresh session built withExtensions resolves the functions (conf path)") {
    // the real installer path: a NEW session (same context) constructed with
    // .withExtensions — what spark.sql.extensions=graft.GraftExtensions does
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-conf-path")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s2.sql(
        """SELECT graft_simhash64(array('the','quick','fox')) AS s,
          |       graft_hyperplane_bucket(array(CAST(1.0 AS DOUBLE), CAST(-2.0 AS DOUBLE)), 6) AS b,
          |       graft_phash60('the') AS p
          |""".stripMargin).collect()(0)
      assert(row.getLong(0) !== 0L)
      assert(row.getLong(1) >= 0L && row.getLong(1) < (1L << 6))
      assert(row.getLong(2) > 0L)
      val types = s2.sql(
        "SELECT graft_type_set(v) AS t FROM VALUES ('1'), ('2.5'), ('x') AS t(v)")
        .collect()(0).getSeq[String](0)
      assert(types.toSet === Set("BOOL", "FLOAT64", "STRING"))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
