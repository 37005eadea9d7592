package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The SQL front-end gate: each case drives a registered (oracled) query
 * END-TO-END through `spark.sql` alone — temp views + a `graft_*` table
 * function from [[GraftSqlSurface]] — and must reproduce the registered
 * Scala plan's rows exactly. 15 oracled registry rows covered, so a
 * BigQuery-SQL-shaped user can run the macro library without Scala.
 */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val prepared: Unit = {
    for (t <- Seq("orders", "lineitem", "documents", "events"))
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $t AS " +
        s"SELECT * FROM parquet.`$dir/$t.parquet`")
    // events with canonical epoch-µs ts (the Registry.tdEventsUs contract,
    // spelled in SQL for whichever physical type the parquet carries)
    val tsUs = spark.table("events").schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "ts div 1000"
      case _ => "unix_micros(CAST(ts AS TIMESTAMP))"
    }
    spark.sql(s"CREATE OR REPLACE TEMP VIEW events_us AS " +
      s"SELECT *, $tsUs AS ts_us FROM events")
  }

  /** Rows of the SQL-only path must equal the registered query's rows. */
  private def check(registered: String, sql: String,
                    setup: Seq[String] = Nil): Unit = {
    prepared
    setup.foreach(spark.sql(_))
    val want = graft.queries.Registry.queries(registered)(spark, dir)
    val got = spark.sql(sql)
    assert(got.columns.toSeq === want.columns.toSeq, s"$registered schema")
    val w = want.collect().map(_.toString).sorted.toSeq
    val g = got.collect().map(_.toString).sorted.toSeq
    assert(g === w, s"$registered rows")
  }

  test("a21_mad via graft_mad") {
    check("a21_mad",
      "SELECT * FROM graft_mad('lineitem', 'l_returnflag', 'l_extendedprice')")
  }

  test("a22_welch_drift via graft_welch") {
    check("a22_welch_drift",
      "SELECT * FROM graft_welch('documents', 'source', 'n_chars')")
  }

  test("a24_mann_whitney via graft_mann_whitney") {
    check("a24_mann_whitney",
      "SELECT * FROM graft_mann_whitney('documents', 'source', 'n_chars')")
  }

  test("a26_ks_drift via graft_ks") {
    check("a26_ks_drift",
      "SELECT * FROM graft_ks('documents', 'source', 'n_chars')")
  }

  test("a25_ols_trend via graft_ols_trend") {
    check("a25_ols_trend",
      "SELECT * FROM graft_ols_trend('events_us', 'event_type', 'ts_us')")
  }

  test("a31_gini via graft_gini") {
    check("a31_gini",
      "SELECT * FROM graft_gini('documents', 'source', 'n_chars')")
  }

  test("a33_weighted_median via graft_weighted_median") {
    check("a33_weighted_median",
      "SELECT * FROM graft_weighted_median('sql_li_wm', 'grp', 'price_cents', 'qty')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_li_wm AS
            |SELECT l_returnflag AS grp,
            |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
            |  CAST(l_quantity AS BIGINT) AS qty FROM lineitem""".stripMargin))
  }

  test("a34_spearman via graft_spearman") {
    check("a34_spearman",
      "SELECT * FROM graft_spearman('sql_li_sp', 'grp', 'l_quantity', 'l_extendedprice')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_li_sp AS
            |SELECT l_returnflag AS grp, l_quantity, l_extendedprice
            |FROM lineitem""".stripMargin))
  }

  test("a35_mode via graft_mode") {
    check("a35_mode",
      "SELECT * FROM graft_mode('sql_li_mode', 'grp', 'l_quantity')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_li_mode AS
            |SELECT l_returnflag AS grp, l_quantity FROM lineitem""".stripMargin))
  }

  test("a37_theil_sen via graft_theil_sen") {
    check("a37_theil_sen",
      "SELECT * FROM graft_theil_sen('sql_ev_daily', 'key', 'day', 'x')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_ev_daily AS
            |SELECT event_type AS key, ts_us div 86400000000 AS day,
            |  count(1) AS x FROM events_us GROUP BY 1, 2""".stripMargin))
  }

  test("a38_trimmed_mean via graft_trimmed_mean") {
    check("a38_trimmed_mean",
      "SELECT * FROM graft_trimmed_mean('sql_li_tm', 'grp', 'cents', 500)",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_li_tm AS
            |SELECT l_returnflag AS grp,
            |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            |FROM lineitem""".stripMargin))
  }

  test("a10_null_census_json via graft_null_census") {
    check("a10_null_census_json",
      "SELECT * FROM graft_null_census('sql_census_in')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_census_in AS
            |SELECT nullif(o_orderpriority, '3-MEDIUM') AS prio_opt,
            |  nullif(o_orderstatus, 'P') AS status_opt, o_orderkey
            |FROM orders""".stripMargin))
  }

  test("u3_symmetric_diff via graft_symmetric_diff") {
    check("u3_symmetric_diff",
      "SELECT * FROM graft_symmetric_diff('sql_u3_old', 'sql_u3_neu')",
      Seq(
        """CREATE OR REPLACE TEMP VIEW sql_u3_old AS
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
          |WHERE o_orderkey % 7 <> 0""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_u3_neu AS
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
          |WHERE o_orderkey % 5 <> 0""".stripMargin))
  }

  test("l1_exact_dedup via graft_exact_dedup") {
    check("l1_exact_dedup",
      "SELECT * FROM graft_exact_dedup('sql_l1_pre', 'prefix', 'doc_id')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_l1_pre AS
            |SELECT doc_id,
            |  array_join(slice(split(trim(text), '\\s+'), 1, 5), ' ') AS prefix
            |FROM documents""".stripMargin))
  }

  test("l14_dedup_keep_first via graft_dedup_keep_first") {
    check("l14_dedup_keep_first",
      "SELECT * FROM graft_dedup_keep_first('sql_l1_pre', 'prefix', 'doc_id')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_l1_pre AS
            |SELECT doc_id,
            |  array_join(slice(split(trim(text), '\\s+'), 1, 5), ' ') AS prefix
            |FROM documents""".stripMargin))
  }

  test("argument errors are readable") {
    prepared
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_mad('lineitem', 'l_returnflag')").collect()
    }
    assert(e1.getMessage.contains("graft_mad"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_trimmed_mean('lineitem', 'a', 'b', 'x')").collect()
    }
    assert(e2.getMessage.contains("trimBp"))
  }
}
