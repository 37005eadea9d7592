package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The SQL front-end gate: each case drives a registered (oracled) query
 * END-TO-END through `spark.sql` alone — temp views + a `graft_*` table
 * function from [[GraftSqlSurface]] — and must reproduce the registered
 * Scala plan's rows exactly. 48 oracled registry rows covered — including
 * the composite pipelines (clinical flatten, publish gate, file-metadata
 * DAG, curation funnel, policy audit, erasure cascade) — so a
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

  // ---- round-13 breadth: joins, intervals, LSH, sessions, gates ---------

  test("j14_asof_join via graft_asof_join") {
    check("j14_asof_join",
      """SELECT o_orderkey, ev AS last_event_id
        |FROM graft_asof_join('sql_j14_o', 'sql_j14_e', 'k', 'k', 't', 't', 'ev')""".stripMargin,
      Seq("""CREATE OR REPLACE TEMP VIEW sql_j14_o AS
            |SELECT o_orderkey, o_custkey % 20 AS k,
            |  unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS t FROM orders""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_j14_e AS
          |SELECT user_id % 20 AS k, ts_us AS t, max(event_id) AS ev
          |FROM events_us GROUP BY 1, 2""".stripMargin))
  }

  test("j26_asof_forward via graft_asof_join_forward") {
    check("j26_asof_forward",
      """SELECT o_orderkey, ev AS next_event_id
        |FROM graft_asof_join_forward('sql_j14_o', 'sql_j14_e', 'k', 'k', 't', 't', 'ev')""".stripMargin,
      Seq("""CREATE OR REPLACE TEMP VIEW sql_j14_o AS
            |SELECT o_orderkey, o_custkey % 20 AS k,
            |  unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS t FROM orders""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_j14_e AS
          |SELECT user_id % 20 AS k, ts_us AS t, max(event_id) AS ev
          |FROM events_us GROUP BY 1, 2""".stripMargin))
  }

  test("j18_nearest_event via graft_nearest_event") {
    check("j18_nearest_event",
      """SELECT click_id, user_id, view_id, dt AS dt_us
        |FROM graft_nearest_event('sql_j18_c', 'sql_j18_v',
        |  'user_id', 'v_user', 'click_us', 'view_us', 'view_id')""".stripMargin,
      Seq("""CREATE OR REPLACE TEMP VIEW sql_j18_c AS
            |SELECT event_id AS click_id, user_id, ts_us AS click_us
            |FROM events_us WHERE event_type = 'click'""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_j18_v AS
          |SELECT user_id AS v_user, ts_us AS view_us, min(event_id) AS view_id
          |FROM events_us WHERE event_type = 'view' GROUP BY 1, 2""".stripMargin))
  }

  private val intervalFixture = Seq(
    """CREATE OR REPLACE TEMP VIEW sql_iv AS
      |SELECT o_custkey % 5 AS k,
      |  CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) AS sa,
      |  CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) + 20 AS ea
      |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin)

  test("j23_interval_merge via graft_interval_merge") {
    check("j23_interval_merge",
      "SELECT * FROM graft_interval_merge('sql_iv', 'k', 'sa', 'ea')",
      intervalFixture)
  }

  test("j25_interval_gaps via graft_interval_gaps") {
    check("j25_interval_gaps",
      "SELECT * FROM graft_interval_gaps('sql_iv', 'k', 'sa', 'ea')",
      intervalFixture)
  }

  test("j22_interval_coverage via graft_interval_coverage") {
    check("j22_interval_coverage",
      "SELECT * FROM graft_interval_coverage('sql_iv', 'k', 'sa', 'ea')",
      intervalFixture)
  }

  test("j19_interval_overlap via graft_interval_overlap") {
    check("j19_interval_overlap",
      """SELECT a_id, b_id, overlap_len
        |FROM graft_interval_overlap('sql_j19_a', 'sql_j19_b',
        |  'ka', 'kb', 'sa', 'ea', 'sb', 'eb', 16, 5000)""".stripMargin,
      Seq("""CREATE OR REPLACE TEMP VIEW sql_j19_a AS
            |SELECT o_orderkey AS a_id, o_custkey % 5 AS ka,
            |  CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) AS sa,
            |  CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) + 20 AS ea
            |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_j19_b AS
          |SELECT l_orderkey * 10 + l_linenumber AS b_id, l_suppkey % 5 AS kb,
          |  CAST(datediff(l_shipdate, DATE '1990-01-01') AS BIGINT) AS sb,
          |  CAST(datediff(l_shipdate, DATE '1990-01-01') AS BIGINT) + 14 AS eb
          |FROM lineitem WHERE l_orderkey % 10 = 0""".stripMargin))
  }

  test("l5p_minhash_lsh_pairs_portable via graft_minhash_pairs_portable") {
    check("l5p_minhash_lsh_pairs_portable",
      "SELECT * FROM graft_minhash_pairs_portable('documents', 'text', 'doc_id', 3, 32, 16)")
  }

  test("l113_oph_minhash_pairs via graft_oph_minhash_pairs") {
    check("l113_oph_minhash_pairs",
      "SELECT * FROM graft_oph_minhash_pairs('documents', 'text', 'doc_id', 3, 32, 16)")
  }

  test("l6p_ngram_jaccard_neardups_portable via graft_near_dup_pairs_portable") {
    check("l6p_ngram_jaccard_neardups_portable",
      "SELECT * FROM graft_near_dup_pairs_portable('documents', 'text', 'doc_id', 5000, 3, 32, 16)")
  }

  test("w3_sessionize_batch via graft_sessionize") {
    check("w3_sessionize_batch",
      "SELECT * FROM graft_sessionize('events', 1800000)")
  }

  test("w8_event_funnel via graft_funnel") {
    check("w8_event_funnel",
      """SELECT * FROM graft_funnel('events_us', 'user_id', 'ts_us',
        |  'event_id', 'event_type', 'signup,view,click,purchase')""".stripMargin)
  }

  test("c24_expectation_gate via graft_expectation_gate") {
    check("c24_expectation_gate",
      """SELECT * FROM graft_expectation_gate('sql_c24',
        |  'r1_date_present:not_null:o_orderdate;r2_key_unique:unique:o_orderkey;r3_cust_unique:unique:o_custkey;r4_price_cap:in_range:total_cents:0,20000000;r5_prio_12:matches:o_orderpriority:^[12]-;r6_status_of:in_set:o_orderstatus:O|F')""".stripMargin,
      Seq("""CREATE OR REPLACE TEMP VIEW sql_c24 AS
            |SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
            |FROM orders""".stripMargin))
  }

  test("a14_percentiles via graft_percentiles") {
    check("a14_percentiles",
      """SELECT o_orderstatus, round(p50, 4) AS p50, round(p90, 4) AS p90,
        |  round(p99, 4) AS p99
        |FROM graft_percentiles('orders', 'o_orderstatus', 'o_totalprice',
        |  'p50:0.5,p90:0.9,p99:0.99')""".stripMargin)
  }

  test("a28_kaplan_meier via graft_kaplan_meier") {
    check("a28_kaplan_meier",
      "SELECT * FROM graft_kaplan_meier('sql_a28', 'grp', 't', 'ev')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_a28 AS
            |SELECT o_orderpriority AS grp, dayofyear(o_orderdate) AS t,
            |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
            |FROM orders""".stripMargin))
  }

  test("a32_autocorr via graft_autocorr") {
    check("a32_autocorr",
      "SELECT * FROM graft_autocorr('sql_a32', 'event_type', 'day', 'one', '1,2,7')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_a32 AS
            |SELECT event_type, ts_us div 86400000000 AS day,
            |  CAST(1 AS BIGINT) AS one FROM events_us""".stripMargin))
  }

  test("a36_seasonal_profile via graft_seasonal_profile") {
    check("a36_seasonal_profile",
      "SELECT * FROM graft_seasonal_profile('sql_a36', 'key', 'day', 'x', 7)",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_a36 AS
            |SELECT event_type AS key, ts_us div 86400000000 AS day,
            |  CAST(count(*) AS BIGINT) AS x FROM events_us GROUP BY 1, 2""".stripMargin))
  }

  test("u4_changed_keys via graft_changed_keys") {
    check("u4_changed_keys",
      "SELECT * FROM graft_changed_keys('sql_u4_old', 'sql_u4_neu', 'o_orderkey')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_u4_old AS
            |SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 THEN 'CHANGED'
            |  ELSE o_orderstatus END AS o_orderstatus FROM orders""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_u4_neu AS
          |SELECT o_orderkey, o_orderstatus FROM orders""".stripMargin))
  }

  test("l126_bradley_terry via graft_bradley_terry") {
    check("l126_bradley_terry",
      "SELECT * FROM graft_bradley_terry('sql_l126', 'winner', 'loser', 'n', 6)",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_l126 AS
            |WITH ft AS (SELECT user_id, event_type, min(ts_us) AS t0
            |  FROM events_us GROUP BY 1, 2)
            |SELECT
            |  CASE WHEN a.t0 < b.t0 THEN a.event_type ELSE b.event_type END AS winner,
            |  CASE WHEN a.t0 < b.t0 THEN b.event_type ELSE a.event_type END AS loser,
            |  count(*) AS n
            |FROM ft a JOIN ft b
            |  ON a.user_id = b.user_id AND a.event_type < b.event_type
            |WHERE a.t0 <> b.t0 GROUP BY 1, 2""".stripMargin))
  }

  test("l127_ngram_diversity via graft_ngram_diversity") {
    check("l127_ngram_diversity",
      "SELECT * FROM graft_ngram_diversity('documents', 'source', 'text', 3)")
  }

  test("a42_percentiles_rangepart via graft_percentiles_rangepart") {
    check("a42_percentiles_rangepart",
      """SELECT l_returnflag, round(p25, 4) AS p25, round(p50, 4) AS p50,
        |  round(p95, 4) AS p95
        |FROM graft_percentiles_rangepart('lineitem', 'l_returnflag',
        |  'l_extendedprice', 'p25:0.25,p50:0.5,p95:0.95', 32)""".stripMargin)
  }

  // ---- round-14 composites: the pipelines a SQL-only user runs whole ----

  test("c1_clinical_flatten via graft_clinical_flatten") {
    check("c1_clinical_flatten",
      """SELECT * FROM graft_clinical_flatten(
        |  'case:sql_c1_case:c_custkey; profile:sql_c1_profile:c_custkey:case:prof__:single; orders:sql_c1_orders:o_custkey:case',
        |  'case')""".stripMargin,
      Seq(s"""CREATE OR REPLACE TEMP VIEW sql_c1_case AS
             |SELECT c_custkey, c_name FROM parquet.`$dir/customer.parquet`""".stripMargin,
        s"""CREATE OR REPLACE TEMP VIEW sql_c1_profile AS
           |SELECT c_custkey, c_mktsegment, c_acctbal FROM parquet.`$dir/customer.parquet`""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_c1_orders AS
          |SELECT o_custkey, o_orderkey FROM orders""".stripMargin))
  }

  test("c3's diff gate via graft_publish_diff_gate") {
    prepared
    // identical tables -> the gate says skip (the r2 publish in c3)
    val same = spark.sql(
      "SELECT * FROM graft_publish_diff_gate('orders', 'orders')").collect()
    assert(same.map(_.toString).toSeq === Seq("[false,0,0]"))
    // a mutated candidate -> publish, with the one-way diff counts agreeing
    // with an independent plain-SQL EXCEPT ALL formulation
    spark.sql("""CREATE OR REPLACE TEMP VIEW sql_c3_cand AS
                |SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 THEN 'MUT'
                |  ELSE o_orderstatus END AS o_orderstatus FROM orders""".stripMargin)
    spark.sql("""CREATE OR REPLACE TEMP VIEW sql_c3_cur AS
                |SELECT o_orderkey, o_orderstatus FROM orders""".stripMargin)
    val gate = spark.sql(
      "SELECT * FROM graft_publish_diff_gate('sql_c3_cur', 'sql_c3_cand')").collect()(0)
    val wantOld = spark.sql(
      """SELECT count(*) FROM (SELECT DISTINCT * FROM sql_c3_cur
        |EXCEPT SELECT * FROM sql_c3_cand)""".stripMargin).collect()(0).getLong(0)
    val wantNew = spark.sql(
      """SELECT count(*) FROM (SELECT DISTINCT * FROM sql_c3_cand
        |EXCEPT SELECT * FROM sql_c3_cur)""".stripMargin).collect()(0).getLong(0)
    assert(gate.getBoolean(0) && wantOld > 0)
    assert(gate.getLong(1) === wantOld && gate.getLong(2) === wantNew)
  }

  test("c4_diff_qc_report via graft_added_rows/graft_removed_rows/graft_changed_keys") {
    check("c4_diff_qc_report",
      """SELECT 'added' AS check, o_orderkey
        |FROM graft_added_rows('sql_c4_old', 'sql_c4_neu', 'o_orderkey')
        |UNION ALL SELECT 'removed', o_orderkey
        |FROM graft_removed_rows('sql_c4_old', 'sql_c4_neu', 'o_orderkey')
        |UNION ALL SELECT 'changed', o_orderkey
        |FROM graft_changed_keys('sql_c4_old', 'sql_c4_neu', 'o_orderkey')
        |UNION ALL SELECT 'dup_key', l_orderkey FROM lineitem
        |GROUP BY l_orderkey HAVING count(*) >= 6""".stripMargin,
      Seq("""CREATE OR REPLACE TEMP VIEW sql_c4_old AS
            |SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 THEN 'MUT'
            |  ELSE o_orderstatus END AS o_orderstatus
            |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_c4_neu AS
          |SELECT o_orderkey, o_orderstatus FROM orders""".stripMargin))
  }

  test("c13_file_metadata_dag via graft_file_metadata_dag") {
    check("c13_file_metadata_dag",
      """SELECT o_orderkey, acl_ids, part_ids, n_items
        |FROM graft_file_metadata_dag('sql_c13_base', 'o_orderkey',
        |  'lineitem', 'l_orderkey',
        |  'acl_ids:l_suppkey:acl-:keep:unmapped; part_ids:l_partkey::multi',
        |  'n_items')""".stripMargin,
      Seq("CREATE OR REPLACE TEMP VIEW sql_c13_base AS SELECT o_orderkey FROM orders"))
  }

  test("c10_quant_pipeline via graft_melt_quant") {
    check("c10_quant_pipeline",
      """WITH rm AS (SELECT * FROM VALUES ('a0','al0'), ('a1','al1'),
        |    ('a2','al2'), ('a3','al3') AS t(aliquot_run_metadata_id, aliquot_id)),
        |  asmp AS (SELECT * FROM VALUES ('al0','sm0'), ('al1','sm1'),
        |    ('al2','sm0'), ('al3','sm1') AS t(aliquot_id, sample_id)),
        |  sc AS (SELECT * FROM VALUES ('sm0','case0'), ('sm1','case1')
        |    AS t(sample_id, case_id))
        |SELECT m.gene_symbol, m.aliquot_run_metadata_id, m.aliquot_submitter_id,
        |  rm.aliquot_id, asmp.sample_id, sc.case_id, m.protein_abundance_log2ratio
        |FROM graft_melt_quant('sql_c10_wide', 'Gene') m
        |JOIN rm USING (aliquot_run_metadata_id)
        |JOIN asmp USING (aliquot_id)
        |JOIN sc USING (sample_id)""".stripMargin,
      Seq("""CREATE OR REPLACE TEMP VIEW sql_c10_wide AS
            |SELECT concat('G', l_partkey) AS Gene,
            |  SUM(CASE WHEN l_suppkey % 4 = 0 THEN CAST(round(l_extendedprice*100) AS BIGINT) END) / 100.0D AS `a0:s0`,
            |  SUM(CASE WHEN l_suppkey % 4 = 1 THEN CAST(round(l_extendedprice*100) AS BIGINT) END) / 100.0D AS `a1:s1`,
            |  SUM(CASE WHEN l_suppkey % 4 = 2 THEN CAST(round(l_extendedprice*100) AS BIGINT) END) / 100.0D AS `a2:s2`,
            |  SUM(CASE WHEN l_suppkey % 4 = 3 THEN CAST(round(l_extendedprice*100) AS BIGINT) END) / 100.0D AS `a3:s3`
            |FROM lineitem GROUP BY 1""".stripMargin))
  }

  test("l51_curation_funnel via graft_curation_funnel") {
    check("l51_curation_funnel",
      "SELECT * FROM graft_curation_funnel('documents', 'doc_id', 'text', 'source', 50000)")
  }

  test("l48_source_cap via graft_cap_per_group") {
    check("l48_source_cap",
      "SELECT * FROM graft_cap_per_group('documents', 'doc_id', 'source', 15)")
  }

  test("c31_row_policy_audit via graft_policy_audit") {
    check("c31_row_policy_audit",
      """SELECT * FROM graft_policy_audit('sql_c31', 'bal_cents', 'c_nationkey',
        |  'emea_analyst=c_nationkey IN (1,2,3); auto_sales=c_mktsegment = "AUTOMOBILE"; high_value=bal_cents >= 500000; admin=true')""".stripMargin,
      Seq(s"""CREATE OR REPLACE TEMP VIEW sql_c31 AS
             |SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             |FROM parquet.`$dir/customer.parquet`""".stripMargin))
  }

  test("c32_erasure_cascade via graft_erasure_cascade") {
    check("c32_erasure_cascade",
      """SELECT * FROM graft_erasure_cascade('customer', 'c_custkey',
        |  'sql_c32_req',
        |  'orders:o_custkey:o_orderkey; lineitem:l_orderkey:l_orderkey*10+l_linenumber')""".stripMargin,
      Seq(s"""CREATE OR REPLACE TEMP VIEW customer AS
             |SELECT * FROM parquet.`$dir/customer.parquet`""".stripMargin,
        """CREATE OR REPLACE TEMP VIEW sql_c32_req AS
          |SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0""".stripMargin))
  }

  test("l130_rrf_fusion via graft_rrf_fuse") {
    prepared
    // the three BM25 lists as temp views through the Scala macro (their
    // own TVF path is spec'd above via l40); fusion drives through SQL
    val docs = spark.table("documents")
    Seq(Seq("join", "vector", "filter", "merge"),
      Seq("hash", "sort", "shuffle"),
      Seq("stream", "filter", "window")).zipWithIndex.foreach { case (ts, i) =>
      graft.llm.Index.bm25TopK(docs, "doc_id", "text", ts, topK = 25)
        .createOrReplaceTempView(s"sql_rrf_l$i")
    }
    check("l130_rrf_fusion",
      "SELECT * FROM graft_rrf_fuse('sql_rrf_l0,sql_rrf_l1,sql_rrf_l2', 'doc_id', 'score', 60, 20)")
  }

  // shared keep-first labeling fixture for the l131/l132 TVFs — the
  // registry fixture replayed in SQL (struct-min ≡ row_number() = 1)
  private val labView: Seq[String] = Seq(
    """CREATE OR REPLACE TEMP VIEW sql_lab AS
      |SELECT item, annot, label FROM (
      |  SELECT event_id % 500 AS item, user_id % 5 AS annot,
      |    event_type AS label,
      |    row_number() OVER (PARTITION BY event_id % 500, user_id % 5
      |      ORDER BY ts_us, event_id) AS rn
      |  FROM events_us) WHERE rn = 1""".stripMargin)

  test("l131_annotator_agreement via graft_cohen_kappa") {
    check("l131_annotator_agreement",
      "SELECT * FROM graft_cohen_kappa('sql_lab', 'item', 'annot', 'label')",
      labView)
  }

  test("l132_label_resolution via graft_resolve_labels") {
    check("l132_label_resolution",
      "SELECT * FROM graft_resolve_labels('sql_lab', 'item', 'annot', 'label')",
      labView)
  }

  test("l133_length_bias via graft_length_bias") {
    check("l133_length_bias",
      "SELECT * FROM graft_length_bias('sql_l133', 'chosen_len', 'rejected_len')",
      Seq("""CREATE OR REPLACE TEMP VIEW sql_l133 AS
            |WITH c AS (SELECT doc_id % 100 AS prompt_id, doc_id AS cid,
            |    CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS score,
            |    CAST(length(text) AS BIGINT) AS len
            |  FROM documents WHERE text IS NOT NULL),
            |r AS (SELECT prompt_id, len, score, cid,
            |    row_number() OVER (PARTITION BY prompt_id
            |      ORDER BY score DESC, cid DESC) AS rb,
            |    row_number() OVER (PARTITION BY prompt_id
            |      ORDER BY score ASC, cid ASC) AS rw
            |  FROM c)
            |SELECT prompt_id,
            |  max(CASE WHEN rb = 1 THEN len END) AS chosen_len,
            |  max(CASE WHEN rw = 1 THEN len END) AS rejected_len
            |FROM r GROUP BY 1""".stripMargin))
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
    // an UNQUOTED identifier argument must surface a readable error, not
    // an internal UnresolvedException (round-13 ADVICE fix): Spark 4's
    // analyzer reports UNRESOLVED_COLUMN for the identifier itself; the
    // strArg guard catches the same shape on any path that reaches the
    // builder (e.g. programmatic plans), where the friendly message fires
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_mad(lineitem, 'l_returnflag', 'l_quantity')").collect()
    }
    assert(e3.getMessage.contains("cannot be resolved") ||
      e3.getMessage.contains("must be a string literal"), e3.getMessage)
    // a fractional numeric literal must be rejected, never truncated
    val e4 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_trimmed_mean('lineitem', 'l_returnflag', 'l_quantity', 2.5)").collect()
    }
    assert(e4.getMessage.toLowerCase.contains("integer"), e4.getMessage)
  }
}
