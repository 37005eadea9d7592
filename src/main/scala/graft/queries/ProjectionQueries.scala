package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Filters
import graft.normalize.Normalize
import Registry.td

/**
 * SURVEY §2.2 — projections / filters / predicates (P1–P9), each over the
 * driver's testdata with a DuckDB oracle.
 *
 * Reference shapes cited per query; see SURVEY.md §2.2 for file:line.
 */
object ProjectionQueries {

  val all: Seq[(String, Q)] = Seq(

    // P1 — projection with alias + prefix (create_tables_clinical_gdc.py:280-311)
    "p1_projection_prefix" -> Q(
      (s, dir) => {
        val prefix = "cust__"
        val cols = Seq("c_custkey", "c_name", "c_mktsegment")
        td(s, dir, "customer").select(cols.map(c => col(c).as(prefix + c)): _*)
      },
      Some("""SELECT c_custkey AS cust__c_custkey, c_name AS cust__c_name,
             |c_mktsegment AS cust__c_mktsegment FROM customer""".stripMargin)),

    // P2 — SELECT * EXCEPT (RNA_seq.py:69; lookup.py:680-688)
    "p2_select_except" -> Q(
      (s, dir) => td(s, dir, "lineitem").drop("l_shipdate", "l_extendedprice", "l_discount", "l_tax"),
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             |l_returnflag, l_linestatus FROM lineitem""".stripMargin)),

    // P3 — SELECT DISTINCT (RNA_seq.py:30, per_sample_file_gdc.py:43)
    "p3_distinct" -> Q(
      (s, dir) => td(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // P4 — equality / IN / LIKE / NOT LIKE predicates (per_sample_file_gdc.py:73-76)
    "p4_predicates" -> Q(
      (s, dir) => td(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" &&
          col("o_orderpriority").like("%URGENT") &&
          !col("o_orderpriority").like("%NOT%") &&
          (col("o_custkey") % 10).isin(0L, 1L, 2L, 3L))
        .select("o_orderkey", "o_custkey", "o_orderpriority"),
      Some("""SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
             |WHERE o_orderstatus = 'O' AND o_orderpriority LIKE '%URGENT'
             |AND o_orderpriority NOT LIKE '%NOT%' AND (o_custkey % 10) IN (0,1,2,3)""".stripMargin)),

    // P5 — IN-subquery = left-semi join (create_tables_clinical_gdc.py:375-379)
    "p5_in_subquery_semi" -> Q(
      (s, dir) => {
        val c = td(s, dir, "customer"); val o = td(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)")),

    // P6 — NOT-IN subquery = left-anti join (create_tables_file_metadata_gdc.py:137-140)
    "p6_not_in_subquery_anti" -> Q(
      (s, dir) => {
        val c = td(s, dir, "customer"); val o = td(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)")),

    // P7 — config-dict filter builder (common_etl/support.py:399-431, 503-539)
    "p7_config_filter" -> Q(
      (s, dir) => td(s, dir, "part")
        .filter(Filters.configFilter(Seq(
          "p_brand" -> Filters.In(Seq("Brand#13", "Brand#5", "Brand#19")),
          "p_name"  -> Filters.Like("%widget%"),
          "p_size"  -> Filters.NotLike("4%"))))
        .select("p_partkey", "p_name", "p_brand", "p_size"),
      Some("""SELECT p_partkey, p_name, p_brand, p_size FROM part
             |WHERE p_brand IN ('Brand#13','Brand#5','Brand#19')
             |AND p_name LIKE '%widget%' AND CAST(p_size AS VARCHAR) NOT LIKE '4%'""".stripMargin)),

    // P8 — null-marker / boolean / trivial-float normalization (data_helpers.py:447-486)
    "p8_normalize_values" -> Q(
      (s, dir) => {
        val messy = td(s, dir, "nation").withColumn("raw",
          expr("""CASE CAST(n_nationkey % 9 AS INT)
                 |  WHEN 0 THEN 'NA' WHEN 1 THEN '  spark  ' WHEN 2 THEN '100.0'
                 |  WHEN 3 THEN 'YES' WHEN 4 THEN 'None' WHEN 5 THEN '0042'
                 |  WHEN 6 THEN '+17' WHEN 7 THEN '2.01803E+13' ELSE n_name END""".stripMargin))
        messy.select(col("n_nationkey"), Normalize.normalizeValue(col("raw")).as("norm"))
      },
      Some("""WITH t AS (SELECT n_nationkey, CASE CAST(n_nationkey % 9 AS INTEGER)
             |  WHEN 0 THEN 'NA' WHEN 1 THEN '  spark  ' WHEN 2 THEN '100.0'
             |  WHEN 3 THEN 'YES' WHEN 4 THEN 'None' WHEN 5 THEN '0042'
             |  WHEN 6 THEN '+17' WHEN 7 THEN '2.01803E+13' ELSE n_name END AS raw FROM nation)
             |SELECT n_nationkey, CASE
             |  WHEN lower(trim(raw)) IN ('na','n/a','none','','--','-','null','not reported',
             |    'unknown','[not available]','[not applicable]','[unknown]','.') THEN NULL
             |  WHEN lower(trim(raw)) IN ('false','no') THEN 'False'
             |  WHEN lower(trim(raw)) IN ('true','yes') THEN 'True'
             |  WHEN regexp_full_match(trim(raw), '^0[0-9]+$') THEN trim(raw)
             |  WHEN regexp_full_match(trim(raw), '^[+-]?[0-9]{1,18}$')
             |    THEN CAST(CAST(trim(raw) AS BIGINT) AS VARCHAR)
             |  WHEN regexp_full_match(trim(raw), '^[+-]?[0-9]{1,18}\.0*$')
             |    THEN CAST(CAST(CAST(trim(raw) AS DOUBLE) AS BIGINT) AS VARCHAR)
             |  WHEN regexp_full_match(trim(raw), '^[+-]?[0-9]+(\.[0-9]+)?[eE][+-]?[0-9]{1,2}$')
             |    AND TRY_CAST(trim(raw) AS DOUBLE) = floor(TRY_CAST(trim(raw) AS DOUBLE))
             |    AND abs(TRY_CAST(trim(raw) AS DOUBLE)) < 9.0e15
             |    THEN CAST(CAST(TRY_CAST(trim(raw) AS DOUBLE) AS BIGINT) AS VARCHAR)
             |  ELSE trim(raw) END AS norm FROM t""".stripMargin)),

    // P9 — concat-length guard → 'multi' (create_tables_file_metadata_gdc.py:44-75)
    "p9_concat_to_multi" -> Q(
      (s, dir) => td(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(graft.ops.Agg.stringAggDistinctOrdered(col("o_orderkey").cast("string"), ";").as("ids"))
        .select(col("o_custkey"),
          Normalize.convertConcatToMulti(col("ids")).as("agg_ids")),
      Some("""WITH t AS (SELECT o_custkey,
             |  string_agg(DISTINCT CAST(o_orderkey AS VARCHAR), ';'
             |             ORDER BY CAST(o_orderkey AS VARCHAR)) AS ids,
             |  count(DISTINCT o_orderkey) AS n FROM orders GROUP BY o_custkey)
             |SELECT o_custkey, CASE WHEN n > 8 THEN 'multi' ELSE ids END AS agg_ids FROM t""".stripMargin))
  )
}
