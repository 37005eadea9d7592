package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Agg
import Registry.{td, tdw}

/**
 * SURVEY §2.4 — aggregation surface (A1–A11) over the driver's testdata.
 *
 * Scale notes: every groupBy below is a single hash-aggregate with map-side
 * partial aggregation (Catalyst default); STRING_AGG variants use
 * collect_list/set which partial-aggregate too. No driver-side merges — A11's
 * reference dict-merge is re-expressed as a join DAG.
 */
object AggQueries {

  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,6)")).cast("double")

  val all: Seq[(String, Q)] = Seq(

    // A1 — GROUP BY + COUNT (create_tables_clinical_gdc.py:332-337)
    "a1_groupby_count" -> Q(
      (s, dir) => td(s, dir, "orders").groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).cast("long").as("cnt")),
      Some("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
             |FROM orders GROUP BY 1, 2""".stripMargin)),

    // A2 — conditional aggregate / pivoted null census
    //   (create_tables_clinical_gdc.py:155-212)
    "a2_conditional_null_census" -> Q(
      (s, dir) => td(s, dir, "orders")
        .withColumn("prio_opt", when(col("o_orderpriority") === "3-MEDIUM", lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
        .withColumn("status_opt", when(col("o_orderstatus") === "P", lit(null).cast("string"))
          .otherwise(col("o_orderstatus")))
        .groupBy()
        .agg(Agg.nonNullCount(col("prio_opt")).as("prio_count"),
          Agg.nonNullCount(col("status_opt")).as("status_count"),
          count(lit(1)).cast("long").as("total_count")),
      Some("""SELECT
             |CAST(SUM(CASE WHEN nullif(o_orderpriority, '3-MEDIUM') IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS prio_count,
             |CAST(SUM(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS status_count,
             |CAST(count(*) AS BIGINT) AS total_count FROM orders""".stripMargin)),

    // A3 — HAVING filter (create_tables_clinical_gdc.py:42-55)
    "a3_having" -> Q(
      (s, dir) => td(s, dir, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).cast("long").as("cnt"))
        .filter(col("cnt") > 10),
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt FROM orders
             |GROUP BY o_custkey HAVING count(*) > 10""".stripMargin)),

    // A4 — STRING_AGG ordered + DISTINCT variants
    //   (create_tables_file_metadata_gdc.py:146-211)
    "a4_string_agg_ordered" -> Q(
      (s, dir) => td(s, dir, "customer").groupBy("c_nationkey")
        .agg(Agg.stringAggDistinctOrdered(col("c_mktsegment"), ";").as("segments"),
          Agg.stringAggOrdered(col("c_name"), ";").as("names")),
      Some("""SELECT c_nationkey,
             |string_agg(DISTINCT c_mktsegment, ';' ORDER BY c_mktsegment) AS segments,
             |string_agg(c_name, ';' ORDER BY c_name) AS names
             |FROM customer GROUP BY c_nationkey""".stripMargin)),

    // A5 — ARRAY_TO_STRING(ARRAY_AGG(x)) (build_pdc_file_metadata.py:168, 197)
    "a5_array_agg_to_string" -> Q(
      (s, dir) => td(s, dir, "supplier").groupBy("s_nationkey")
        .agg(Agg.arrayAggToString(col("s_name"), ";").as("suppliers")),
      Some("""SELECT s_nationkey, string_agg(s_name, ';' ORDER BY s_name) AS suppliers
             |FROM supplier GROUP BY s_nationkey""".stripMargin)),

    // A6 — COUNT(*) scalar (shared_test_functions.py:84-88)
    "a6_count_star" -> Q(
      (s, dir) => td(s, dir, "lineitem").agg(count(lit(1)).cast("long").as("n")),
      Some("SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem")),

    // A7 — COUNT(DISTINCT), multi-column (common_etl/support.py:2219-2228)
    "a7_count_distinct" -> Q(
      (s, dir) => td(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).cast("long").as("d_part"),
        countDistinct(col("l_suppkey")).cast("long").as("d_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).cast("long").as("d_pair")),
      Some("""SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS d_part,
             |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS d_supp,
             |CAST(count(DISTINCT (l_partkey, l_suppkey)) AS BIGINT) AS d_pair FROM lineitem""".stripMargin)),

    // A8 — wide GROUP BY dedup-merge with pooled STRING_AGG (RNA_seq.py:161-215)
    "a8_wide_groupby_merge" -> Q(
      (s, dir) => tdw(s, dir, "lineitem").groupBy(
        "l_orderkey", "l_returnflag", "l_linestatus")
        .agg(Agg.stringAggDistinctOrdered(col("l_linenumber").cast("string"), ";").as("linenumbers"),
          dsum(col("l_quantity")).as("qty")),
      Some("""SELECT l_orderkey, l_returnflag, l_linestatus,
             |string_agg(DISTINCT CAST(l_linenumber AS VARCHAR), ';' ORDER BY CAST(l_linenumber AS VARCHAR)) AS linenumbers,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
             |FROM lineitem GROUP BY 1, 2, 3""".stripMargin)),

    // A9 — grouped distinct-of-struct via TO_JSON_STRING group key
    //   (build_gdc_file_clinical_tables_TCGA.py:620-625)
    "a9_distinct_of_struct" -> Q(
      (s, dir) => Agg.distinctOfStruct(
        td(s, dir, "orders").select("o_orderstatus", "o_orderpriority"),
        Seq("o_orderstatus", "o_orderpriority")),
      Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")),

    // A10 — null census via TO_JSON_STRING + REGEXP_EXTRACT_ALL
    //   (build_gdc_file_clinical_tables_TCGA.py:274-295)
    "a10_null_census_json" -> Q(
      (s, dir) => Agg.nullCensusJson(
        tdw(s, dir, "orders").select(
          when(col("o_orderpriority") === "3-MEDIUM", lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("prio_opt"),
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("status_opt"),
          col("o_orderkey"))),
      Some("""WITH t AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS prio_opt,
             |  nullif(o_orderstatus, 'P') AS status_opt, o_orderkey FROM orders),
             |c AS (SELECT 'prio_opt' AS column_name, CAST(count(*) - count(prio_opt) AS BIGINT) AS null_count FROM t
             |  UNION ALL SELECT 'status_opt', CAST(count(*) - count(status_opt) AS BIGINT) FROM t
             |  UNION ALL SELECT 'o_orderkey', CAST(count(*) - count(o_orderkey) AS BIGINT) FROM t)
             |SELECT * FROM c WHERE null_count > 0""".stripMargin)),

    // A11 — the reference's driver-side dict merge re-expressed as a join DAG
    //   (create_tables_file_metadata_gdc.py:78-438): base + aggregate branches
    //   LEFT-joined on, with IFNULL defaults (create_tables_clinical_gdc.py:471-472)
    "a11_merge_join_dag" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders")
        val l = td(s, dir, "lineitem")
        val counts = l.groupBy(col("l_orderkey").as("k1"))
          .agg(count(lit(1)).cast("long").as("item_cnt"))
        val flags = l.groupBy(col("l_orderkey").as("k2"))
          .agg(Agg.stringAggDistinctOrdered(col("l_returnflag"), ";").as("flags"))
        o.join(counts, o("o_orderkey") === col("k1"), "left")
          .join(flags, o("o_orderkey") === col("k2"), "left")
          .select(o("o_orderkey"),
            coalesce(col("item_cnt"), lit(0L)).as("item_cnt"),
            coalesce(col("flags"), lit("none")).as("flags"))
      },
      Some("""SELECT o_orderkey, COALESCE(c.item_cnt, 0) AS item_cnt, COALESCE(f.flags, 'none') AS flags
             |FROM orders
             |LEFT JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS item_cnt FROM lineitem GROUP BY 1) c
             |  ON o_orderkey = c.l_orderkey
             |LEFT JOIN (SELECT l_orderkey, string_agg(DISTINCT l_returnflag, ';' ORDER BY l_returnflag) AS flags
             |  FROM lineitem GROUP BY 1) f ON o_orderkey = f.l_orderkey""".stripMargin))
  )
}
