package graft.queries

import org.apache.spark.sql.functions._
import Registry.td

/**
 * SURVEY §2.3 — join surface (J1–J11) over the driver's testdata.
 *
 * Scale notes (100 TB posture): nation/region/part-word dims are broadcast
 * (`broadcast()` hints below) so the big fact side never shuffles for them;
 * fact⋈fact joins shuffle on their equi-keys and are AQE-planned.
 */
object JoinQueries {

  // Decimal-exact money sum: deterministic under parallelism and identical
  // across Spark/DuckDB (see Registry hash-stability rules).
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,6)")).cast("double")

  val all: Seq[(String, Q)] = Seq(

    // J1 — inner equi-join chain, 5-way, compound shape
    //   (per_sample_file_gdc.py:66-76; quant_data_matrix_pdc.py:631-640)
    "j1_inner_chain_revenue" -> Q(
      (s, dir) => {
        val l = td(s, dir, "lineitem"); val o = td(s, dir, "orders")
        val c = td(s, dir, "customer"); val n = td(s, dir, "nation")
        val r = td(s, dir, "region")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          // Exact integer-cents arithmetic: money cols are 2dp, so
          // round(x*100) is an exact integral double on both engines —
          // immune to double→decimal tie-rounding divergence.
          .agg(
            (sum(round(col("l_extendedprice") * 100).cast("long") *
                 (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
              / lit(1000000.0)).as("revenue"),
            count(lit(1)).cast("long").as("n_items"))
      },
      Some("""SELECT r_name,
             |CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (10000 - CAST(round(l_discount*10000) AS BIGINT))) AS BIGINT) / 1000000.0 AS revenue,
             |CAST(count(*) AS BIGINT) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // J2 — LEFT OUTER join keeping zero-order customers
    //   (create_tables_file_metadata_gdc.py:127-136)
    "j2_left_outer_counts" -> Q(
      (s, dir) => {
        val c = td(s, dir, "customer"); val o = td(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).cast("long").as("order_cnt"))
      },
      Some("""SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS order_cnt
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey""".stripMargin)),

    // J3 — FULL OUTER join of two per-nation censuses
    //   (compare_clinical_gdc_api_releases.py:91-96)
    "j3_full_outer_census" -> Q(
      (s, dir) => {
        val c = td(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).cast("long").as("c_cnt"))
        val p = td(s, dir, "supplier").groupBy(col("s_nationkey").as("nk2"))
          .agg(count(lit(1)).cast("long").as("s_cnt"))
        c.join(p, c("nk") === p("nk2"), "full")
          .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
            coalesce(col("c_cnt"), lit(0L)).as("c_cnt"),
            coalesce(col("s_cnt"), lit(0L)).as("s_cnt"))
      },
      Some("""WITH c AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS c_cnt FROM customer GROUP BY 1),
             |p AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS s_cnt FROM supplier GROUP BY 1)
             |SELECT COALESCE(c.nk, p.nk) AS nationkey, COALESCE(c_cnt, 0) AS c_cnt,
             |COALESCE(s_cnt, 0) AS s_cnt FROM c FULL OUTER JOIN p ON c.nk = p.nk""".stripMargin)),

    // J4 — compound-predicate join (AND of two keys)
    //   (open_somatic_mut.py:98-99; per_sample_file_gdc.py:68-72)
    "j4_compound_key_join" -> Q(
      (s, dir) => {
        val l = td(s, dir, "lineitem")
        val a = l.groupBy("l_partkey", "l_suppkey").agg(dsum(col("l_quantity")).as("qty_all"))
        val b = l.filter(col("l_returnflag") === "R")
          .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .agg(dsum(col("l_quantity")).as("qty_returned"))
        a.join(b, a("l_partkey") === b("pk") && a("l_suppkey") === b("sk"))
          .select(a("l_partkey"), a("l_suppkey"), col("qty_all"), col("qty_returned"))
      },
      Some("""WITH a AS (SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty_all
             |  FROM lineitem GROUP BY 1,2),
             |b AS (SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty_returned
             |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1,2)
             |SELECT a.l_partkey, a.l_suppkey, qty_all, qty_returned
             |FROM a JOIN b ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey""".stripMargin)),

    // J5 — expression join on computed key, LEFT(x,n)-style (RNA_seq.py:120)
    "j5_expression_join" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders"); val c = td(s, dir, "customer")
        o.join(c, concat(lit("Customer#"), lpad(o("o_custkey").cast("string"), 9, "0")) === c("c_name"))
          .select(o("o_orderkey"), c("c_name"), c("c_mktsegment"))
      },
      Some("""SELECT o_orderkey, c_name, c_mktsegment FROM orders JOIN customer
             |ON 'Customer#' || lpad(CAST(o_custkey AS VARCHAR), 9, '0') = c_name""".stripMargin)),

    // J6 — semi join (EXISTS-style, create_tables_clinical_gdc.py:375-379)
    "j6_semi_join" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders")
        val l = td(s, dir, "lineitem").filter(col("l_quantity") > 45)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_orderstatus")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""".stripMargin)),

    // J7 — anti join (compare_and_publish_tables.py:127-136)
    "j7_anti_join" -> Q(
      (s, dir) => {
        val p = td(s, dir, "part"); val l = td(s, dir, "lineitem")
        p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
          .select("p_partkey", "p_name")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)""".stripMargin)),

    // J8 — alternate-parent joins + COALESCE (create_tables_visit_icdc.py:35-52)
    "j8_coalesce_alt_parent" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders")
        val c1 = td(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("k1"), col("c_name").as("n1"))
        val c2 = td(s, dir, "customer").filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey").as("k2"), col("c_name").as("n2"))
        o.join(c1, o("o_custkey") === col("k1"), "left")
          .join(c2, o("o_custkey") === col("k2"), "left")
          .select(o("o_orderkey"), coalesce(col("n1"), col("n2"), lit("unmapped")).as("parent_name"))
      },
      Some("""SELECT o_orderkey, COALESCE(c1.c_name, c2.c_name, 'unmapped') AS parent_name
             |FROM orders
             |LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c1 ON o_custkey = c1.c_custkey
             |LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY') c2 ON o_custkey = c2.c_custkey""".stripMargin)),

    // J9 — self-join on CTE branches, rejoined to different dims + UNION
    //   (per_sample_file_gdc.py:87-206); includes CAST(null AS STRING)
    //   placeholders (per_sample_file_gdc.py:60-62)
    "j9_branch_union" -> Q(
      (s, dir) => {
        val l = td(s, dir, "lineitem")
        val p = td(s, dir, "part"); val sup = td(s, dir, "supplier")
        val big = l.filter(col("l_quantity") > 25)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("l_linenumber"), lit("big").as("branch"),
            col("p_name").as("part_name"), lit(null).cast("string").as("supp_name"))
        val small = l.filter(col("l_quantity") <= 25)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("l_linenumber"), lit("small").as("branch"),
            lit(null).cast("string").as("part_name"), col("s_name").as("supp_name"))
        big.unionByName(small)
      },
      Some("""SELECT l_orderkey, l_linenumber, 'big' AS branch, p_name AS part_name,
             |CAST(NULL AS VARCHAR) AS supp_name
             |FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_quantity > 25
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'small' AS branch, CAST(NULL AS VARCHAR),
             |s_name FROM lineitem JOIN supplier ON l_suppkey = s_suppkey WHERE l_quantity <= 25""".stripMargin)),

    // J10 — lateral array join / UNNEST (build_pdc_case_metadata.py:171-229)
    "j10_lateral_unnest" -> Q(
      (s, dir) => td(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).cast("long").as("cnt")),
      Some("""SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM
             |(SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
             |GROUP BY word""".stripMargin)),

    // J11 — positional zip-join via posexplode / UNNEST WITH OFFSET
    //   (compare_clinical_gdc_api_releases.py:152-158)
    "j11_positional_zip" -> Q(
      (s, dir) => td(s, dir, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .select(col("p_partkey"), col("pos").cast("int").as("pos"), col("word")),
      Some("""SELECT p_partkey, CAST(g.i - 1 AS INTEGER) AS pos, t.words[g.i] AS word
             |FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part) t
             |CROSS JOIN UNNEST(range(1, len(t.words)+1)) AS g(i)""".stripMargin))
  )
}
