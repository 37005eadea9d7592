package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Diff
import Registry.td

/**
 * SURVEY §2.5 windows (W1), §2.6 sorts/limits (O1–O5), §2.7 set ops (U1–U4).
 *
 * Scale notes: W1's unordered partition-MAX is a single shuffle on the
 * partition key; top-k via orderBy+limit compiles to TakeOrderedAndProject
 * (no full sort at scale); set ops hash-shuffle both sides once.
 */
object WindowSortSetQueries {

  val all: Seq[(String, Q)] = Seq(

    // W1 — MAX() OVER (PARTITION BY), no frame/order
    //   (build_gdc_file_clinical_tables_TCGA.py:627-629)
    "w1_max_over_partition" -> Q(
      (s, dir) => td(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        max(col("o_totalprice")).over(Window.partitionBy(col("o_custkey"))).as("cust_max_price")),
      Some("""SELECT o_orderkey, o_custkey,
             |MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_max_price
             |FROM orders""".stripMargin)),

    // O1 — ORDER BY on output (quant_data_matrix_pdc.py:181)
    "o1_order_by" -> Q(
      (s, dir) => td(s, dir, "nation").orderBy(col("n_name").desc)
        .select("n_nationkey", "n_name"),
      Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_name DESC")),

    // O2 — ORDER BY + LIMIT 1 latest-version lookup (lookup.py:323-330);
    //   unique tiebreak on the key for determinism
    "o2_order_by_limit1" -> Q(
      (s, dir) => td(s, dir, "orders")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc).limit(1)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date")),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date FROM orders
             |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin)),

    // O3 — LIMIT n / top-k (support.py:429); TakeOrderedAndProject in Spark
    "o3_top_k" -> Q(
      (s, dir) => td(s, dir, "part")
        .orderBy(col("p_retailprice").desc, col("p_partkey").desc).limit(10)
        .select("p_partkey", "p_name", "p_retailprice"),
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
             |ORDER BY p_retailprice DESC, p_partkey DESC LIMIT 10""".stripMargin)),

    // O5 — custom comparator sort (quant_data_matrix_pdc.py:299-330): bespoke
    //   ordering re-expressed as a computed sort key (class, length, value);
    //   LIMIT makes the chosen order observable in the result set.
    "o5_custom_comparator" -> Q(
      (s, dir) => td(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          when(col("lang").isin("en", "de"), 0).otherwise(1).cast("int").as("lang_class"))
        .orderBy(col("lang_class"), length(col("source")).desc, col("doc_id")).limit(20),
      Some("""SELECT doc_id, source, CAST(CASE WHEN lang IN ('en','de') THEN 0 ELSE 1 END AS INTEGER) AS lang_class
             |FROM documents ORDER BY 3, length(source) DESC, doc_id LIMIT 20""".stripMargin)),

    // U1 — UNION ALL via unionByName (per_sample_file_gdc.py:258-264)
    "u1_union_all" -> Q(
      (s, dir) => {
        val c = td(s, dir, "customer").select(col("c_name").as("name"), lit("customer").as("kind"))
        val p = td(s, dir, "supplier").select(lit("supplier").as("kind"), col("s_name").as("name"))
        c.unionByName(p)
      },
      Some("""SELECT c_name AS name, 'customer' AS kind FROM customer
             |UNION ALL SELECT s_name, 'supplier' FROM supplier""".stripMargin)),

    // U2 — EXCEPT DISTINCT (compare_and_publish_tables.py:47-53)
    "u2_except_distinct" -> Q(
      (s, dir) => Diff.exceptDistinct(
        td(s, dir, "customer").select(col("c_nationkey").as("nationkey")),
        td(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier""".stripMargin)),

    // U3 — symmetric diff publish gate (lookup.py:692-705), side-tagged
    "u3_symmetric_diff" -> Q(
      (s, dir) => {
        val old = td(s, dir, "orders").filter(col("o_orderkey") % 7 =!= 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val neu = td(s, dir, "orders").filter(col("o_orderkey") % 5 =!= 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        Diff.symmetricDiff(old, neu)
      },
      Some("""WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
             |neu AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 5 <> 0)
             |SELECT *, 'old' AS _side FROM (SELECT * FROM old EXCEPT SELECT * FROM neu)
             |UNION ALL SELECT *, 'new' AS _side FROM (SELECT * FROM neu EXCEPT SELECT * FROM old)""".stripMargin)),

    // U4 — INTERSECT DISTINCT / changed-key detection
    //   (compare_and_publish_tables.py:306-331)
    "u4_changed_keys" -> Q(
      (s, dir) => {
        val old = td(s, dir, "orders").select(col("o_orderkey"),
          when(col("o_orderkey") % 11 === 0, lit("CHANGED")).otherwise(col("o_orderstatus")).as("o_orderstatus"))
        val neu = td(s, dir, "orders").select("o_orderkey", "o_orderstatus")
        Diff.changedKeys(old, neu, Seq("o_orderkey"))
      },
      Some("""WITH old AS (SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 THEN 'CHANGED' ELSE o_orderstatus END AS o_orderstatus FROM orders),
             |neu AS (SELECT o_orderkey, o_orderstatus FROM orders)
             |SELECT o_orderkey FROM (SELECT * FROM old EXCEPT SELECT * FROM neu)
             |INTERSECT SELECT o_orderkey FROM (SELECT * FROM neu EXCEPT SELECT * FROM old)""".stripMargin))
  )
}
