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

    // O7 — KEYSET (cursor) pagination (Paging.keysetPage): the outbound
    //   page-serving shape for any large-table export API — "first 50
    //   rows strictly after the cursor (date, key)" as a lexicographic
    //   tuple predicate that pushes to the scan + one
    //   TakeOrderedAndProject, O(page) per call where OFFSET re-sorts and
    //   discards N·page rows. (o_orderdate, o_orderkey) is a unique total
    //   order, so pages can't skip or repeat at duplicate-date boundaries
    "o7_keyset_pagination" -> Q(
      (s, dir) => graft.ops.Paging.keysetPage(
        td(s, dir, "orders").select(col("o_orderdate"), col("o_orderkey"),
          col("o_orderstatus")),
        Seq("o_orderdate" -> lit("1995-06-15").cast("timestamp"),
          "o_orderkey" -> lit(0L)),
        pageSize = 50),
      Some("""SELECT o_orderdate, o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderdate > TIMESTAMP '1995-06-15'
             |   OR (o_orderdate = TIMESTAMP '1995-06-15' AND o_orderkey > 0)
             |ORDER BY o_orderdate, o_orderkey LIMIT 50""".stripMargin)),

    // O6 — the LITERAL Swiss-Prot id-age rule (quant_data_matrix_pdc.py:
    //   237-330): accession validator filters a protein list, then the
    //   age comparator (6-char before 10-char, letter class P<Q<O<A..N<R..Z,
    //   digit at idx 1) orders the ids. Accessions are synthesized
    //   deterministically from s_suppkey so O/P/Q/A/R classes and both
    //   lengths all appear. Global row_number is fine here: a verification
    //   query over the (small) supplier dim, not a fact-table scan.
    "o6_swissprot_age_sort" -> Q(
      (s, dir) => {
        import graft.clinical.UniProt
        val k = col("s_suppkey")
        def d(n: org.apache.spark.sql.Column) = n.cast("string")
        val letter = element_at(
          array(lit("P"), lit("Q"), lit("O"), lit("A"), lit("R")), (k % 5 + 1).cast("int"))
        val acc6 = concat(letter, d(k % 10), lit("BC"), d((k * 7) % 10), d((k * 3) % 10))
        val acc10 = concat(lit("B"), d(k % 10), lit("CD"), d((k * 7) % 10), d((k * 3) % 10),
          lit("FG"), d((k * 9) % 10), d(k % 10))
        val acc = when(k % 2 === 0, acc6).otherwise(acc10)
        val proteins = concat(lit("ZZZZZZ;"), acc, lit(";A12345")) // invalid flankers
        td(s, dir, "supplier")
          .select(acc.as("acc"), UniProt.filterAccessions(proteins).as("uniprotkb_ids"))
          .withColumn("age_rank", row_number().over(
            Window.orderBy(UniProt.swissprotAgeKey(col("acc")), col("acc"))).cast("long"))
      },
      Some(s"""WITH s AS (SELECT
             |  CASE WHEN s_suppkey % 2 = 0 THEN
             |    (CASE s_suppkey % 5 WHEN 0 THEN 'P' WHEN 1 THEN 'Q' WHEN 2 THEN 'O'
             |      WHEN 3 THEN 'A' ELSE 'R' END)
             |    || CAST(s_suppkey % 10 AS VARCHAR) || 'BC'
             |    || CAST((s_suppkey * 7) % 10 AS VARCHAR) || CAST((s_suppkey * 3) % 10 AS VARCHAR)
             |  ELSE 'B' || CAST(s_suppkey % 10 AS VARCHAR) || 'CD'
             |    || CAST((s_suppkey * 7) % 10 AS VARCHAR) || CAST((s_suppkey * 3) % 10 AS VARCHAR)
             |    || 'FG' || CAST((s_suppkey * 9) % 10 AS VARCHAR) || CAST(s_suppkey % 10 AS VARCHAR)
             |  END AS acc FROM supplier),
             |v AS (SELECT acc,
             |  array_to_string(list_filter(string_split('ZZZZZZ;' || acc || ';A12345', ';'),
             |    p -> regexp_matches(upper(p), '${graft.clinical.UniProt.AccessionRegex}')), ';') AS uniprotkb_ids,
             |  length(acc) * 1000
             |    + (CASE substr(acc, 1, 1) WHEN 'P' THEN 1 WHEN 'Q' THEN 2 WHEN 'O' THEN 3
             |        WHEN 'A' THEN 4 WHEN 'B' THEN 5 ELSE 18 END) * 10
             |    + CAST(substr(acc, 2, 1) AS BIGINT) AS age_key FROM s)
             |SELECT acc, uniprotkb_ids,
             |CAST(row_number() OVER (ORDER BY age_key, acc) AS BIGINT) AS age_rank FROM v""".stripMargin)),

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

    // U5 — MULTISET set ops (INTERSECT ALL / EXCEPT ALL — bag semantics:
    //   duplicates preserved up to the min/difference of multiplicities;
    //   the census form that distinct set ops silently lose). Spark
    //   plans both as aggregated multiplicity joins, no explode
    "u5_multiset_ops" -> Q(
      (s, dir) => {
        val a = td(s, dir, "customer").select((col("c_custkey") % 50).as("k"))
        val b = td(s, dir, "orders").select((col("o_custkey") % 50).as("k"))
        val both = a.intersectAll(b).groupBy(lit("intersect_all").as("op"), col("k"))
          .agg(count(lit(1)).cast("long").as("n"))
        val only = a.exceptAll(b).groupBy(lit("except_all").as("op"), col("k"))
          .agg(count(lit(1)).cast("long").as("n"))
        both.unionByName(only)
      },
      Some("""WITH a AS (SELECT c_custkey % 50 AS k FROM customer),
             |b AS (SELECT o_custkey % 50 AS k FROM orders),
             |ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
             |ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
             |SELECT 'intersect_all' AS op, k, CAST(count(*) AS BIGINT) AS n
             |FROM ia GROUP BY 2
             |UNION ALL
             |SELECT 'except_all' AS op, k, CAST(count(*) AS BIGINT) AS n
             |FROM ea GROUP BY 2""".stripMargin)),

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
