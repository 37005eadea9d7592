package graft.queries

import org.apache.spark.sql.functions._
import Registry.td

/**
 * SURVEY §2.8 — scalar function surface: strings (F1), casts/null handling
 * (F2), date/time (F3), array/struct/json (F4). All expression-only
 * (whole-stage codegen; no UDFs).
 */
object ScalarFnQueries {

  val all: Seq[(String, Q)] = Seq(

    // F1 — SPLIT[OFFSET] / LEFT / REGEXP_EXTRACT / TRIM / LOWER / CONCAT
    //   (create_tables_clinical_gdc.py:53; RNA_seq.py:30,104;
    //    per_sample_file_gdc.py:51)
    "f1_string_functions" -> Q(
      (s, dir) => td(s, dir, "part").select(
        col("p_partkey"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        substring(col("p_name"), 1, 4).as("left4"),
        regexp_extract(col("p_brand"), "^[^#]*#(.*)$", 1).as("brand_num"),
        lower(col("p_type")).as("type_lower"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type")),
      Some("""SELECT p_partkey, split_part(p_name, ' ', 1) AS first_word,
             |substr(p_name, 1, 4) AS left4,
             |regexp_extract(p_brand, '^[^#]*#(.*)$', 1) AS brand_num,
             |lower(p_type) AS type_lower,
             |p_brand || ':' || p_type AS brand_type FROM part""".stripMargin)),

    // F2 — CAST(null AS STRING) placeholders, IFNULL/COALESCE
    //   (per_sample_file_gdc.py:60-62; create_tables_clinical_gdc.py:471-472)
    "f2_cast_null_coalesce" -> Q(
      (s, dir) => td(s, dir, "customer").select(
        col("c_custkey"),
        lit(null).cast("string").as("placeholder"),
        coalesce(when(col("c_acctbal") < 0, col("c_name")), lit("in_credit")).as("flagged_name"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("DEFAULT")).as("segment_or_default")),
      Some("""SELECT c_custkey, CAST(NULL AS VARCHAR) AS placeholder,
             |COALESCE(CASE WHEN c_acctbal < 0 THEN c_name END, 'in_credit') AS flagged_name,
             |COALESCE(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment_or_default
             |FROM customer""".stripMargin)),

    // F3 — date/time conversion + parts (data_helpers.py:718-732; Spark
    //   built-ins cover the reference's Python-side datetime handling)
    "f3_datetime_parts" -> Q(
      (s, dir) => td(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso")),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
             |CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
             |CAST(day(o_orderdate) AS BIGINT) AS d,
             |strftime(o_orderdate, '%Y-%m-%d') AS iso FROM orders""".stripMargin)),

    // F5 — TRIM with a character set, the release-compare idiom
    //   `TRIM(STRING_AGG(...), '0 ')` (compare_clinical_gdc_api_releases.py:104-107)
    "f5_trim_charset" -> Q(
      (s, dir) => td(s, dir, "customer").select(
        col("c_custkey"),
        expr("TRIM(BOTH '0 ' FROM lpad(CAST(c_custkey AS STRING), 8, '0'))").as("trimmed")),
      Some("""SELECT c_custkey, trim(lpad(CAST(c_custkey AS VARCHAR), 8, '0'), '0 ') AS trimmed
             |FROM customer""".stripMargin)),

    // F4 — array ops: ARRAY_REVERSE(SPLIT(...))[OFFSET(0)], array length,
    //   contains (compare_clinical_gdc_api_releases.py:125, 153-157)
    "f4_array_ops" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"),
        element_at(reverse(split(col("text"), " ")), 1).as("last_word"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        array_contains(split(col("text"), " "), "spark").cast("boolean").as("mentions_spark"),
        array_join(slice(split(col("text"), " "), 1, 3), "_").as("first3")),
      Some("""SELECT doc_id, list_reverse(string_split(text, ' '))[1] AS last_word,
             |CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             |list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
             |array_to_string(string_split(text, ' ')[1:3], '_') AS first3 FROM documents""".stripMargin)),

    // F8 — bitwise aggregate family (bit_and / bit_or / bit_xor — flag-
    //   mask folds over per-key feature bitsets: "which capabilities do
    //   ALL members share / does ANY member have / parity"). Map-side
    //   partial hash-aggs, both engines native
    "f8_bitwise_aggs" -> Q(
      (s, dir) => td(s, dir, "lineitem")
        .select((col("l_orderkey") % 10).as("k"),
          (col("l_partkey") % 256).cast("long").as("mask"))
        .groupBy("k")
        .agg(expr("bit_and(mask)").as("all_bits"),
          expr("bit_or(mask)").as("any_bits"),
          expr("bit_xor(mask)").as("parity_bits"),
          count(lit(1)).cast("long").as("n")),
      Some("""SELECT l_orderkey % 10 AS k,
             |CAST(bit_and(CAST(l_partkey % 256 AS BIGINT)) AS BIGINT) AS all_bits,
             |CAST(bit_or(CAST(l_partkey % 256 AS BIGINT)) AS BIGINT) AS any_bits,
             |CAST(bit_xor(CAST(l_partkey % 256 AS BIGINT)) AS BIGINT) AS parity_bits,
             |CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // F6 — edit distance (levenshtein), the fuzzy-match primitive both
    //   engines ship natively: distance to a fixed probe + case-mangling
    //   distance between derived columns
    "f6_edit_distance" -> Q(
      (s, dir) => td(s, dir, "nation").select(
        col("n_nationkey"),
        levenshtein(col("n_name"), lit("CANADA")).cast("long").as("d_canada"),
        levenshtein(lower(col("n_name")), col("n_name")).cast("long").as("d_case"),
        levenshtein(col("n_name"), reverse(col("n_name"))).cast("long").as("d_rev")),
      Some("""SELECT n_nationkey,
             |CAST(levenshtein(n_name, 'CANADA') AS BIGINT) AS d_canada,
             |CAST(levenshtein(lower(n_name), n_name) AS BIGINT) AS d_case,
             |CAST(levenshtein(n_name, reverse(n_name)) AS BIGINT) AS d_rev
             |FROM nation""".stripMargin)),

    // F7 — semi-structured sidecar extraction over REAL driver data: the
    //   events table ships a JSON props column (every telemetry pipeline
    //   has one); extract the typed field and aggregate per event_type.
    //   The null guard is on the DERIVED field (not scan-pushable by
    //   nature); one hash-agg on a low-cardinality key
    "f7_props_json_extract" -> Q(
      (s, dir) => Registry.td(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("k")).cast("long").as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
             |FROM (SELECT event_type,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events) WHERE k IS NOT NULL GROUP BY 1""".stripMargin))
  )
}
