package graft.queries

import org.apache.spark.sql.functions._
import Registry.td

/**
 * Warehouse-maintenance half of the clinical/composite family (round-13
 * file split of [[ClinicalQueries]], pure mechanical move, registry
 * content unchanged; Registry.all concatenates this right after
 * ClinicalQueries so the global inventory order is preserved): SCD2
 * history, MERGE upsert, hierarchy closure, late-arriving dims, CDC
 * apply, the expectation/FK gates, publish vacuum, schema diff, and
 * policy-driven column masking.
 */
object WarehouseQueries {

  val all: Seq[(String, Q)] = Seq(

    // c31 — row-level security audit (publish/RowPolicy): the row-wise
    // complement to c30's column masking — per ROLE, visible rows /
    // sensitive mass / distinct entities, ALL roles in one scan (one
    // conditional aggregate per role, the c24 gate shape). applyPolicy
    // itself is a plain filter, so pushdown/pruning stay intact
    "c31_row_policy_audit" -> Q(
      (s, dir) => {
        import graft.publish.RowPolicy._
        policyAudit(
          td(s, dir, "customer").withColumn("bal_cents",
            round(col("c_acctbal") * 100).cast("long")),
          Seq(
            Policy("emea_analyst", col("c_nationkey").isin(1, 2, 3)),
            Policy("auto_sales", col("c_mktsegment") === "AUTOMOBILE"),
            Policy("high_value", col("bal_cents") >= 500000L),
            Policy("admin", lit(true))),
          measureCol = col("bal_cents"), entityCol = col("c_nationkey"))
      },
      Some("""WITH c AS (SELECT *, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
             |  FROM customer),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
             |v AS (
             |  SELECT 'emea_analyst' AS role,
             |    CAST(sum(CASE WHEN c_nationkey IN (1,2,3) THEN 1 ELSE 0 END) AS BIGINT) AS vr,
             |    CAST(sum(CASE WHEN c_nationkey IN (1,2,3) THEN bal_cents ELSE 0 END) AS BIGINT) AS ms,
             |    CAST(count(DISTINCT CASE WHEN c_nationkey IN (1,2,3) THEN c_nationkey END) AS BIGINT) AS ne
             |  FROM c
             |  UNION ALL
             |  SELECT 'auto_sales',
             |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN bal_cents ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_nationkey END) AS BIGINT)
             |  FROM c
             |  UNION ALL
             |  SELECT 'high_value',
             |    CAST(sum(CASE WHEN bal_cents >= 500000 THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN bal_cents >= 500000 THEN bal_cents ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT CASE WHEN bal_cents >= 500000 THEN c_nationkey END) AS BIGINT)
             |  FROM c
             |  UNION ALL
             |  SELECT 'admin', CAST(count(*) AS BIGINT),
             |    CAST(sum(bal_cents) AS BIGINT),
             |    CAST(count(DISTINCT c_nationkey) AS BIGINT)
             |  FROM c)
             |SELECT role, vr AS visible_rows, t.n AS total_rows,
             |  CAST((10000 * vr) // t.n AS BIGINT) AS visible_bp,
             |  ms AS measure_sum, ne AS n_entities
             |FROM v, t""".stripMargin)),

    // c32 — erasure-request CASCADE planner (publish/Erasure): GDPR
    // right-to-be-forgotten across the FK chain customer → orders →
    // lineitem (a 2-hop cascade: lineitem never references customer
    // directly). One key semi/left join per level, per-table
    // delete/keep counts + a DECIMAL-safe modular checksum of the
    // deleted keys; the plan is an audit table, applied via anti-joins
    "c32_erasure_cascade" -> Q(
      (s, dir) => {
        import graft.publish.Erasure._
        val requests = td(s, dir, "customer")
          .filter(col("c_custkey") % 97 === 0).select("c_custkey")
        cascadePlan(
          "customer", td(s, dir, "customer"), col("c_custkey"), requests,
          Seq(
            Level("orders", td(s, dir, "orders"),
              parentRef = col("o_custkey"), ownKey = col("o_orderkey")),
            Level("lineitem", td(s, dir, "lineitem"),
              parentRef = col("l_orderkey"),
              ownKey = col("l_orderkey") * 10 + col("l_linenumber"))))
      },
      Some("""WITH req AS (SELECT DISTINCT c_custkey AS k FROM customer
             |  WHERE c_custkey % 97 = 0),
             |cu AS (SELECT 'customer' AS table_name,
             |    CAST(sum(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
             |    CAST(sum(CASE WHEN r.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             |    CAST(COALESCE(CAST(sum(CASE WHEN r.k IS NOT NULL THEN c_custkey ELSE 0 END) AS HUGEINT), 0)
             |      % 1000000000000 AS BIGINT) AS del_key_mod
             |  FROM customer c LEFT JOIN req r ON c.c_custkey = r.k),
             |okeys AS (SELECT DISTINCT o_orderkey AS k FROM orders
             |  WHERE o_custkey IN (SELECT k FROM req)),
             |od AS (SELECT 'orders' AS table_name,
             |    CAST(sum(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN r.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(COALESCE(CAST(sum(CASE WHEN r.k IS NOT NULL THEN o_orderkey ELSE 0 END) AS HUGEINT), 0)
             |      % 1000000000000 AS BIGINT)
             |  FROM orders o LEFT JOIN req r ON o.o_custkey = r.k),
             |ld AS (SELECT 'lineitem' AS table_name,
             |    CAST(sum(CASE WHEN ok.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN ok.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(COALESCE(CAST(sum(CASE WHEN ok.k IS NOT NULL
             |        THEN l_orderkey * 10 + l_linenumber ELSE 0 END) AS HUGEINT), 0)
             |      % 1000000000000 AS BIGINT)
             |  FROM lineitem l LEFT JOIN okeys ok ON l.l_orderkey = ok.k)
             |SELECT * FROM cu UNION ALL SELECT * FROM od
             |UNION ALL SELECT * FROM ld""".stripMargin)),

    // C19 — SCD2 dimension maintenance (Kimball type-2 MERGE-with-history):
    //   history = customer dimension at valid_from=0; the update batch
    //   mixes changed attributes (%5: segment renamed → close + reopen),
    //   NO-OP updates (%3 minus the %5 overlap: identical segment → row
    //   untouched, no spurious version), and brand-new keys (+1000000 for
    //   %7: open rows). The oracle derives every branch from the same
    //   residue split — it never replays the join
    "c19_scd2_history" -> Q(
      (s, dir) => {
        val cust = td(s, dir, "customer")
        val hist = cust.select(col("c_custkey").as("k"),
          col("c_mktsegment").as("segment"),
          lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
          lit(true).as("is_current"))
        val changedU = cust.filter(col("c_custkey") % 5 === 0)
          .select(col("c_custkey").as("k"),
            concat(col("c_mktsegment"), lit("-NEW")).as("segment"))
        val noopU = cust.filter(col("c_custkey") % 3 === 0 && col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"))
        // fresh keys sit at +1e9: OUTSIDE any replica keyspace (ScaleUp
        // shifts custkeys by r*1e6 per replica, so a +1e6 offset collided
        // with replica r+1's keys at sf1 — caught by the round-12 sf1
        // hash gate as a row-count mismatch; fixture bug, not engine bug)
        val freshU = cust.filter(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000000L).as("k"), lit("FRESH").as("segment"))
        val updates = changedU.unionByName(noopU).unionByName(freshU)
        graft.ops.Scd.scd2Apply(hist, updates, "k", Seq("segment"), batchTs = 100L)
      },
      Some("""WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer)
             |SELECT k, seg AS segment,
             |  CAST(0 AS BIGINT) AS valid_from,
             |  CAST(CASE WHEN k % 5 = 0 THEN 100 END AS BIGINT) AS valid_to,
             |  k % 5 <> 0 AS is_current
             |FROM c
             |UNION ALL
             |SELECT k, seg || '-NEW', CAST(100 AS BIGINT), CAST(NULL AS BIGINT), true
             |FROM c WHERE k % 5 = 0
             |UNION ALL
             |SELECT k + 1000000000, 'FRESH', CAST(100 AS BIGINT), CAST(NULL AS BIGINT), true
             |FROM c WHERE k % 7 = 0""".stripMargin)),

    // c20 — type-1 keyed MERGE (MERGE INTO … WHEN MATCHED UPDATE/DELETE
    // WHEN NOT MATCHED INSERT): the current-state upsert next to c19's
    // history-keeping SCD2. One full-outer join + one projection; the
    // oracle is the CLOSED FORM of the disjoint update/delete/insert
    // batches (k%3 update, k%7 delete, k%5 spawns a new key), exact
    // integer cents for the balance
    "c20_merge_upsert" -> Q(
      (s, dir) => {
        val cust = td(s, dir, "customer")
        val target = cust.select(col("c_custkey").as("k"),
          col("c_mktsegment").as("segment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        val updates = cust.filter(col("c_custkey") % 3 === 0 && col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey").as("k"), lit("U").as("op"),
            concat(col("c_mktsegment"), lit("-U")).as("segment"),
            (round(col("c_acctbal") * 100).cast("long") + 100L).as("bal_cents"))
        val deletes = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("k"), lit("D").as("op"),
            lit(null).cast("string").as("segment"), lit(null).cast("long").as("bal_cents"))
        // +1e9 insert keys for the same replica-keyspace reason as c19
        val inserts = cust.filter(col("c_custkey") % 5 === 0)
          .select((col("c_custkey") + 1000000000L).as("k"), lit("U").as("op"),
            lit("INS").as("segment"), lit(0L).as("bal_cents"))
        val source = updates.unionByName(deletes).unionByName(inserts)
        graft.ops.Scd.mergeUpsert(target, source, "k",
          Seq("segment", "bal_cents"), opCol = "op")
      },
      Some("""WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
             |    CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer)
             |SELECT k,
             |  CASE WHEN k % 3 = 0 THEN seg || '-U' ELSE seg END AS segment,
             |  CASE WHEN k % 3 = 0 THEN bal + 100 ELSE bal END AS bal_cents,
             |  CASE WHEN k % 3 = 0 THEN 'updated' ELSE 'kept' END AS action
             |FROM c WHERE k % 7 <> 0
             |UNION ALL
             |SELECT k + 1000000000, 'INS', CAST(0 AS BIGINT), 'inserted'
             |FROM c WHERE k % 5 = 0""".stripMargin)),

    // ontology ancestor closure (ops/Graph.ancestorClosure): hierarchical
    // clinical codings roll cases up to EVERY ancestor term. Synthetic
    // forest over part: child k ≥ 8 points to parent k div 8 (roots 1..7),
    // ~log₈ n deep. Pointer doubling closes it in ⌈log₂ depth⌉ rounds of
    // two equi-joins; the oracle walks the same edges one level per
    // recursive-CTE step. eager: localCheckpoint materializes per round
    "c21_hierarchy_closure" -> Q(
      (s, dir) => graft.ops.Graph.ancestorClosure(
        td(s, dir, "part").filter(col("p_partkey") >= 8)
          .select(col("p_partkey").as("c"), expr("p_partkey div 8").as("p")),
        "c", "p", maxDepth = 16),
      Some("""WITH RECURSIVE e AS (SELECT p_partkey AS node,
             |    p_partkey // 8 AS anc FROM part WHERE p_partkey >= 8),
             |cl AS (
             |  SELECT node, anc, CAST(1 AS BIGINT) AS dist FROM e
             |  UNION ALL
             |  SELECT cl.node, e.anc, cl.dist + 1
             |  FROM cl JOIN e ON cl.anc = e.node WHERE cl.dist < 16)
             |SELECT node, anc, dist FROM cl""".stripMargin),
      eager = true),

    // (c28 is an intentional gap — never assigned; the id was skipped in
    // round 10's registration sequence and is tombstoned here so audits
    // don't hunt for a missing row. Next free clinical id: c31.)
    // c29 — LATE-ARRIVING dimension repair (Kimball early-arriving
    // facts): facts referencing a not-yet-loaded member get an INFERRED
    // placeholder so the join resolves; when the real row arrives it is
    // ENRICHED in place. Lanes: k%3=0 initial load ('loaded'), k%3=1
    // arrives late ('enriched' where referenced by a fact), k%3=2 never
    // arrives ('inferred'). Key-partitioned equi joins only; the fact
    // side enters as a DISTINCT key set, never fact rows
    "c29_late_arriving_dim" -> Q(
      (s, dir) => {
        val cust = td(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        graft.ops.Scd.lateArrivingDimension(
          dim = cust.filter(col("k") % 3 === 0),
          facts = td(s, dir, "orders").select(col("o_custkey").as("k")),
          lateDim = cust.filter(col("k") % 3 === 1),
          key = "k", attrCols = Seq("seg"))
      },
      Some("""WITH dim0 AS (SELECT c_custkey AS k, c_mktsegment AS seg
             |  FROM customer WHERE c_custkey % 3 = 0),
             |late AS (SELECT c_custkey AS k, c_mktsegment AS seg
             |  FROM customer WHERE c_custkey % 3 = 1),
             |fk AS (SELECT DISTINCT o_custkey AS k FROM orders),
             |inf AS (SELECT fk.k FROM fk LEFT JOIN dim0 USING (k)
             |  WHERE dim0.k IS NULL)
             |SELECT k, seg, 'loaded' AS status FROM dim0
             |UNION ALL
             |SELECT i.k, l.seg,
             |  CASE WHEN l.k IS NULL THEN 'inferred' ELSE 'enriched' END AS status
             |FROM inf i LEFT JOIN late l USING (k)""".stripMargin)),

    // c23 — CDC changelog apply (Scd.cdcApply): a MULTI-op change stream
    // (I, then up to two Us, then maybe a D per key — strictly monotone
    // seq) compacts to each key's latest op in ONE max_by hash-agg (no
    // window sort), then folds into the current-state target with c20's
    // merge semantics. Lanes: k%9 two-update chain (latest wins over
    // middle), k%3 one update, k%5 delete (kills keys the SAME batch
    // inserted), k%7 absent from the changelog (target rows pass through
    // as 'kept'), even keys absent from the target ('inserted'). The
    // oracle is the closed form of those disjoint lanes — exact integer
    // cents throughout
    "c23_cdc_apply" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders").select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val chgKeys = o.filter(col("k") % 7 =!= 0)
        val ins = chgKeys.select(col("k"), lit(1L).as("seq"), lit("I").as("op"),
          col("st").as("status"), col("cents").as("total_cents"))
        val upA = chgKeys.filter(col("k") % 3 === 0)
          .select(col("k"), lit(2L).as("seq"), lit("U").as("op"),
            concat(col("st"), lit("-A")).as("status"),
            (col("cents") + 500L).as("total_cents"))
        val upB = chgKeys.filter(col("k") % 9 === 0)
          .select(col("k"), lit(3L).as("seq"), lit("U").as("op"),
            concat(col("st"), lit("-B")).as("status"),
            (col("cents") + 700L).as("total_cents"))
        val del = chgKeys.filter(col("k") % 5 === 0)
          .select(col("k"), lit(4L).as("seq"), lit("D").as("op"),
            lit(null).cast("string").as("status"),
            lit(null).cast("long").as("total_cents"))
        val changelog = ins.unionByName(upA).unionByName(upB).unionByName(del)
        val target = o.filter(col("k") % 2 === 1)
          .select(col("k"), col("st").as("status"), col("cents").as("total_cents"))
        graft.ops.Scd.cdcApply(target, changelog, "k", "seq", "op",
          Seq("status", "total_cents"))
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
             |chg AS (SELECT k,
             |    CASE WHEN k%9=0 THEN st || '-B'
             |         WHEN k%3=0 THEN st || '-A' ELSE st END AS status,
             |    CASE WHEN k%9=0 THEN cents+700
             |         WHEN k%3=0 THEN cents+500 ELSE cents END AS total_cents
             |  FROM o WHERE k%7<>0 AND k%5<>0)
             |SELECT k, status, total_cents,
             |  CASE WHEN k%2=1 THEN 'updated' ELSE 'inserted' END AS action
             |FROM chg
             |UNION ALL
             |SELECT k, st AS status, cents AS total_cents, 'kept' AS action
             |FROM o WHERE k%2=1 AND k%7=0""".stripMargin)),

    // c24 — config-driven expectation gate (ops/Expectations.gate): the
    // declarative pre-publish QC table (dbt-test / Great-Expectations
    // core vocabulary) evaluated in ONE scan — every rule is one
    // conditional aggregate in a single hash-agg; uniqueness rides the
    // same pass via a distinct count. Mixed pass/fail lanes on orders:
    // the key is unique (pass), custkey is not (fail with the exact
    // duplicate count), a deliberately tight price range and a
    // two-priority regex fail with counts the oracle recomputes from
    // the table, status accepted-set counts the 'P' rows
    "c24_expectation_gate" -> Q(
      (s, dir) => {
        import graft.ops.Expectations._
        gate(
          td(s, dir, "orders").withColumn("total_cents",
            round(col("o_totalprice") * 100).cast("long")),
          Seq(
            ExpectNotNull("r1_date_present", "o_orderdate"),
            ExpectUnique("r2_key_unique", "o_orderkey"),
            ExpectUnique("r3_cust_unique", "o_custkey"),
            ExpectInRange("r4_price_cap", "total_cents", 0L, 20000000L),
            ExpectMatches("r5_prio_12", "o_orderpriority", "^[12]-"),
            ExpectInSet("r6_status_of", "o_orderstatus", Seq("O", "F"))))
      },
      Some("""WITH o AS (SELECT *, CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
             |  FROM orders),
             |v AS (
             |  SELECT 'r1_date_present' AS rule_id, 'not_null' AS kind,
             |    'o_orderdate' AS col_name,
             |    CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT) AS violations
             |  FROM o
             |  UNION ALL
             |  SELECT 'r2_key_unique', 'unique', 'o_orderkey',
             |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM o
             |  UNION ALL
             |  SELECT 'r3_cust_unique', 'unique', 'o_custkey',
             |    CAST(count(o_custkey) - count(DISTINCT o_custkey) AS BIGINT) FROM o
             |  UNION ALL
             |  SELECT 'r4_price_cap', 'in_range', 'total_cents',
             |    CAST(count(CASE WHEN total_cents IS NOT NULL
             |      AND (total_cents < 0 OR total_cents > 20000000) THEN 1 END) AS BIGINT)
             |  FROM o
             |  UNION ALL
             |  SELECT 'r5_prio_12', 'matches', 'o_orderpriority',
             |    CAST(count(CASE WHEN o_orderpriority IS NOT NULL
             |      AND NOT regexp_matches(o_orderpriority, '^[12]-') THEN 1 END) AS BIGINT)
             |  FROM o
             |  UNION ALL
             |  SELECT 'r6_status_of', 'in_set', 'o_orderstatus',
             |    CAST(count(CASE WHEN o_orderstatus IS NOT NULL
             |      AND o_orderstatus NOT IN ('O', 'F') THEN 1 END) AS BIGINT)
             |  FROM o)
             |SELECT rule_id, kind, col_name, violations,
             |  (SELECT CAST(count(*) AS BIGINT) FROM o) AS n,
             |  violations = 0 AS pass
             |FROM v""".stripMargin)),

    // c25 — referential-integrity audit (Expectations.refGate): the dbt
    // `relationships` test over lineitem in ONE child scan — each rule
    // left-joins its broadcast distinct parent key set and feeds one
    // conditional aggregate. Lanes: orderkey→orders and suppkey→supplier
    // hold (pass); partkey checked against a deliberately truncated part
    // subset (p_partkey % 3 = 0) counts the orphans exactly
    "c25_fk_audit" -> Q(
      (s, dir) => {
        import graft.ops.Expectations._
        refGate(td(s, dir, "lineitem"), Seq(
          ExpectForeignKey("fk_order", "l_orderkey", td(s, dir, "orders"), "o_orderkey"),
          ExpectForeignKey("fk_part_subset", "l_partkey",
            td(s, dir, "part").filter(col("p_partkey") % 3 === 0), "p_partkey"),
          ExpectForeignKey("fk_supp", "l_suppkey", td(s, dir, "supplier"), "s_suppkey")))
      },
      Some("""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
             |v AS (
             |  SELECT 'fk_order' AS rule_id, 'l_orderkey' AS col_name,
             |    CAST(count(CASE WHEN l_orderkey IS NOT NULL AND l_orderkey NOT IN
             |      (SELECT o_orderkey FROM orders) THEN 1 END) AS BIGINT) AS violations
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'fk_part_subset', 'l_partkey',
             |    CAST(count(CASE WHEN l_partkey IS NOT NULL AND l_partkey NOT IN
             |      (SELECT p_partkey FROM part WHERE p_partkey % 3 = 0) THEN 1 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'fk_supp', 'l_suppkey',
             |    CAST(count(CASE WHEN l_suppkey IS NOT NULL AND l_suppkey NOT IN
             |      (SELECT s_suppkey FROM supplier) THEN 1 END) AS BIGINT)
             |  FROM lineitem)
             |SELECT rule_id, 'foreign_key' AS kind, col_name, violations,
             |  (SELECT n FROM n) AS n, violations = 0 AS pass
             |FROM v""".stripMargin)),

    // c26 — retention VACUUM for the publish lifecycle (Publish
    // .vacuumPlan/vacuum — the Delta-VACUUM shape split into auditable
    // pure PLAN + destructive APPLY): 4 pointer-mode publishes, then
    // keepLast=2 with no age grace — v1/v2 expire and are deleted from
    // disk, v3 keeps as last-n, v4 keeps as current (pointer precedence
    // over last-n). The query asserts post-vacuum readability of the
    // survivors and the deletion of the expired dirs, then returns the
    // decision table; eager: publishes + deletes run at construction
    "c26_publish_vacuum" -> Q(
      (s, dir) => {
        import graft.publish.Publish
        val root = s"/root/repo/target/vacuum_${new java.io.File(dir).getName}"
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(root))
        val base = td(s, dir, "orders").groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("cnt"))
        (1 to 4).foreach { i =>
          Publish.publish(s, base.withColumn("cnt", col("cnt") + i),
            root, "census", Publish.PointerCurrent)
        }
        val plan = Publish.vacuum(root, "census", keepLast = 2,
          minAgeMs = 0L, nowMs = System.currentTimeMillis())
        assert(!new java.io.File(s"$root/census_v1").exists(), "v1 must be gone")
        assert(!new java.io.File(s"$root/census_v2").exists(), "v2 must be gone")
        assert(Publish.readVersion(s, root, "census", 3).count() > 0, "v3 time travel")
        assert(Publish.readCurrent(s, root, "census").count() > 0, "current intact")
        import s.implicits._
        plan.map(d => (d.version.toLong, d.action, d.reason))
          .toDF("version", "action", "reason")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'delete', 'expired'),
             |  (CAST(2 AS BIGINT), 'delete', 'expired'),
             |  (CAST(3 AS BIGINT), 'keep', 'last-n'),
             |  (CAST(4 AS BIGINT), 'keep', 'current'))
             |t(version, action, reason)""".stripMargin),
      eager = true),

    // c27 — SCHEMA diff (Diff.schemaDiff): the column-level publish gate
    // the reference's compare runs before any row diff — a dropped column
    // or type change is a breaking release even when surviving rows
    // match. Pure metadata (LocalTableScan, no data job); fixture evolves
    // orders by dropping, adding, and type-widening one column each
    "c27_schema_diff" -> Q(
      (s, dir) => {
        val base = td(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
        val next = base.drop("o_orderpriority")
          .withColumn("o_totalprice", col("o_totalprice").cast("string"))
          .withColumn("o_tags", lit("x"))
        graft.ops.Diff.schemaDiff(base, next)
      },
      Some("""SELECT * FROM (VALUES
             |  ('o_orderkey', 'unchanged', 'bigint', 'bigint'),
             |  ('o_orderpriority', 'removed', 'string', NULL),
             |  ('o_orderstatus', 'unchanged', 'string', 'string'),
             |  ('o_tags', 'added', NULL, 'string'),
             |  ('o_totalprice', 'type_changed', 'double', 'string'))
             |t(col_name, status, type_old, type_new)""".stripMargin)),

    // c30 — policy-driven COLUMN MASKING for publication (the engine-side
    // form of BigQuery's column-level masking the reference leaves to
    // warehouse view ACLs): salted-hash pseudonym (still joinable),
    // last-4 display mask, typed-NULL redaction, and numeric bucket
    // generalization (pmod floor — exact on negative balances), applied
    // as one expression-only projection so the masked release is a real
    // diffable table. Oracle replays every mode: sha256 prefix, repeat/
    // right padding, NULL typing, and the positive-mod bucket arithmetic
    "c30_column_masking" -> Q(
      (s, dir) => {
        import graft.publish.Masking, Masking.MaskMode._
        val base = td(s, dir, "customer").select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        Masking.applyMasks(base, Seq(
          "c_name" -> Hash("rel7:"),
          "c_nationkey" -> Redact,
          "c_mktsegment" -> Last4,
          "bal_cents" -> Bucket(10000L)))
      },
      Some("""SELECT c_custkey,
             |  substr(sha256('rel7:' || c_name), 1, 16) AS c_name,
             |  CAST(NULL AS INTEGER) AS c_nationkey,
             |  CASE WHEN length(c_mktsegment) <= 4
             |       THEN repeat('*', length(c_mktsegment))
             |       ELSE repeat('*', length(c_mktsegment) - 4)
             |            || right(c_mktsegment, 4) END AS c_mktsegment,
             |  CAST(round(c_acctbal * 100) AS BIGINT)
             |    - ((CAST(round(c_acctbal * 100) AS BIGINT) % 10000 + 10000) % 10000)
             |    AS bal_cents
             |FROM customer""".stripMargin))
  )
}
