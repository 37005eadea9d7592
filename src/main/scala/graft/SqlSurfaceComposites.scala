package graft

import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import GraftSqlSurface.{longArg, plan, strArg, tableArg, tvf}

/**
 * Round-14 SQL surface: the COMPOSITE pipelines — the rows a SQL-only user
 * actually runs end-to-end (clinical flatten, publish diff gate, the
 * file-metadata DAG, the curation funnel, the row-policy audit) — exposed
 * as table functions over the same Scala macros the registry rows splice.
 * Config-shaped arguments follow the expectation-gate precedent: entries
 * ';'-separated, fields ':'-separated, lists CSV.
 */
object SqlSurfaceComposites {

  def install(ext: SparkSessionExtensions): Unit = {

    // ---- c1: config-driven clinical flatten ------------------------------
    // spec entries: name:table:idCol[:childOf[:prefix[:single|multi]]]
    // (childOf/prefix may be empty; the root entry has no childOf). Tables
    // resolve in the session catalog, so views prepared in SQL feed the
    // same EntitySpec DAG the Scala path builds.
    tvf(ext)("graft_clinical_flatten",
      "graft_clinical_flatten(spec 'name:table:idCol[:childOf[:prefix[:single]]];...', root)",
      2 to 2) { args =>
      val fn = "graft_clinical_flatten"
      import graft.clinical.{Clinical, EntitySpec}
      val root = strArg(fn, args(1), "root")
      val entries = strArg(fn, args(0), "spec").split(';').map(_.trim)
        .filter(_.nonEmpty).map { e =>
          val f = e.split(":", -1).map(_.trim)
          require(f.length >= 3 && f.length <= 6,
            s"$fn: spec entry '$e' is not name:table:idCol[:childOf[:prefix[:single]]]")
          val single = f.lift(5).map {
            case "single" => true
            case "multi" | "" => false
            case other => throw new IllegalArgumentException(
              s"$fn: entry '$e' mode must be 'single' or 'multi', got '$other'")
          }.getOrElse(false)
          (f(0), f(1), EntitySpec(f(0), f(2),
            childOf = f.lift(3).filter(_.nonEmpty),
            prefix = f.lift(4).filter(_.nonEmpty),
            singleEntry = single))
        }.toSeq
      require(entries.exists(_._1 == root),
        s"$fn: root '$root' has no spec entry")
      val tables = entries.map { case (n, t, _) =>
        n -> org.apache.spark.sql.SparkSession.active.table(t) }.toMap
      plan(Clinical.flatten(tables, entries.map(_._3), root))
    }

    // ---- c3: the publish diff gate ---------------------------------------
    // The decision Publish.publish takes (lookup.py:692-705 semantics):
    // would a candidate frame publish a new version against the current
    // one, and why — row counts of each one-way diff. One row out.
    tvf(ext)("graft_publish_diff_gate",
      "graft_publish_diff_gate(tableCurrent, tableCandidate)", 2 to 2) { args =>
      val fn = "graft_publish_diff_gate"
      val d = graft.ops.Diff.symmetricDiff(
        tableArg(fn, args(0), "tableCurrent"),
        tableArg(fn, args(1), "tableCandidate"))
      plan(d.agg(
          coalesce(sum(when(col("_side") === "old", 1L).otherwise(0L)), lit(0L))
            .as("n_only_current"),
          coalesce(sum(when(col("_side") === "new", 1L).otherwise(0L)), lit(0L))
            .as("n_only_candidate"))
        .select((col("n_only_current") + col("n_only_candidate") > 0)
            .as("would_publish"),
          col("n_only_current"), col("n_only_candidate")))
    }

    // ---- c13: file-metadata DAG merge --------------------------------------
    // base + aggregate branches LEFT-joined (create_tables_file_metadata_gdc
    // .py:78-438): each branch is a STRING_AGG(DISTINCT prefix||col, ';')
    // ordered, post-processed per its mode —
    //   multi        → collapse past MAX_CONCAT_COUNT to 'multi'
    //   keep:default → normalizeValue(COALESCE(ids, default))
    // plus one row count column. Branch entries `out:col:prefix:mode`
    // (prefix may be ''; mode is `multi` or `keep:<default>`). All branches
    // aggregate in ONE child groupBy and join back in ONE left join — the
    // registered c13 row's two-join shape collapsed, same rows.
    tvf(ext)("graft_file_metadata_dag",
      "graft_file_metadata_dag(base, baseKey, child, childKey, branches 'out:col:prefix:mode;...', countCol)",
      6 to 6) { args =>
      val fn = "graft_file_metadata_dag"
      import graft.normalize.Normalize
      val base = tableArg(fn, args(0), "base")
      val baseKey = strArg(fn, args(1), "baseKey")
      val child = tableArg(fn, args(2), "child")
      val childKey = strArg(fn, args(3), "childKey")
      val countCol = strArg(fn, args(5), "countCol")
      val branches = strArg(fn, args(4), "branches").split(';').map(_.trim)
        .filter(_.nonEmpty).map { e =>
          val f = e.split(":", 4).map(_.trim)
          require(f.length == 4,
            s"$fn: branch '$e' is not out:col:prefix:mode")
          require(f(3) == "multi" || f(3).startsWith("keep"),
            s"$fn: branch '$e' mode must be 'multi' or 'keep[:default]'")
          (f(0), f(1), f(2), f(3))
        }.toSeq
      require(branches.nonEmpty, s"$fn: at least one branch required")
      val aggs = branches.map { case (out, c, prefix, _) =>
        graft.ops.Agg.stringAggDistinctOrdered(
          if (prefix.isEmpty) col(c).cast("string")
          else concat(lit(prefix), col(c)), ";").as(out)
      } :+ count(lit(1)).cast("long").as(countCol)
      val agged = child.groupBy(col(childKey).as("__dag_key"))
        .agg(aggs.head, aggs.tail: _*)
      val joined = base.join(agged, base(baseKey) === col("__dag_key"), "left")
        .drop("__dag_key")
      val post = branches.foldLeft(joined) { case (df, (out, _, _, mode)) =>
        if (mode == "multi")
          df.withColumn(out, Normalize.convertConcatToMulti(col(out)))
        else {
          val default = mode.split(":", 2).lift(1).getOrElse("")
          df.withColumn(out,
            Normalize.normalizeValue(coalesce(col(out), lit(default))))
        }
      }
      plan(post.withColumn(countCol, coalesce(col(countCol), lit(0L))))
    }

    // ---- l51: curation funnel ----------------------------------------------
    // The composed quality gate (normalize → classifier score → opening-
    // fingerprint dedup → per-source funnel counts) over the frozen
    // DefaultModel; minLogitOffsetMicro shifts the decision threshold off
    // the model's bias in micro-logits (50000 = +0.05).
    tvf(ext)("graft_curation_funnel",
      "graft_curation_funnel(table, idCol, textCol, sourceCol, minLogitOffsetMicro)",
      5 to 5) { args =>
      val fn = "graft_curation_funnel"
      val model = graft.llm.QualityClassifier.DefaultModel
      val offset = longArg(fn, args(4), "minLogitOffsetMicro")
      plan(graft.llm.Curation.curationFunnel(
        tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "idCol"), strArg(fn, args(2), "textCol"),
        strArg(fn, args(3), "sourceCol"), model,
        minLogit = model.bias.add(
          new java.math.BigDecimal(java.math.BigInteger.valueOf(offset), 6))))
    }

    // ---- l48: per-group document cap ----------------------------------------
    // hash-chosen survivors, at most maxPerGroup per group (the C4-style
    // over-crawled-source ceiling), via the hash-bucket pre-selection plan
    tvf(ext)("graft_cap_per_group",
      "graft_cap_per_group(table, keyCol, groupCol, maxPerGroup)", 4 to 4) { args =>
      val fn = "graft_cap_per_group"
      plan(graft.llm.Sampling.capPerGroup(tableArg(fn, args(0), "table"),
        strArg(fn, args(1), "keyCol"), strArg(fn, args(2), "groupCol"),
        maxPerGroup = longArg(fn, args(3), "maxPerGroup").toInt))
    }

    // ---- c32: erasure cascade --------------------------------------------
    // Right-to-erasure planning across a parent->child key DAG: levels as
    // 'table:parentRefExpr:ownKeyExpr' entries (exprs parsed with expr(),
    // so derived keys like `l_orderkey*10+l_linenumber` work); the level's
    // table name doubles as its report label, matching the Scala Level.
    tvf(ext)("graft_erasure_cascade",
      "graft_erasure_cascade(rootTable, rootKey, requestsTable, levels 'table:parentRef:ownKey;...')",
      4 to 4) { args =>
      val fn = "graft_erasure_cascade"
      import graft.publish.Erasure
      val rootName = strArg(fn, args(0), "rootTable")
      val levels = strArg(fn, args(3), "levels").split(';').map(_.trim)
        .filter(_.nonEmpty).map { e =>
          val f = e.split(":", 3).map(_.trim)
          require(f.length == 3,
            s"$fn: level '$e' is not table:parentRef:ownKey")
          Erasure.Level(f(0),
            org.apache.spark.sql.SparkSession.active.table(f(0)),
            parentRef = expr(f(1)), ownKey = expr(f(2)))
        }.toSeq
      plan(Erasure.cascadePlan(rootName,
        org.apache.spark.sql.SparkSession.active.table(rootName),
        expr(strArg(fn, args(1), "rootKey")),
        tableArg(fn, args(2), "requestsTable"), levels))
    }

    // ---- l130: reciprocal-rank fusion ---------------------------------------
    // hybrid-search combiner over N top-k ranking tables (CSV of table
    // names, each (docCol, scoreCol)); ranks only, no score calibration
    tvf(ext)("graft_rrf_fuse",
      "graft_rrf_fuse(tablesCsv, docCol, scoreCol, kConst, topK)", 5 to 5) { args =>
      val fn = "graft_rrf_fuse"
      val names = strArg(fn, args(0), "tablesCsv").split(',').map(_.trim)
        .filter(_.nonEmpty).toSeq
      require(names.nonEmpty, s"$fn: tablesCsv names at least one table")
      plan(graft.llm.RetrievalEval.rrfFuse(
        names.map(org.apache.spark.sql.SparkSession.active.table),
        strArg(fn, args(1), "docCol"), strArg(fn, args(2), "scoreCol"),
        kConst = longArg(fn, args(3), "kConst").toInt,
        topK = longArg(fn, args(4), "topK").toInt))
    }

    // ---- c31: row-level-security audit -------------------------------------
    // Policies as `role=sqlPredicate` entries (';'-separated); predicates
    // are arbitrary SQL boolean expressions over the table's columns,
    // parsed with expr() — the same Column the Scala Policy carries.
    tvf(ext)("graft_policy_audit",
      "graft_policy_audit(table, measureCol, entityCol, policies 'role=predicate;...')",
      4 to 4) { args =>
      val fn = "graft_policy_audit"
      import graft.publish.RowPolicy
      val policies = strArg(fn, args(3), "policies").split(';').map(_.trim)
        .filter(_.nonEmpty).map { e =>
          val i = e.indexOf('=')
          require(i > 0, s"$fn: policy '$e' is not role=predicate")
          RowPolicy.Policy(e.substring(0, i).trim, expr(e.substring(i + 1)))
        }.toSeq
      plan(RowPolicy.policyAudit(tableArg(fn, args(0), "table"), policies,
        measureCol = expr(strArg(fn, args(1), "measureCol")),
        entityCol = expr(strArg(fn, args(2), "entityCol"))))
    }
  }
}
