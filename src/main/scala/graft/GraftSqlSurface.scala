package graft

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/**
 * SQL-callable table-valued functions over the engine's DataFrame macro
 * library (SURVEY §3.1's "optionally also accept SQL via spark.sql"):
 * a BigQuery-SQL-shaped user drives the ops without writing Scala —
 *
 * {{{
 *   CREATE TEMP VIEW li AS SELECT l_returnflag g, CAST(l_quantity AS LONG) v FROM lineitem;
 *   SELECT * FROM graft_mode('li', 'g', 'v');
 *   SELECT * FROM graft_symmetric_diff('snap_old', 'snap_new');
 * }}}
 *
 * Each TVF resolves its first argument(s) as TABLE NAMES in the session
 * catalog (temp views included), applies the IDENTICAL Scala macro the
 * registry rows use, and splices the resulting (already analyzed) plan
 * into the outer query — so the SQL path and the Scala path produce the
 * same Catalyst plan, not a reimplementation. Installed by
 * [[GraftExtensions]]; registered via `injectTableFunction`, the same
 * registry `RANGE(...)` lives in.
 *
 * Argument contract: table/column arguments are STRING literals, numeric
 * options are integer literals — checked here with readable errors
 * (an unresolved-attribute error from deep inside a macro is useless to
 * a SQL user).
 */
object GraftSqlSurface {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Every TVF ever registered through [[tvf]]: name → (usage, arity).
    * The readable-error fuzz sweep iterates this so new functions are
    * covered by construction, never by remembering to list them. */
  private val tvfRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Range)]()
  def registeredTvfs: Map[String, (String, Range)] = {
    import scala.jdk.CollectionConverters._
    tvfRegistry.asScala.toMap
  }

  /** `foldable`/`dataType` throw UnresolvedException on an unresolved
    * argument — the MOST LIKELY SQL mistake is an unquoted identifier as
    * a table/column argument, which must surface as the readable message
    * below, not an internal analyzer error. */
  private def quietlyFoldableAs(e: Expression,
                                tpe: Option[org.apache.spark.sql.types.DataType]): Boolean =
    try e.foldable && tpe.forall(_ == e.dataType)
    catch { case _: Exception => false }

  private[graft] def strArg(fn: String, e: Expression, what: String): String = {
    require(quietlyFoldableAs(e, Some(StringType)),
      s"$fn: $what must be a string literal (quote it: '...')")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    v.toString
  }

  private[graft] def longArg(fn: String, e: Expression, what: String): Long = {
    require(quietlyFoldableAs(e, None),
      s"$fn: $what must be an integer literal")
    e.eval() match {
      case n: Number =>
        val l = n.longValue()
        // 2.5 must be rejected, not silently truncated to 2
        require(n.doubleValue() == l.toDouble,
          s"$fn: $what must be an INTEGER literal, got $n")
        l
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  /** Resolve a TVF table-name argument against the active session catalog
    * (the session running the SQL — TVF builders execute inside its
    * analyzer, so `active` is always the right session). */
  private[graft] def tableArg(fn: String, e: Expression, what: String): DataFrame =
    SparkSession.active.table(strArg(fn, e, what))

  /** The macro output spliced back as an ANALYZED subtree: the inner plan
    * resolves against the same session state (temp views, catalog) the
    * outer statement sees, and the outer analyzer treats it as resolved. */
  private[graft] def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Register one TVF with arity checking (shared with [[SqlSurfaceMacros]]). */
  private[graft] def tvf(ext: SparkSessionExtensions)
                        (name: String, usage: String, arity: Range)
                        (build: Seq[Expression] => LogicalPlan): Unit = {
    tvfRegistry.put(name, (usage, arity))
    ext.injectTableFunction((FunctionIdentifier(name), info(name, usage),
      (children: Seq[Expression]) => {
        require(arity.contains(children.length),
          s"$name: expected ${arity.min}" +
            (if (arity.max != arity.min) s"-${arity.max}" else "") +
            s" arguments ($usage), got ${children.length}")
        build(children)
      }))
  }

  /** table + N column-name string args, all positional (shared). */
  private[graft] def tvfColsIn(ext: SparkSessionExtensions)
                              (name: String, usage: String, nCols: Int)
                              (build: (DataFrame, Seq[String]) => DataFrame): Unit =
    tvf(ext)(name, usage, (nCols + 1) to (nCols + 1)) { args =>
      val df = tableArg(name, args.head, "table")
      val cols = args.tail.zipWithIndex.map { case (a, i) =>
        strArg(name, a, s"column argument ${i + 1}") }
      plan(build(df, cols))
    }

  def install(ext: SparkSessionExtensions): Unit = {
    def tvf(name: String, usage: String, arity: Range,
            build: Seq[Expression] => LogicalPlan): Unit =
      GraftSqlSurface.tvf(ext)(name, usage, arity)(build)

    def tvfCols(name: String, usage: String, nCols: Int)
               (build: (DataFrame, Seq[String]) => DataFrame): Unit =
      tvfColsIn(ext)(name, usage, nCols)(build)

    // ---- diff / publish-gate family -------------------------------------
    tvf("graft_symmetric_diff", "graft_symmetric_diff(tableA, tableB)", 2 to 2,
      args => plan(graft.ops.Diff.symmetricDiff(
        tableArg("graft_symmetric_diff", args(0), "tableA"),
        tableArg("graft_symmetric_diff", args(1), "tableB"))))
    def keysTvf(name: String,
                build: (DataFrame, DataFrame, Seq[String]) => DataFrame): Unit =
      tvf(name, s"$name(tableOld, tableNew, keysCsv)", 3 to 3, args =>
        plan(build(tableArg(name, args(0), "tableOld"),
          tableArg(name, args(1), "tableNew"),
          strArg(name, args(2), "keysCsv").split(',').map(_.trim).toSeq)))
    keysTvf("graft_added_rows", graft.ops.Diff.addedRows)
    keysTvf("graft_removed_rows", graft.ops.Diff.removedRows)
    keysTvf("graft_changed_keys", graft.ops.Diff.changedKeys)

    // ---- profiling ------------------------------------------------------
    tvf("graft_null_census", "graft_null_census(table)", 1 to 1,
      args => plan(graft.ops.Agg.nullCensusJson(
        tableArg("graft_null_census", args.head, "table"))))

    // ---- statistics macros (ops/Stats) ----------------------------------
    tvfCols("graft_mad", "graft_mad(table, groupCol, valCol)", 2) {
      (df, c) => graft.ops.Stats.madByGroup(df, c(0), c(1)) }
    tvfCols("graft_welch", "graft_welch(table, groupCol, valCol)", 2) {
      (df, c) => graft.ops.Stats.welchOneVsRest(df, c(0), c(1)) }
    tvfCols("graft_mann_whitney", "graft_mann_whitney(table, groupCol, valCol)", 2) {
      (df, c) => graft.ops.Stats.mannWhitneyOneVsRest(df, c(0), c(1)) }
    tvfCols("graft_ks", "graft_ks(table, groupCol, valCol)", 2) {
      (df, c) => graft.ops.Stats.ksOneVsRest(df, c(0), c(1)) }
    tvfCols("graft_ols_trend", "graft_ols_trend(table, keyCol, tsUsCol)", 2) {
      (df, c) => graft.ops.Stats.olsTrend(df, c(0), c(1)) }
    tvfCols("graft_gini", "graft_gini(table, keyCol, valCol)", 2) {
      (df, c) => graft.ops.Stats.giniByGroup(df, c(0), c(1)) }
    tvfCols("graft_mode", "graft_mode(table, groupCol, valCol)", 2) {
      (df, c) => graft.ops.Stats.modeByGroup(df, c(0), c(1)) }
    tvfCols("graft_spearman", "graft_spearman(table, groupCol, xCol, yCol)", 3) {
      (df, c) => graft.ops.Stats.spearmanByGroup(df, c(0), c(1), c(2)) }
    tvfCols("graft_theil_sen", "graft_theil_sen(table, keyCol, timeCol, valCol)", 3) {
      (df, c) => graft.ops.Stats.theilSen(df, c(0), c(1), c(2)) }
    tvfCols("graft_weighted_median",
      "graft_weighted_median(table, groupCol, valCol, weightCol)", 3) {
      (df, c) => graft.ops.Stats.weightedMedianByGroup(df, c(0), c(1), c(2)) }
    tvf("graft_trimmed_mean",
      "graft_trimmed_mean(table, groupCol, valCol, trimBp)", 4 to 4, args =>
        plan(graft.ops.Stats.trimmedMeanByGroup(
          tableArg("graft_trimmed_mean", args(0), "table"),
          strArg("graft_trimmed_mean", args(1), "groupCol"),
          strArg("graft_trimmed_mean", args(2), "valCol"),
          longArg("graft_trimmed_mean", args(3), "trimBp"))))

    // ---- dedup gates ----------------------------------------------------
    tvfCols("graft_exact_dedup", "graft_exact_dedup(table, textCol, idCol)", 2) {
      (df, c) => graft.llm.Dedup.exactDedup(df, c(0), c(1)) }
    tvfCols("graft_dedup_keep_first",
      "graft_dedup_keep_first(table, textCol, idCol)", 2) {
      (df, c) => graft.llm.Dedup.dedupKeepFirst(df, c(0), c(1)) }

    // ---- reshape --------------------------------------------------------
    tvfCols("graft_melt_quant", "graft_melt_quant(table, geneCol)", 1) {
      (df, c) => graft.pipelines.StagedBuilds.meltQuantMatrix(df, c(0)) }

    // ---- joins / dedup / windows / gates (round 13 breadth) -------------
    SqlSurfaceMacros.install(ext)
    // ---- composite pipelines (round 14) ----------------------------------
    SqlSurfaceComposites.install(ext)
  }
}
