package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.llm.{HyperplaneBucket, PortableHash60Expr, SimHash64, SimHashPortable60}
import graft.types.TypeSetAgg

/**
 * Session-extension installer for graft's native Catalyst expressions —
 * the proper way to make them available in EVERY session (SQL included)
 * without per-call `register(spark)` plumbing:
 *
 * {{{
 *   spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * Registers: `graft_simhash64(array<string>)`,
 * `graft_simhash_p60(array<string>)`, `graft_phash60(string)`,
 * `graft_hyperplane_bucket(array<float>, nPlanes)`,
 * `graft_type_set(col)` (the one-pass type-inference aggregate),
 * `graft_bpe_count(string)` (BPE token count, default merges table);
 * plus the [[graft.plans.FuseSiblingAggregates]] pre-CBO optimizer rule.
 *
 * The per-object `register` helpers remain for ad-hoc sessions; the Column
 * APIs in [[graft.llm]] work with or without the extension installed.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        (children: Seq[Expression]) => builder(children)): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    // every unary builder checks arity: `children.head` on zero args would
    // surface as an opaque NoSuchElementException at plan time, and extra
    // args would be silently ignored
    def unary(name: String, usage: String, build: Expression => Expression): Unit =
      inject(name, usage, children => {
        require(children.length == 1,
          s"$name(col) takes exactly 1 argument, got ${children.length}")
        build(children.head)
      })

    unary("graft_simhash64", "64-bit SimHash over a token array (xxhash64 votes)",
      SimHash64(_))
    unary("graft_simhash_p60", "portable 60-bit SimHash over a token array (md5-derived votes)",
      SimHashPortable60(_))
    unary("graft_phash60", "portable 60-bit string hash (first 15 md5 hex chars)",
      PortableHash60Expr(_))
    inject("graft_hyperplane_bucket", "hyperplane sign-bucket of a float vector",
      children => {
        // arity/foldability guarded here: eval on a non-foldable or null
        // int arg would otherwise surface as a raw internal exception
        require(children.length == 2 || children.length == 3,
          s"graft_hyperplane_bucket(vec, nPlanes[, planeOffset]) takes 2 or 3 arguments, got ${children.length}")
        def lit(e: Expression, what: String): Int = {
          require(e.foldable, s"graft_hyperplane_bucket: $what must be a literal")
          e.eval() match {
            case n: Number => n.intValue()
            case null => throw new IllegalArgumentException(
              s"graft_hyperplane_bucket: $what must not be NULL")
            case other => throw new IllegalArgumentException(
              s"graft_hyperplane_bucket: $what must be a numeric literal, got $other")
          }
        }
        val off = if (children.length == 3) lit(children(2), "planeOffset") else 0
        HyperplaneBucket(children.head, lit(children(1), "nPlanes"), off)
      })
    unary("graft_type_set", "one-pass BigQuery-style type-set aggregate",
      TypeSetAgg(_))
    unary("graft_bpe_count", "BPE token count (DefaultMerges table)",
      graft.llm.BpeCountExpr(_, graft.llm.Bpe.DefaultMerges))
    unary("graft_bpe_encode", "BPE token sequence, space-joined (DefaultMerges table)",
      graft.llm.BpeEncodeExpr(_, graft.llm.Bpe.DefaultMerges))

    // SQL-callable table functions over the DataFrame macro library
    // (graft_symmetric_diff, graft_mad, graft_trimmed_mean, …): the
    // BigQuery-SQL-shaped entry point — see [[GraftSqlSurface]]
    GraftSqlSurface.install(ext)

    // sibling-aggregate fusion (SURVEY §4: collapse repeated same-key
    // aggregates of one child into one shuffle) — pre-CBO so pruning and
    // pushdown have already stabilized the aggregate branches it matches
    ext.injectPreCBORule(_ => graft.plans.FuseSiblingAggregates)
  }
}
