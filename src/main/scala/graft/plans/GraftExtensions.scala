package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point for the engine's native Catalyst
 * surface. Activate with:
 *
 *   spark.sql.extensions=graft.plans.GraftExtensions
 *
 * (or `SparkSession.builder.withExtensions(new GraftExtensions)`), after
 * which the functions resolve in SQL and through `expr(...)` on every
 * session of the context:
 *
 *  - `graft_simhash64(array<string>)`         → 64-bit SimHash (codegen'd)
 *  - `graft_hyperplane_bucket(vec, nPlanes)`  → LSH sign bucket (codegen'd)
 *  - `graft_type_set(col)`                    → one-pass BQ-type-set aggregate
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of a token array."),
      (children: Seq[Expression]) => graft.llm.SimHash64(children.head)))

    extensions.injectFunction((
      FunctionIdentifier("graft_hyperplane_bucket"),
      info("graft_hyperplane_bucket",
        "graft_hyperplane_bucket(vec, nPlanes) - hyperplane sign bucket of a vector."),
      (children: Seq[Expression]) => graft.llm.HyperplaneBucket(children.head,
        children(1).eval().asInstanceOf[Number].intValue())))

    extensions.injectFunction((
      FunctionIdentifier("graft_type_set"),
      info("graft_type_set",
        "graft_type_set(col) - aggregate: set of inferred BigQuery type names."),
      (children: Seq[Expression]) => graft.types.TypeSetAgg(children.head)))
  }
}
