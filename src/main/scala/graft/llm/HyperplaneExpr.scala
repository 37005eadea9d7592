package graft.llm

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native hyperplane sign-bucket — codegen'd Catalyst `Expression` twin of
 * [[Ann.hyperplaneBucket]]: projects the vector onto `nPlanes`
 * deterministic pseudo-random hyperplanes in one tight double loop and
 * packs the projection signs into a long. Replaces nPlanes × dim
 * `zip_with`/`aggregate` folds (per-plane Catalyst array allocations).
 *
 * Plane coefficients match [[Ann.planeCoeff]] exactly (MurmurHash3 of
 * (plane, dim) scaled to [-1, 1)), so buckets are interchangeable with the
 * expression-composed version.
 */
case class HyperplaneBucket(child: Expression, nPlanes: Int,
                             planeOffset: Int = 0)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bucket requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket"

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData], nPlanes, planeOffset, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.llm.HyperplaneBucket.compute($c, $nPlanes, $planeOffset, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {

  // coefficient cache: (planeOffset, nPlanes, dim) → row-major
  // [local plane][dim] array; plane index offset+i selects which planes of
  // the one deterministic global family this slice covers (table t of a
  // multi-table LSH index uses offset = t·nPlanes — disjoint planes per
  // table, identical on every executor and run)
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def coeffs(planeOffset: Int, nPlanes: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((planeOffset, nPlanes, dim), { case (off, p, d) =>
      val arr = new Array[Double](p * d)
      var i = 0
      while (i < p) {
        var j = 0
        while (j < d) {
          arr(i * d + j) = scala.util.hashing.MurmurHash3.productHash((off + i, j))
            .toDouble / Int.MaxValue.toDouble
          j += 1
        }
        i += 1
      }
      arr
    })

  def compute(vec: ArrayData, nPlanes: Int, planeOffset: Int, isFloat: Boolean): Long = {
    val dim = vec.numElements()
    val cs = coeffs(planeOffset, nPlanes, dim)
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var d = 0
      val base = p * dim
      while (d < dim) {
        val v = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        acc += v * cs(base + d)
        d += 1
      }
      if (acc >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  private def intLit(e: Expression, what: String): Int = {
    require(e.foldable, s"graft_hyperplane_bucket: $what must be a literal")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_hyperplane_bucket: $what must be a numeric literal, got $other")
    }
  }

  /** Register `graft_hyperplane_bucket(vec, nPlanes[, planeOffset])`.
    * Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_bucket",
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          s"graft_hyperplane_bucket(vec, nPlanes[, planeOffset]) takes 2 or 3 arguments, got ${children.length}")
        val off = if (children.length == 3) intLit(children(2), "planeOffset") else 0
        HyperplaneBucket(children.head, intLit(children(1), "nPlanes"), off)
      }, "scala_udf")

  /** Column form over a named vector column (registers on call). */
  def bucketCol(spark: org.apache.spark.sql.SparkSession, vecCol: String,
                nPlanes: Int, planeOffset: Int = 0): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(
      s"graft_hyperplane_bucket(`$vecCol`, $nPlanes, $planeOffset)")
  }
}
