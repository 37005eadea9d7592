package graft.llm

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Classic k-seed MinHash signature in ONE pass — a native codegen'd
 * Catalyst `Expression` producing values BIT-IDENTICAL to the staged HOF
 * form `array((0 until k).map(i => array_min(transform(sh, h =>
 * seedMix(h, i)))))` that [[Dedup.minhashFromShingles]] used before
 * round 14, for both hash families:
 *
 *  - xx family: `seedMix(h, i) = xxhash64(h, i)` — replayed here as
 *    `XXH64.hashInt(i, XXH64.hashLong(h, 42L))`, exactly Spark's
 *    left-to-right child fold with the default seed 42. A NULL element
 *    contributes `XXH64.hashInt(i, 42L)` (Spark's XxHash64 skips null
 *    children, leaving the running hash at the seed), matching the HOF.
 *  - portable family: `seedMix(h, i) = (a_i·(h mod P) + b_i) mod P` over
 *    [[PortableFamily.seeds]] — plain long arithmetic, same on both
 *    paths. A NULL element yields a NULL mix which `array_min` ignores,
 *    so it is skipped here too.
 *
 * Why: the HOF form is O(k·n) with 2k Catalyst array allocations per row
 * — QueryProbe measured the signature stage of the l5/l6/l13 audits at
 * 16 CPU-seconds per run at sf0.1 (the suite's single hottest stage).
 * One traversal with a stack-local long[k] removes every intermediate
 * array; the DuckDB oracle replay (portable family) is unchanged because
 * the VALUES are unchanged.
 *
 * Degenerate inputs (never produced by [[Dedup.lshBands]], which
 * pre-filters shingle-less docs and null-guards the signature): an empty
 * array returns an empty array; an all-NULL portable input returns k
 * NULLs (= array_min of an all-null array per seed).
 */
case class MinHashSeeds(child: Expression, k: Int, portable: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 && k <= 64 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_seeds requires array<bigint> and 0 < k <= 64, got ${other.catalogString}, k=$k")
  }
  // nullable entries only on the degenerate all-null portable input
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_seeds"

  override def nullSafeEval(input: Any): Any =
    MinHashSeeds.compute(input.asInstanceOf[ArrayData], k, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.MinHashSeeds.compute($c, $k, $portable)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSeeds =
    copy(child = newChild)
}

object MinHashSeeds {

  private val A: Array[Long] = PortableFamily.seeds.map(_._1).toArray
  private val B: Array[Long] = PortableFamily.seeds.map(_._2).toArray
  private val P: Long = PortableFamily.P

  /** Static helper shared by interpreted eval and generated code. */
  def compute(hashes: ArrayData, k: Int, portable: Boolean): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var sawValue = false
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) {
        if (!portable) {
          // xxhash64(NULL, i): null child skipped, running hash stays 42
          var s = 0
          while (s < k) {
            val v = XXH64.hashInt(s, 42L)
            if (v < mins(s)) mins(s) = v
            s += 1
          }
          sawValue = true
        } // portable: NULL mix, ignored by array_min — skip
      } else {
        val h = hashes.getLong(i)
        if (portable) {
          val hp = h % P
          var s = 0
          while (s < k) {
            val v = (A(s) * hp + B(s)) % P
            if (v < mins(s)) mins(s) = v
            s += 1
          }
        } else {
          val h1 = XXH64.hashLong(h, 42L)
          var s = 0
          while (s < k) {
            val v = XXH64.hashInt(s, h1)
            if (v < mins(s)) mins(s) = v
            s += 1
          }
        }
        sawValue = true
      }
      i += 1
    }
    if (!sawValue) new GenericArrayData(Array.fill[Any](k)(null)) // all-null portable
    else new GenericArrayData(java.util.Arrays.copyOf(mins, k))
  }
}
