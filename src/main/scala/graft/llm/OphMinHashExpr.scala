package graft.llm

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * One-Permutation-Hashing MinHash signature (Li, Owen & Zhang, NIPS 2012)
 * with rotation densification (Shrivastava & Li, ICML 2014) — a native
 * codegen'd Catalyst `Expression` computing the whole k-wide signature in
 * ONE pass over the hashed-shingle array.
 *
 * The classic signature ([[Dedup.minhashFromShingles]]) evaluates k
 * independent seed-mixes, each a full `transform` + `array_min` over the
 * shingle array — O(k·n) hash work and 2k Catalyst array allocations per
 * row. OPH instead assigns each shingle hash to one of k bins (its value
 * mod k) and takes the per-bin min — O(n + k) with a single stack-local
 * long[] buffer. Empty bins borrow from the nearest filled bin to the
 * right (circularly), offset by `distance · C` so borrowed values from
 * different distances cannot collide coherently — the "rotation" scheme
 * whose pair-collision probability matches classic MinHash in expectation.
 *
 * Value domain: inputs are masked to 60 bits (`h & (2^60−1)`) first, so
 * bins and mins are identical for the md5-derived [[PortableFamily]]
 * hashes (already < 2^60, mask is the identity) and for full-range
 * xxhash64 longs — and `min + 31·C` cannot overflow ANSI long arithmetic.
 * Every step (mask, mod-k bin, per-bin min, rotation borrow) is plain
 * integer SQL, so the DuckDB oracle replays the ENTIRE signature exactly.
 *
 * Returns an EMPTY array for an empty input (callers pre-filter shingle-
 * less docs and null the signature, as [[Dedup.lshBands]] does — an empty
 * array must never reach banding, where it would constant-bucket).
 */
case class OphMinHash(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_oph_minhash requires array<bigint> and k > 0, got ${other.catalogString}, k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_oph_minhash"

  override def nullSafeEval(input: Any): Any =
    OphMinHash.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.OphMinHash.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): OphMinHash =
    copy(child = newChild)
}

object OphMinHash {

  /** 60-bit mask: keeps values non-negative and leaves headroom for the
    * densification offsets under ANSI arithmetic. */
  val Mask60: Long = (1L << 60) - 1

  /** Densification step constant: borrowed value = min[(j+t) mod k] + t·C.
    * Any fixed C > 0 works (it only needs to separate borrow distances);
    * the DuckDB oracle interpolates the same constant. */
  val C: Long = 1000003L

  /** Static helper shared by interpreted eval and generated code. */
  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var filled = 0
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val v = hashes.getLong(i) & Mask60
        val bin = (v % k).toInt
        if (mins(bin) == Long.MaxValue) filled += 1
        if (v < mins(bin)) mins(bin) = v
      }
      i += 1
    }
    if (filled == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      if (mins(j) != Long.MaxValue) out(j) = mins(j)
      else {
        var t = 1
        while (mins((j + t) % k) == Long.MaxValue) t += 1
        out(j) = mins((j + t) % k) + t * C
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
