package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join rewrites for the shapes Catalyst would otherwise nested-loop or skew.
 */
object JoinOps {

  /**
   * OR-of-computed-keys join rewrite (SURVEY §7 "what's hard"): the
   * reference's `ON REGEXP_EXTRACT(a, re1) = key OR REGEXP_EXTRACT(a, re2)
   * = key` (gene_level_copy_number.py:57-59) is a theta join Catalyst must
   * nested-loop. Rewritten: one equi-join per key expression, UNION, then
   * DISTINCT — each leg hash-joins on its extracted key, so the plan is
   * shuffle-bounded at any scale. The reference applies SELECT DISTINCT on
   * top of the OR join, which makes the rewrite exactly equivalent.
   */
  def orOfKeysJoin(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[Column], rightKey: String): DataFrame =
    leftKeys.map { k =>
      left.withColumn("__k", k)
        .join(right, col("__k") === col(rightKey))
        .drop("__k")
    }.reduce(_ unionByName _).distinct()

  /**
   * Attach a 1-row aggregate (a "scalar" frame: grand total, global max,
   * corpus size) to every row of `df` as a BroadcastHashJoin. The naive
   * `df.crossJoin(broadcast(scalar))` plans a BroadcastNestedLoopJoin, and
   * a constant-key equi-join (`lit(1) === lit(1)`) gets folded back to a
   * cross join by ConstantPropagation, and a key that is constant on
   * EITHER side gets pushed below the join as a one-sided filter (again
   * leaving a condition-less cross join) — so BOTH keys are computed
   * non-foldably from their own side's columns: `pmod(hash(cols), 1) + 1`
   * is always 1, but no Catalyst rule simplifies a pmod by a literal, so
   * the condition keeps referencing both sides and the equi-join shape
   * holds. With a 1-row build side the broadcast is bytes; the probe-side
   * hash is one extra codegen'd expression per row.
   */
  def withScalar(df: DataFrame, scalar: DataFrame): DataFrame = {
    val one = (cs: Seq[Column]) => pmod(hash(cs: _*), lit(1)) + lit(1)
    val cols = scalar.columns.map(col).toIndexedSeq
    val keyed = scalar.select(one(cols).as("_sk") +: cols: _*)
    df.withColumn("_sk", one(Seq(col(df.columns.head))))
      .join(broadcast(keyed), "_sk").drop("_sk")
  }

  /**
   * Skew-salted equi-join: the big (skewed) side gets a deterministic salt
   * in [0, buckets) hashed from its full row; the small side is replicated
   * `buckets`× — the hot key's rows spread over `buckets` tasks instead of
   * one straggler. AQE's skew-join handles moderate skew automatically;
   * this is the explicit tool for extreme single-key skew (e.g. a
   * boilerplate dedup key at web scale).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val salt = pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong))
    val saltedBig = big.withColumn("__salt", salt)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /**
   * Join-key SKEW report — the diagnostic that decides between a plain
   * hash join, AQE skew splitting, and [[saltedJoin]]: the `topK`
   * heaviest key values with their exact row share, plus the suite-level
   * skew factor max/mean (both in integer micro-units — the straggler
   * multiplier an unsalted shuffle partition would see). All statistics
   * ride ONE corpus hash-agg; the ranking window runs over the
   * aggregated |keys| rows, never the input.
   */
  def skewReport(df: DataFrame, key: String, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key)).agg(count(lit(1)).cast("long").as("n"))
    // suite totals: ONE-row agg, attached via the broadcast scalar-join
    // trick (withScalar) — never an unpartitioned window over the counts
    // table (|keys| rows through a single task at corpus scale)
    val stats = counts.agg(sum(col("n")).cast("long").as("_rows"),
      count(lit(1)).cast("long").as("_keys"), max(col("n")).as("_max"))
    // top-K via TakeOrderedAndProject (distributed), then rank the K
    // survivors with a window that only ever sees topK rows
    val top = counts.orderBy(col("n").desc, col(key).asc).limit(topK)
    val w = Window.orderBy(col("n").desc, col(key).asc)
    withScalar(top.withColumn("rank", row_number().over(w).cast("long")), stats)
      .select(col("rank"), col(key), col("n"),
        expr("n * 1000000L div _rows").as("share_micro"),
        // widen the 3-term product through DECIMAL(38,0): _max·10⁶·_keys
        // silently wraps int64 once _max·_keys exceeds ~9.2·10¹² (a 10⁹-row
        // heavy key over 10⁷ distinct keys); 10³⁸ headroom covers any
        // realistic corpus, and `div` on decimals still returns BIGINT
        expr("CAST(_max AS DECIMAL(38,0)) * 1000000 * _keys div _rows")
          .cast("long").as("skew_factor_micro"))
  }
}
