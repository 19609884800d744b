package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit, xxhash64}

/** Column-API bridge to Spark's own bloom-filter machinery.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its runtime shuffle-join filters (InjectRuntimeFilter), but leaves
  * them out of the public function registry. We register them under
  * graft names through the same temp-function hook the analyzer uses for
  * built-ins, so user plans can do explicitly what the optimizer does
  * implicitly: reduce a build side to a fixed-size bit-array sketch and
  * prefilter the probe side map-side before any join/shuffle.
  *
  * Both expressions are codegen'd (BloomFilterMightContain sits in scan
  * hot paths when the optimizer injects it), so the prefilter stays
  * inside whole-stage codegen.
  */
object BloomBridge {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // bloom_agg(xxhash64-long, estimatedItems, numBits) -> binary sketch.
    // Bit-OR merge is commutative, so the sketch bytes are deterministic
    // under any partitioning/merge order.
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_might_contain",
      exprs => new BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  /** Aggregate a LongType hash column into a bloom sketch of `numBits`
    * bits sized for `estimatedItems` insertions.
    */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", hashed, lit(estimatedItems), lit(numBits))

  /** Membership probe; pair with the same xxhash64 used at build time.
    * No false negatives; false-positive rate set by numBits/items.
    * `sketchDf` must be 1 row × 1 binary column; it enters the plan as a
    * scalar subquery (BloomFilterMightContain rejects join-produced
    * attributes — its bloom input must be constant-like, and the scalar
    * subquery is exactly how the optimizer's own runtime filters feed it:
    * executed once, result inlined).
    */
  def mightContain(sketchDf: org.apache.spark.sql.DataFrame, hashed: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      new BloomFilterMightContain(
        org.apache.spark.sql.GraftSqlShim.scalarSubquery(sketchDf),
        org.apache.spark.sql.GraftSqlShim.expression(hashed)))

  /** Convenience: hash a value column the way the sketch expects. */
  def h(value: Column): Column = xxhash64(value)
}
