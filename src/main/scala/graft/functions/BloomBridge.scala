package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Column-API bridge to Spark's own bloom-filter machinery.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its runtime shuffle-join filters (InjectRuntimeFilter) but exposes
  * neither in the public function registry, so this wraps the raw
  * expressions into Columns directly — no session registration needed,
  * any DataFrame plan can do explicitly what the optimizer does
  * implicitly: reduce a build side to a fixed-size bit-array sketch and
  * prefilter the probe side map-side before any join/shuffle.
  *
  * Both expressions are codegen'd (BloomFilterMightContain sits in scan
  * hot paths when the optimizer injects it), so the prefilter stays
  * inside whole-stage codegen.
  */
object BloomBridge {

  /** Aggregate a LongType hash column into a bloom sketch of `numBits`
    * bits sized for `estimatedItems` insertions. Bit-OR merge is
    * commutative, so the sketch bytes are deterministic under any
    * partitioning/merge order.
    */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    GraftSqlShim.column(
      new BloomFilterAggregate(GraftSqlShim.expression(hashed),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe; pair with the same xxhash64 used at build time.
    * No false negatives; false-positive rate set by numBits/items.
    * `sketchDf` must be 1 row × 1 binary column; it enters the plan as a
    * scalar subquery (BloomFilterMightContain rejects join-produced
    * attributes — its bloom input must be constant-like, and the scalar
    * subquery is exactly how the optimizer's own runtime filters feed it:
    * executed once, result inlined).
    */
  def mightContain(sketchDf: org.apache.spark.sql.DataFrame, hashed: Column): Column =
    GraftSqlShim.column(
      new BloomFilterMightContain(
        GraftSqlShim.scalarSubquery(sketchDf),
        GraftSqlShim.expression(hashed)))

  /** Membership probe against already-materialized sketch bytes, inlined
    * as a binary literal. The streaming-plan form: scalar subqueries
    * don't exist inside a streaming query, but a bounded (1 MiB by
    * construction) sketch computed once at query build is a legitimate
    * plan constant — the micro-batches then filter map-side with zero
    * per-batch joins or state.
    */
  def mightContain(sketchBytes: Array[Byte], hashed: Column): Column =
    GraftSqlShim.column(
      new BloomFilterMightContain(
        Literal.create(sketchBytes, org.apache.spark.sql.types.BinaryType),
        GraftSqlShim.expression(hashed)))

  /** Convenience: hash a value column the way the sketch expects. */
  def h(value: Column): Column = xxhash64(value)
}
