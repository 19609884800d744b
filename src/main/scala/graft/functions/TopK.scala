package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-k rows per group as an AGGREGATE, not a window: `row_number()
  * OVER (PARTITION BY g ORDER BY v DESC) <= k` sorts every group's full
  * row set (at 100 TB: a massive shuffle followed by per-group sorts,
  * with one task per group as the degenerate few-key case). This
  * aggregate keeps a bounded k-element min-heap per group instead —
  * partial aggregation runs map-side, so each partition contributes at
  * most k candidates per group to the shuffle, and merge is O(k log k).
  * Memory is O(k) per group regardless of group size.
  *
  * Ordering contract: value DESC, id ASC on ties — deterministic for
  * globally unique ids. Output is the sorted array of (v, id) structs;
  * explode it for row-per-result shape.
  */
case class TopKByValue(valueExpr: Expression, idExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "top-k needs k > 0")

  // the queue pops its MAX first; define "worst of the kept set" as max:
  // smallest value, then largest id — exactly what eviction should drop
  private val evictionOrder: Ordering[(Double, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictionOrder)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) {
      buf.enqueue((v.asInstanceOf[Double], id.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]):
      mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (v, id) => (-v, id) }
    new GenericArrayData(sorted.map { case (v, id) =>
      InternalRow(v, id): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, id) => bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ => buf.enqueue((bb.getDouble, bb.getLong)) }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_value"
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKFunctions {
  /** Register `topk_by_value(v, id, k)`; the analyzer wraps the returned
    * AggregateFunction in an AggregateExpression at resolution. k must be
    * a literal (evaluated at plan time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by_value", exprs => TopKByValue(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")

  /** Column-API entry: top-k (value, id) pairs per group, value DESC. */
  def topkByValue(value: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "topk_by_value", value, id, org.apache.spark.sql.functions.lit(k))
}
