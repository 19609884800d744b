package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries frequent-items sketch as a mergeable aggregate — the
  * candidate-generation half of the two-phase exact heavy-hitters
  * pattern. A plain `GROUP BY key HAVING count(*) >= t` shuffles EVERY
  * distinct key; at 100 TB key cardinality that is the whole job's cost,
  * spent mostly on keys that cannot possibly pass the threshold. This
  * aggregate keeps at most k counters per partition (partial aggregation
  * runs map-side), so the shuffle carries one <= 2k-entry buffer per
  * partition instead of the key universe; a second pass then recounts
  * only the surviving candidates exactly.
  *
  * Guarantee (mergeable-summaries form, Agarwal et al., PODS 2012): each
  * compression subtracts the (k+1)-th largest stored count c from every
  * counter and drops the non-positive ones. One compression removes at
  * least (k+1)*c total count mass while any single item loses at most c,
  * and the removable mass is bounded by the stream length n — so the
  * total undercount of ANY item, across any update/merge order, is at
  * most n/(k+1). Every item with true frequency > n/(k+1) therefore
  * still holds a positive counter in the final sketch. Picking
  * k+1 > 1/f makes the sketch a guaranteed superset of the items with
  * frequency >= ceil(n*f); the exact recount removes false positives, so
  * the two-phase result equals the plain GROUP BY answer exactly.
  *
  * The buffer grows to 2k before compressing (amortized O(log k) per
  * row); compression keeps at most k entries (only counts strictly above
  * the (k+1)-th largest survive). NULL items are ignored. The sketch
  * CONTENTS may vary with partitioning — only the superset guarantee is
  * deterministic, which is why the recount pass is not optional.
  */
case class MisraGries(itemExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, "misra-gries needs k > 0")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  /** Subtract the (k+1)-th largest count from every entry; drop <= 0. */
  private def compress(buf: mutable.LongMap[Long]): Unit = {
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val c = counts(counts.length - (k + 1)) // (k+1)-th largest
      val keep = buf.iterator.filter(_._2 > c).map { case (i, n) => (i, n - c) }
        .toArray
      buf.clear()
      keep.foreach { case (i, n) => buf.update(i, n) }
    }
  }

  override def update(buf: mutable.LongMap[Long], input: InternalRow):
      mutable.LongMap[Long] = {
    val item = itemExpr.eval(input)
    if (item != null) {
      buf.update(item.asInstanceOf[Long],
        buf.getOrElse(item.asInstanceOf[Long], 0L) + 1L)
      if (buf.size > 2 * k) compress(buf)
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long]):
      mutable.LongMap[Long] = {
    other.foreach { case (i, n) => buf.update(i, buf.getOrElse(i, 0L) + n) }
    compress(buf)
    buf
  }

  /** Candidates as array<struct<item,cnt>>, count DESC then item ASC;
    * cnt is the stored (under-)count, a lower bound on the true count. */
  override def eval(buf: mutable.LongMap[Long]): Any = {
    val sorted = buf.toArray.sortBy { case (i, n) => (-n, i) }
    new GenericArrayData(sorted.map { case (i, n) => InternalRow(i, n): Any })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (i, n) => bb.putLong(i); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ => buf.update(bb.getLong, bb.getLong) }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_freq_candidates"
  override def children: Seq[Expression] = Seq(itemExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object FreqFunctions {
  /** Register `mg_freq_candidates(item, k)`; k must be a literal. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_freq_candidates", exprs => MisraGries(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")

  /** Column-API entry: Misra-Gries candidate set over a BIGINT item. */
  def mgFreqCandidates(item: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "mg_freq_candidates", item, org.apache.spark.sql.functions.lit(k))
}
