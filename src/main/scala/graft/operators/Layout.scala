package graft.operators

import graft.Tables.t
import graft.functions.ZOrderFunction
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout operators: write-time clustering so that 100 TB scans
  * prune. Z-ordering two filter columns means parquet row-group min/max
  * stats stay narrow in BOTH dimensions — a `WHERE x BETWEEN … AND y
  * BETWEEN …` scan then skips most row groups, which is the difference
  * between a pruned scan and a full sweep at scale. (The same clustering
  * decision Delta/Iceberg expose as OPTIMIZE ZORDER, here as a plain
  * DataFrame transform usable in front of any parquet/bucketed write.)
  */
object Layout {

  /** Cluster `df` for writing: range-partition + locally sort by the
    * Morton interleave of two 16-bit-quantized dimensions. One range
    * exchange (sampled bounds) + per-partition sort — the standard
    * scalable write path, no global sort.
    */
  def zorderCluster(df: DataFrame, xCol: String, yCol: String,
      partitions: Int): DataFrame = {
    val z = ZOrderFunction.zorder2(
      col(xCol).cast(LongType), col(yCol).cast(LongType))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Small-files compaction: rewrite `df` into files of roughly
    * `targetBytes` each. File count is derived from the optimizer's size
    * estimate (for parquet scans that is the real input byte size), so a
    * directory of ten thousand 1 MB files becomes ~80 × 128 MB files in
    * one shuffle-free-read → repartition → write pass. This is the
    * maintenance half of the layout story: streaming ingestion and
    * fine-grained upserts fragment tables, and 100 TB scan throughput
    * dies on per-file open costs long before it dies on bytes.
    *
    * Returns the partition count used. `repartition` (round-robin) keeps
    * output sizes even; use [[zorderCluster]] ahead of the write when the
    * table also wants clustering.
    */
  def compact(df: DataFrame, outDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0)
    val inputBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1, math.ceil(
      inputBytes.toDouble / targetBytes.toDouble).toInt)
    df.repartition(n).write.mode("overwrite").parquet(outDir)
    n
  }

  /** Driver-gate query: the interleave itself, oracled bit-for-bit (the
    * DuckDB side reproduces it as an unrolled shift/mask sum).
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame = {
    ZOrderFunction.register(s)
    t(s, dir, "events")
      .select(col("event_id"),
        (col("user_id") % 65536L).as("x"),
        (floor(col("value")).cast(LongType) % 65536L).as("y"))
      .select(col("event_id"),
        ZOrderFunction.zorder2(col("x"), col("y")).as("z"))
      .orderBy(col("event_id"))
  }

  /** Equi-depth range partitioner: split a sort key into `k` contiguous
    * shards of (near-)equal row count — the boundary-computation half of
    * `repartitionByRange`, made explicit so the layout is INSPECTABLE
    * (per-shard count + min/max prove balance and disjointness in one
    * output) and REUSABLE (persist the boundaries, route later batches
    * through the same ranges — how write-time clustering keeps file
    * ranges stable across daily loads while Spark's sampled
    * RangePartitioner would re-draw them every run).
    *
    * Boundary b_i is the definitional discrete percentile (smallest key
    * with cum·k ≥ i·tot). The scalable shape, hazard by hazard:
    *   - cum comes from the sharded prefix sum ([[PrefixSum]]) over the
    *     per-value histogram — no single-task global window anywhere;
    *   - each histogram row knows locally which boundaries it crosses
    *     (`(cum-w)·k div tot < i ≤ cum·k div tot` — the PPS systematic-
    *     hit trick), so boundary extraction emits ≤ k rows total with no
    *     k-way explode of the histogram;
    *   - assignment broadcasts the ≤(k-1)-element boundary array and
    *     scans it per row (the 15-compare equivalent of the binary
    *     search inside RangePartitioner) — map-side, no shuffle.
    * At gate scale the percentile is exact end-to-end; at 100 TB the
    * same plan holds (the histogram is the only value-keyed shuffle),
    * or swap the exact cum for approx_percentile boundaries when
    * ±0.1%-sized shards are acceptable — assignment is unchanged.
    */
  def rangePartitionStats(fact: DataFrame, valueCol: String, k: Int,
      nShards: Int = 32): DataFrame = {
    val vals = fact.select(col(valueCol).cast("double").as("v"))
    val hist = vals.groupBy(col("v")).agg(count(lit(1)).as("w"))
    val bounds = hist.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("w")).as("tot"))
      .localCheckpoint(true) // one row; feeds every histogram shard pid
    val cum = PrefixSum.shardedCumSum(
      hist.crossJoin(broadcast(bounds))
        .withColumn("pid",
          PrefixSum.rangePid(col("v"), col("lo"), col("hi"), nShards)),
      Seq.empty, "pid", "v", "w")
    val boundaries = cum
      .withColumn("ilo", expr(s"((cum - w) * $k) div tot"))
      .withColumn("ihi", least(expr(s"(cum * $k) div tot"), lit(k - 1L)))
      .filter(col("ihi") > col("ilo"))
      .select(explode(sequence(col("ilo") + 1, col("ihi"))).as("i"),
        col("v").as("bv"))
    val barr = boundaries
      .agg(sort_array(collect_list(col("bv"))).as("barr"))
    vals.crossJoin(broadcast(barr))
      .select(col("v"),
        size(filter(col("barr"), b => col("v") >= b)).cast(LongType).as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("v")), 6).as("lo"), round(max(col("v")), 6).as("hi"))
      .orderBy(col("shard"))
  }

  /** layout_range_partition — 16-shard equi-depth layout of orders by
    * o_totalprice: shard id, row count, and value range per shard.
    */
  def rangePartitionOrders(s: SparkSession, dir: String): DataFrame =
    rangePartitionStats(t(s, dir, "orders"), "o_totalprice", 16)
}
