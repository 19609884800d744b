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
}
