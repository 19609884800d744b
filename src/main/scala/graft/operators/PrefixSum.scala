package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix-sum (shard → per-shard cumsum → tiny offset
  * table broadcast back) shared by the ranking/accumulation operators:
  * Spearman mid-ranks (q10j), the weighted median (q10m), and systematic
  * PPS sampling (mix_pps_sample); ts_concurrency carries its own
  * time-sharded variant of the same shape. The only globally-ordered
  * object is the per-group shard-total table (≤ nShards rows per group),
  * so nothing data-sized ever passes through a single-task window.
  */
object PrefixSum {

  /** Value-range shard id over broadcast per-group bounds: shard
    * boundaries follow the value order, so per-shard cumsums + shard
    * offsets compose to the global running sum. Degenerate ranges
    * (hi ≤ lo) collapse to shard 0.
    */
  def rangePid(v: Column, lo: Column, hi: Column, nShards: Int): Column =
    when(hi <= lo, lit(0L)).otherwise(
      least(lit(nShards - 1L), floor((v - lo) * nShards / (hi - lo))))

  /** Adds `cum` — the running sum of `weightCol` over `orderCol` within
    * `partCols` — to `df`. `df` must carry an integer shard column
    * `pidCol` consistent with the order (all rows of shard p precede
    * shard p+1 rows in `orderCol`, per group — what [[rangePid]]
    * produces). NOTE: `df` is instantiated twice (offset totals + the
    * main pass); materialize it first if its lineage is expensive.
    */
  def shardedCumSum(df: DataFrame, partCols: Seq[String], pidCol: String,
      orderCol: String, weightCol: String): DataFrame = {
    val parts = partCols.map(col)
    val localW = Window.partitionBy(parts :+ col(pidCol): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = (if (parts.isEmpty) Window.orderBy(col(pidCol))
      else Window.partitionBy(parts: _*).orderBy(col(pidCol)))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(parts :+ col(pidCol): _*)
      .agg(sum(col(weightCol)).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select(parts :+ col(pidCol) :+ col("__off"): _*)
    df.withColumn("__lc", sum(col(weightCol)).over(localW))
      .join(broadcast(offsets), partCols :+ pidCol)
      .withColumn("cum", col("__lc") + col("__off"))
      .drop("__lc", "__off")
  }
}
