package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance: coarse-grain rollups derived by
  * MERGING fine-grain partials instead of rescanning facts — the exact
  * counterpart of the sketch rollup (SketchRollup merges HLL buffers;
  * this merges the algebraic aggregate set). The point at 100 TB: the
  * daily partial table is maintained per ingest batch (facts scanned
  * once, ever), and every coarser grain — monthly here — is an
  * aggregation over partial ROWS, whose count is grain-cardinality, not
  * fact-cardinality.
  *
  * Only algebraic aggregates qualify: sum/count/min/max merge by
  * sum/sum/min/max, avg derives as merged-sum / merged-count (merging
  * avgs directly would weight days equally regardless of row count —
  * the classic rollup-maintenance bug). count_distinct does NOT merge —
  * that's what the sketch rollup's HLL buffers are for.
  *
  * The driver gate proves merge ≡ direct: the oracle computes the
  * monthly numbers straight from the fact table, while this plan never
  * touches facts at month grain.
  */
object RollupMerge {

  /** Per-(day, type) algebraic partials — the incrementally-maintained
    * base table (exact decimal sums; all mergeable).
    */
  def dailyPartials(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))

  /** agg_incremental_rollup — monthly stats merged from the daily
    * partials. Output matches a direct monthly aggregation bit-for-bit
    * (decimal sums re-associate exactly; min/max are idempotent).
    */
  def monthlyFromDaily(s: SparkSession, dir: String): DataFrame =
    dailyPartials(t(s, dir, "events"))
      .groupBy(date_trunc("month", col("day")).as("month"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("sv")).cast(DoubleType), 2).as("sum_value"),
        min(col("mn")).as("min_value"), max(col("mx")).as("max_value"),
        round(sum(col("sv")).cast(DoubleType) / sum(col("n")), 6)
          .as("avg_value"))
      .orderBy(col("month"), col("event_type"))
}
