package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch pre-aggregation (the sketch-cube pattern): distinct
  * counts at 100 TB are not re-scanned per reporting grain — a fine-grain
  * pre-agg table stores one DataSketches HLL sketch per cell, and every
  * coarser rollup (week, month, all-time) MERGES sketches instead of
  * touching the fact table again. Sketch merge is associative and
  * commutative, so the rollup is one tiny shuffle of fixed-size binary
  * buffers regardless of fact cardinality; a COUNT(DISTINCT) rollup would
  * re-shuffle every distinct key per grain.
  *
  * Approximate by contract (like q12): no DuckDB hash oracle — the spec
  * asserts the merged estimates land within HLL's error envelope of the
  * exact per-week distincts, and that daily-sketch merge ≡ direct weekly
  * sketch on the same data.
  */
object SketchRollup {

  /** Fine-grain pre-agg: one (day, event_type) row carrying an HLL
    * sketch of distinct users plus exact additive counters.
    */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
        count(lit(1)).as("n_events"))

  /** Coarse rollup from the pre-agg only: merge day sketches to weeks.
    * The fact table is not read here — that is the point.
    */
  def weeklyFromDaily(daily: DataFrame): DataFrame =
    daily
      .groupBy(date_trunc("week", col("day")).as("week"), col("event_type"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("approx_users"),
        sum(col("n_events")).as("n_events"))

  /** Driver-gate query: weekly approximate distinct users per event_type
    * via the daily-sketch merge path. Approximate → rows-only check.
    */
  def sketchRollup(s: SparkSession, dir: String): DataFrame =
    weeklyFromDaily(dailyUserSketches(t(s, dir, "events")))
      .select(unix_micros(col("week")).as("week_us"), col("event_type"),
        col("approx_users"), col("n_events"))
      .orderBy(col("week_us"), col("event_type"))

  /** sketch_sliding_users — the approximate path for the trailing-7-day
    * distinct-user series (q30c's exact twin): ONE day-grain sketch per
    * day, each sliding window merges its ≤7 fixed-size sketch buffers.
    * Where the exact form re-shuffles (user, window) pairs — ×7 the
    * distinct activity volume — this moves 7 × 16KB per window
    * regardless of user cardinality: the only DAU/WAU shape that
    * survives when users number in the billions. Approximate by contract
    * (like q12/sketch_rollup) → spec envelope vs q30c + rows-only gate.
    */
  def slidingUserSketches(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = t(s, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / dayUs).cast("long").as("day"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val days = daily.select(col("day")).distinct()
    daily
      .withColumn("wday", explode(sequence(col("day"), col("day") + 6)))
      .join(days.withColumnRenamed("day", "wday"), Seq("wday"), "left_semi")
      .groupBy(col("wday"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .withColumnRenamed("wday", "day")
      .orderBy(col("day"))
  }
}
