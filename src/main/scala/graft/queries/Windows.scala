package graft.queries

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch forms of the streaming window operators (SURVEY.md §2.3 Q30/Q31):
  * `window`/`session_window` aggregations run identically over bounded
  * input, which is what makes them oracle-checkable in DuckDB; the
  * streaming forms (same expressions + watermark) live in
  * graft.streaming.StreamingOps and are golden-tested in StreamingSpec.
  *
  * Window bounds are exported as epoch micros (timestamp dtype units vary
  * across engines; integers don't).
  */
object Windows {

  /** Q30 (batch) — 1-minute tumbling counts per event_type. */
  def q30Tumble(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** Q30e (batch) — Flink's Window Deduplication TVF (keep the FIRST
    * row per key per window): one min-of-struct aggregate per
    * (10-minute window, user) carries a single candidate per group per
    * partition map-side — never a window-function sort; ties at the
    * same timestamp break on event_id. The streaming form is
    * `StreamingOps.windowDedupStream` — `dropDuplicates` with the
    * EVENT-TIME window struct among the keys (NOT
    * dropDuplicatesWithinWatermark, whose delay-based expiry re-emits
    * late same-window rows — spec-caught; see the streaming scaladoc).
    */
  def q30eWindowDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(min(struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
        col("event_type"))).as("f"),
        count(lit(1)).as("n_in_window"))
      .select(unix_micros(col("w.start")).as("w_start"), col("user_id"),
        col("f.event_id").as("first_event_id"),
        col("f.event_type").as("first_event_type"),
        col("f.ts_us").as("first_ts_us"), col("n_in_window"))
      .orderBy(col("w_start"), col("user_id"))

  /** Q31a (batch) — 1-minute windows sliding every 30 s (each event lands
    * in exactly 2 windows).
    */
  def q31Slide(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 minute", "30 seconds").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("w_start"), col("cnt"))
      .orderBy(col("w_start"))

  /** Q30b (batch) — CUMULATE windows (Flink's windowing-TVF family:
    * TUMBLE/HOP/CUMULATE/SESSION; the reference's Table API planner ships
    * all four): expanding slices of a 4-minute max window emitted every
    * 1-minute step, so each slice end reports the running aggregate since
    * the 4-minute boundary. Spark has no cumulate primitive; an event at
    * elapsed offset e lands in slices ⌈e/step⌉..max/step of its window,
    * which is a bounded `sequence` explode (≤ max/step rows per event)
    * followed by a plain keyed aggregation — map-side combined, one
    * shuffle, no window function.
    */
  def q30bCumulate(s: SparkSession, dir: String): DataFrame = {
    val stepUs = 60L * 1000000L
    val slices = 4L // max window = slices × step = 4 minutes
    t(s, dir, "events")
      .select(col("value"), unix_micros(col("ts")).as("tu"))
      .withColumn("w_start", col("tu") - pmod(col("tu"), lit(stepUs * slices)))
      // first slice whose end exceeds tu: offsets are < 2.4e8 so the
      // double division is exact well past the needed precision
      .withColumn("k",
        explode(sequence(
          ((col("tu") - col("w_start")) / lit(stepUs)).cast(LongType) + 1,
          lit(slices))))
      .withColumn("w_end", col("w_start") + col("k") * lit(stepUs))
      .groupBy(col("w_start"), col("w_end"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .orderBy(col("w_start"), col("w_end"))
  }

  /** Q30c — trailing 7-day DISTINCT users per day (the DAU/WAU family).
    * A naive sliding `COUNT(DISTINCT)` re-scans the window per day; the
    * scalable form materializes (user, active-day) once, explodes each
    * activity into the ≤7 trailing windows it is visible in (bounded
    * map-side fan-out), and distinct-counts per window day — three keyed
    * shuffles, none proportional to window-length × rows.
    */
  def q30cSlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ud = t(s, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / dayUs).cast("long").as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    ud.withColumn("wday", explode(sequence(col("day"), col("day") + 6)))
      .join(days.withColumnRenamed("day", "wday"), Seq("wday"), "left_semi")
      .select(col("user_id"), col("wday")).distinct()
      .groupBy(col("wday")).agg(count(lit(1)).as("n_users"))
      .withColumnRenamed("wday", "day")
      .orderBy(col("day"))
  }

  /** Q30d — trending items per window: top-2 event types by count in
    * each 10-minute tumbling window (tie-break on type name). Composition
    * of the window aggregation with per-window ranking; the per-window
    * rank input is already collapsed to ≤|event types| rows per window,
    * so the window function sorts tiny groups.
    */
  def q30dTrending(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("w_start"), col("event_type"),
        col("cnt"))
    counts
      .withColumn("rk", row_number().over(Window.partitionBy(col("w_start"))
        .orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rk") <= 2)
      .select(col("w_start"), col("rk").cast(LongType).as("rk"),
        col("event_type"), col("cnt"))
      .orderBy(col("w_start"), col("rk"))
  }

  /** Q31c (batch) — DYNAMIC-gap session windows (Flink's dynamic session
    * gap): each event extends its session by a gap depending on the event
    * itself (purchases hold sessions open 60 s, everything else 30 s).
    * `session_window` takes the gap as an expression; semantics are
    * interval-merge of [ts, ts+gap), which the oracle reproduces with a
    * running max of prior interval ends.
    */
  def q31cDynamicSession(s: SparkSession, dir: String): DataFrame = {
    val gap = when(col("event_type") === "purchase", "60 seconds")
      .otherwise("30 seconds")
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), unix_micros(col("w.start")).as("w_start"),
        unix_micros(col("w.end")).as("w_end"), col("cnt"))
      .orderBy(col("user_id"), col("w_start"))
  }

  /** Q31b (batch) — session windows per user, 30 s gap. */
  def q31Session(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 seconds").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), unix_micros(col("w.start")).as("w_start"),
        unix_micros(col("w.end")).as("w_end"), col("cnt"))
      .orderBy(col("user_id"), col("w_start"))
}
