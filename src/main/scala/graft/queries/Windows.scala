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

  /** Q31a (batch) — 1-minute windows sliding every 30 s (each event lands
    * in exactly 2 windows).
    */
  def q31Slide(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 minute", "30 seconds").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("w_start"), col("cnt"))
      .orderBy(col("w_start"))

  /** Q31b (batch) — session windows per user, 30 s gap. */
  def q31Session(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 seconds").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), unix_micros(col("w.start")).as("w_start"),
        unix_micros(col("w.end")).as("w_end"), col("cnt"))
      .orderBy(col("user_id"), col("w_start"))
}
