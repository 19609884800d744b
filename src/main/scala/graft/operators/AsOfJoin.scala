package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (temporal) join — the operator class Flink's Table
  * API covers with temporal table joins and Spark lacks natively.
  *
  * `left AS-OF right ON key, left.ts >= right.ts` (latest right row at or
  * before each left timestamp) implemented by union-carry-forward: tag
  * both inputs, sort the merged timeline per key, and carry the most
  * recent right payload forward with last(ignoreNulls) over an unbounded
  * preceding frame. ONE shuffle on the key (the window sort), zero range
  * join — the range-join formulation would explode to |L|×|R| per key
  * before filtering, which is exactly what kills it at 100 TB.
  *
  * Tie semantics: a right row at exactly left.ts IS visible (right sorts
  * before left at equal timestamps); among right rows sharing (key, ts)
  * the one with the largest tiebreak column wins (pass a unique column
  * for determinism).
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (must not collide with
    *                     left's output columns)
    * @param tiebreak     right column ordering equal-timestamp right rows
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightPayload: Seq[String], tiebreak: String): DataFrame = {
    val rStruct = struct(rightPayload.map(col): _*)
    val taggedR = right.select(
      col(key), col(tsCol).as("__t"), lit(0).as("__side"),
      col(tiebreak).as("__tie"), rStruct.as("__r"))
    val leftCols = left.columns
    val taggedL = left.select(
      col(key), col(tsCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(taggedR.schema("__tie").dataType).as("__tie"),
      lit(null).cast(taggedR.schema("__r").dataType).as("__r"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("__l"))
    val merged = taggedR
      .withColumn("__l", lit(null).cast(taggedL.schema("__l").dataType))
      .unionByName(taggedL)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    merged
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        rightPayload.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** As-of query over events: each click joined to the same user's latest
    * signup at or before the click. Left join semantics — clicks with no
    * prior signup keep nulls.
    */
  def clickToSignup(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"),
        unix_micros(col("ts")).as("signup_ts_us"))
    asOfJoin(clicks, signups, key = "user_id", tsCol = "ts",
      rightPayload = Seq("signup_event_id", "signup_ts_us"),
      tiebreak = "signup_event_id")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("signup_event_id"), col("signup_ts_us"))
      .orderBy(col("event_id"))
  }

  /** Same query through the NATIVE physical operator
    * (plans.NativeAsOfJoin): identical semantics and oracle, one ordered
    * merge instead of union + window + filter. Gate q25d_asof_native.
    */
  def clickToSignupNative(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("sid"), unix_micros(col("ts")).as("sts"))
    graft.plans.NativeAsOfJoin.asOf(clicks, signups,
        key = "user_id", ts = "ts", tiebreak = "sid",
        rightPayload = Seq("sid" -> "signup_event_id",
          "sts" -> "signup_ts_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("signup_event_id"), col("signup_ts_us"))
      .orderBy(col("event_id"))
  }
}
