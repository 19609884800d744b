package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — gap-filling + forward fill (resampling an
  * irregular event stream onto a fixed grid), the feature-engineering
  * step upstream of any sequence model.
  *
  * Scale shape: the hourly spine is generated per key from that key's own
  * [min, max] span (explode of a bounded sequence — no global calendar
  * cross join), the spine⋈observations join is key-partitioned on
  * (key, bucket), and the carry-forward is one ordered window per key.
  * Nothing is proportional to keys × global-time-range.
  */
object TimeSeries {

  /** Hourly gap-fill with last-observation-carried-forward over `events`
    * for a bounded user set: one row per (user, hour-in-span), `filled` =
    * latest observed value at or before that hour, `is_gap` marking
    * synthesized rows. Hour buckets export as epoch micros (the
    * TIMESTAMP_NS parquet convention, see Tables.t).
    */
  def gapFillHourly(s: SparkSession, dir: String, maxUser: Long = 20): DataFrame =
    gapFillHourlyOf(t(s, dir, "events").filter(col("user_id") < maxUser))

  /** Library-facing form over any (user_id, ts, event_id, value) frame. */
  def gapFillHourlyOf(events: DataFrame): DataFrame = {
    val e = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"), col("value"))
    // latest observation per (user, hour): deterministic via the globally
    // unique event_id tiebreak
    val wPick = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hv = e.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("h"), col("value"))
    val spine = e.groupBy(col("user_id"))
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("h"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hv, Seq("user_id", "h"), "left")
      .withColumn("is_gap", col("value").isNull)
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(wFill))
      .select(col("user_id"), unix_micros(col("h")).as("hour_us"),
        col("filled"), col("is_gap"))
      .orderBy(col("user_id"), col("hour_us"))
  }

  /** ts_interpolate — linear interpolation on the hourly spine, the
    * companion to [[gapFillHourlyOf]]'s LOCF: gap hours take
    * v = prev + (next − prev)·Δt/ΔT between their neighboring
    * observations (sensor-style signals where step-holding biases
    * downstream aggregates). The spine's bounds are each user's first
    * and last OBSERVED hours, so every gap has both neighbors — no edge
    * policy needed.
    *
    * Scale shape: same as gapfill — per-user spine explode, then BOTH
    * direction passes (last-non-null backward, first-non-null forward)
    * as two window functions over the SAME (user, hour) partitioning
    * and sort, so the plan carries one exchange and one sort for the
    * whole fill. Gap spans are hour-bounded per user; nothing is
    * proportional to the corpus.
    */
  def interpolateHourly(s: SparkSession, dir: String, maxUser: Long = 20): DataFrame =
    interpolateHourlyOf(t(s, dir, "events").filter(col("user_id") < maxUser))

  /** Library-facing form over any (user_id, ts, event_id, value) frame. */
  def interpolateHourlyOf(events: DataFrame): DataFrame = {
    val e = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"), col("value"))
    val wPick = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hv = e.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("h"), col("value"))
    val spine = e.groupBy(col("user_id"))
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("h"))
    val wB = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(hv, Seq("user_id", "h"), "left")
      .withColumn("hu", unix_micros(col("h")))
      .withColumn("is_gap", col("value").isNull)
      .withColumn("pv", last(col("value"), ignoreNulls = true).over(wB))
      .withColumn("ph",
        last(when(col("value").isNotNull, col("hu")), ignoreNulls = true).over(wB))
      .withColumn("nv", first(col("value"), ignoreNulls = true).over(wF))
      .withColumn("nh",
        first(when(col("value").isNotNull, col("hu")), ignoreNulls = true).over(wF))
      // no in-engine rounding: interpolation at dyadic Δt/ΔT fractions of
      // 2dp values lands on exact .5·10⁻⁶ midpoints, where Spark
      // (HALF_UP) and DuckDB (half-even) round apart — the raw doubles
      // are IEEE-identical across engines, so emit those and let the
      // gate's uniform canonicalization round once
      .select(col("user_id"), col("hu").as("hour_us"),
        when(!col("is_gap"), col("value"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("hu") - col("ph")).cast("double") /
              (col("nh") - col("ph")).cast("double"))).as("interp"),
        col("is_gap"))
      .orderBy(col("user_id"), col("hour_us"))
  }

  /** Time-series similarity search (the distributed ts-similarity shape,
    * EDBT 2019 — see PAPERS.md): rank users by Pearson correlation of
    * their hourly activity series against a probe user's series. The
    * series build is one keyed partial agg; the probe series (one user's
    * hours) is broadcast; per-candidate scores are ONE aggregation over
    * the hour-joined rows using exact decimal co-moments (the q10e
    * recipe — shuffle-order-independent sums, doubles only in the final
    * closed-form corr, rounded to 6 dp). No user×user pairing anywhere:
    * cost is series-build + broadcast-join + one agg, at any corpus
    * size. Degenerate (zero-variance) series are excluded — their corr
    * is NaN on both engines but NaN ordering is not portable.
    */
  def tsSimilarity(s: SparkSession, dir: String, probeUser: Long = 1L,
      minHours: Int = 4, k: Int = 10): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(12, 2)
    val hourly = t(s, dir, "events")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("value").cast(D).as("v0"))
      .groupBy(col("user_id"), col("h"))
      .agg(sum(col("v0")).cast("decimal(14,2)").as("v"))
    val probe = hourly.filter(col("user_id") === probeUser)
      .select(col("h"), col("v").as("pv"))
    val x = col("v"); val y = col("pv")
    val sx = sum(x).cast("double"); val sy = sum(y).cast("double")
    val sxy = sum(x * y).cast("double")
    val sxx = sum(x * x).cast("double"); val syy = sum(y * y).cast("double")
    val n = count(lit(1)).cast("double")
    hourly.filter(col("user_id") =!= probeUser)
      .join(broadcast(probe), "h")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        (n * sxx - sx * sx).as("__dx"),
        (n * syy - sy * sy).as("__dy"),
        round((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr_v"))
      .filter(col("cnt") >= minHours && col("__dx") > 0 && col("__dy") > 0)
      .select(col("user_id"), col("cnt"), col("corr_v"))
      .orderBy(col("corr_v").desc, col("user_id"))
      .limit(k)
  }

  /** SCD2 interval build: collapse each user's event_type history to
    * change rows with [valid_from, valid_to) validity — the slowly-
    * changing-dimension type-2 construction every warehouse needs when
    * ingesting a mutation log. One shuffle total: both windows (the
    * change-detecting lag and the interval-closing lead) partition and
    * order identically, so the second window reuses the first's exchange
    * and sort. `valid_to` is NULL for each user's current row.
    * Deterministic via the globally unique event_id tiebreak.
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }

  /** Time-weighted average per user: each event's value holds from its
    * timestamp until the user's next event (the step-function reading of
    * an irregular series); the average weights each value by how long it
    * was in force — the correct mean for sampled-on-change signals,
    * where the plain avg() over-counts chatty periods. The last event
    * per user has no successor and contributes no closed interval; a
    * single-event user therefore drops out.
    *
    * Scale shape: ONE user-keyed exchange for the interval window, then
    * a standard partial-aggregated groupBy on the same key (Catalyst
    * reuses the window's partitioning — no second exchange). Weighted
    * sums run over DECIMAL(12,2) values x BIGINT microsecond durations
    * (exact, shuffle-order-independent; the q10e recipe); doubles appear
    * only in the final ratio, rounded to 6 dp.
    */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame =
    timeWeightedAvgOf(t(s, dir, "events"))

  /** Library-facing form over any (user_id, ts, event_id, value) frame. */
  def timeWeightedAvgOf(events: DataFrame): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(12, 2)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast(D).as("v"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .withColumn("dur_us",
        unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("total_us"),
        round(sum(col("v") * col("dur_us")).cast("double") /
          sum(col("dur_us")).cast("double"), 6).as("twa_value"))
      .orderBy(col("user_id"))
  }

  /** Concurrency timeline (sweep-line interval counting): how many
    * users hold an open activity interval at each boundary instant,
    * where each event opens an interval that its user's next event
    * closes. The naive form — `sum(delta) OVER (ORDER BY t)` — is a
    * GLOBAL ordered window: one task scans every boundary at any scale.
    * This is the distributed prefix-sum instead: boundaries are sharded
    * into fixed-width time ranges (a deterministic map-side bucket, not
    * a sampled range partitioner), each shard cumsums independently
    * under a keyed window, and a P-row shard-totals table (P = shard
    * count, not data size) supplies each shard's starting offset via a
    * broadcast join. The only globally-ordered object is that P-row
    * cumsum; everything data-sized is keyed and parallel.
    */
  def concurrency(s: SparkSession, dir: String, nShards: Int = 32): DataFrame =
    concurrencyOf(t(s, dir, "events"), nShards)

  /** Library-facing form over any (user_id, ts, event_id) frame. */
  def concurrencyOf(events: DataFrame, nShards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val iv = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .select(unix_micros(col("ts")).as("f"),
        unix_micros(col("next_ts")).as("g"))
    // net delta per unique boundary instant (+1 opens, -1 closes)
    val deltas = iv.select(col("f").as("t"), lit(1L).as("d"))
      .unionAll(iv.select(col("g").as("t"), lit(-1L).as("d")))
      .groupBy(col("t")).agg(sum(col("d")).as("nd"))
    // fixed-width time shards from one broadcast min/max row: exact
    // integer arithmetic, deterministic across re-evaluations (a sampled
    // RangePartitioner's bounds are not); cumsum via the shared
    // distributed prefix-sum (operators.PrefixSum)
    val bounds = deltas.agg(min(col("t")).as("t0"),
      (max(col("t")) - min(col("t")) + 1).as("span"))
    val sharded = deltas.crossJoin(broadcast(bounds))
      .withColumn("pid", expr(s"((t - t0) * $nShards) div span"))
      .select(col("t"), col("nd"), col("pid"))
    PrefixSum.shardedCumSum(sharded, Seq.empty, "pid", "t", "nd")
      .select(col("t").as("t_us"), col("cum").as("concurrency"))
      .orderBy(col("t_us"))
  }

  /** ts_ohlc — downsample the event stream to per-(type, day) OHLC bars
    * (open/high/low/close + volume), the classic time-series resample.
    * Open and close are arg-min/arg-max by (ts, event_id) — the event_id
    * tiebreak makes bars deterministic when multiple events share a
    * timestamp. ONE partial-agg pass: min_by/max_by buffers carry a
    * single (value, key) candidate per group per partition, so the bar
    * table costs one keyed shuffle of group-count rows regardless of how
    * many events a day holds — no per-day sort, no window.
    */
  def tsOhlc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))
      .orderBy(col("event_type"), col("day"))

  /** One output point of the per-key ordered EWMA/anomaly scan. */
  case class EwmaPoint(user_id: Long, ts_us: Long, event_id: Long,
    value: Double, ewma: Double, forecast_dev: Double, is_anomaly: Boolean)

  /** THE EWMA/EW-variance step — the single definition both the batch
    * scan and the streaming processor fold with, so their bit-identity
    * is structural, not spec-enforced: given the prior (ewma, evar) and
    * the next value, returns (ewma', evar', dev, is_anomaly). The
    * anomaly test reads the PRIOR state; the variance absorbs the
    * squared forecast error after the test (West-style), so an outlier
    * cannot mask itself.
    */
  def ewmaStep(ewma: Double, evar: Double, x: Double, alpha: Double,
      z: Double): (Double, Double, Double, Boolean) = {
    val beta = 1.0 - alpha // == the decimal literal 0.8 bit-for-bit at α=0.2
    val dev = x - ewma
    val anomaly = evar > 0.0 && math.abs(dev) > z * math.sqrt(evar)
    (alpha * x + beta * ewma, beta * (evar + alpha * dev * dev), dev, anomaly)
  }

  /** Per-key EWMA smoothing + exponentially-weighted-variance anomaly
    * flags — the SEGMENTED SEQUENTIAL SCAN primitive. EWMA's recurrence
    * (s_t = α·x_t + (1−α)·s_{t−1}) is non-associative, so no aggregate
    * or window function expresses it; the distributed form is Spark's
    * secondary-sort idiom: ONE hash shuffle on the key, a per-partition
    * (key, ts, id) sort, then a streaming `mapPartitions` whose state is
    * O(1) per key and resets on key change. At 100 TB this moves each
    * series once and never materializes a per-key collection — the
    * degenerate alternatives (collect_list per key, or a window over an
    * exploded prefix) hold whole series in memory or go quadratic.
    *
    * A point is anomalous when its forecast error exceeds z standard
    * EW-deviations of the PRIOR state (variance updates West-style:
    * v_t = (1−α)(v_{t−1} + α·dev²) — the error is absorbed after the
    * test, so an outlier cannot mask itself). The first point of a key
    * seeds s=x, v=0 and is never anomalous.
    *
    * mapPartitions here is the documented last-resort tier (genuine
    * per-partition imperative logic): the plan stays exchange+sort+
    * scan, nothing leaves the executor, and the scan is rewindable from
    * the shuffle files like any narrow stage.
    */
  def ewmaScanOf(events: DataFrame, alpha: Double = 0.2,
      z: Double = 3.0): org.apache.spark.sql.Dataset[EwmaPoint] = {
    val ss = events.sparkSession
    import ss.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        var key = Long.MinValue
        var seeded = false
        var ewma = 0.0
        var evar = 0.0
        it.map { case (u, ts, id, x) =>
          if (u != key || !seeded) {
            key = u; seeded = true; ewma = x; evar = 0.0
            EwmaPoint(u, ts, id, x, x, 0.0, is_anomaly = false)
          } else {
            val (e2, v2, dev, anomaly) = ewmaStep(ewma, evar, x, alpha, z)
            ewma = e2; evar = v2
            EwmaPoint(u, ts, id, x, ewma, dev, anomaly)
          }
        }
      }
  }

  /** Driver gate: final EWMA per user — the sequential recurrence is
    * reproduced verbatim by the DuckDB oracle's ordered `list_reduce`
    * fold (same literals, same order → bit-identical doubles).
    */
  def tsEwma(s: SparkSession, dir: String): DataFrame =
    ewmaScanOf(t(s, dir, "events"))
      .groupBy(col("user_id"))
      .agg(
        round(max_by(col("ewma"), struct(col("ts_us"), col("event_id"))), 6)
          .as("ewma_final"),
        count(lit(1)).as("n_points"))
      .orderBy(col("user_id"))

  /** Driver gate: per-user anomaly census off the same scan — the
    * two-variable (mean, variance) recurrence folds in the oracle as a
    * LIST-typed accumulator, so even the flag count is hash-gated.
    */
  def tsEwmaAnomaly(s: SparkSession, dir: String): DataFrame =
    ewmaScanOf(t(s, dir, "events"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
        round(max(abs(col("forecast_dev"))), 6).as("max_abs_dev"),
        count(lit(1)).as("n_points"))
      .orderBy(col("user_id"))

  case class CusumPoint(user_id: Long, ts_us: Long, event_id: Long,
    value: Double, sp_raw: Double, sn_raw: Double, alarmed: Boolean)

  /** One two-sided CUSUM update (Page's test, the classic sequential
    * changepoint detector): against target level `mu` with slack
    * `kappa`, the one-sided sums accumulate only sustained drift
    * (`S⁺ += x−mu−kappa` floored at 0; `S⁻` symmetric), alarm when a
    * side crosses `h`, and the fired side resets to 0 (restart the
    * test). Returns the PRE-reset sums (the gate reports their maxima),
    * the carried post-reset state, and the alarm flag.
    *
    * Shared by the batch scan and the DuckDB oracle's fold — the
    * arithmetic is written in the literal order the SQL repeats
    * (`sp + (x - mu - kappa)`, `sn - (x - mu) - kappa`) so the doubles
    * agree bit-for-bit; do not "simplify" the parenthesization.
    */
  def cusumStep(sp: Double, sn: Double, x: Double, mu: Double,
      kappa: Double, h: Double): (Double, Double, Double, Double, Boolean) = {
    val spRaw = math.max(0.0, sp + (x - mu - kappa))
    val snRaw = math.max(0.0, sn - (x - mu) - kappa)
    val alarmed = spRaw > h || snRaw > h
    (spRaw, snRaw,
      if (spRaw > h) 0.0 else spRaw,
      if (snRaw > h) 0.0 else snRaw,
      alarmed)
  }

  /** Per-key two-sided CUSUM changepoint scan — the second member of
    * the SEGMENTED SEQUENTIAL SCAN family (see [[ewmaScanOf]] for the
    * idiom's scale argument). CUSUM's recurrence is non-associative
    * (each sum floors at 0 and resets on alarm), so like EWMA it cannot
    * be a window/aggregate; the distributed form is the same ONE hash
    * shuffle on the key + per-partition (key, ts, id) sort + streaming
    * `mapPartitions` with O(1) state per key. At 100 TB each series
    * moves exactly once and no per-key collection is ever materialized.
    *
    * Monitoring semantics: drift above `mu+kappa` (or below `mu−kappa`)
    * accumulates; short excursions decay back to the 0 floor; a side
    * crossing `h` raises an alarm for that point and restarts its test.
    * Defaults are tuned to the events value distribution (mean ≈ 50):
    * kappa = 10 ignores ±10 of noise around the target, h = 200 needs
    * a sustained ~4σ excursion.
    */
  def cusumScanOf(events: DataFrame, mu: Double = 50.0,
      kappa: Double = 10.0, h: Double = 200.0):
      org.apache.spark.sql.Dataset[CusumPoint] = {
    val ss = events.sparkSession
    import ss.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        var key = Long.MinValue
        var seeded = false
        var sp = 0.0
        var sn = 0.0
        it.map { case (u, ts, id, x) =>
          if (u != key || !seeded) { key = u; seeded = true; sp = 0.0; sn = 0.0 }
          val (spRaw, snRaw, sp2, sn2, alarmed) = cusumStep(sp, sn, x, mu, kappa, h)
          sp = sp2; sn = sn2
          CusumPoint(u, ts, id, x, spRaw, snRaw, alarmed)
        }
      }
  }

  /** Gate: arrival order synthesized as event time + a deterministic
    * md5 jitter ≤ 120 s (the testdata's event_id order IS its ts order,
    * so real arrival skew has to be planted); the report must recover
    * the planted jitter's distribution.
    */
  def tsWatermarkReport(s: SparkSession, dir: String): DataFrame = {
    val jitter = conv(substring(md5(col("event_id").cast("string")
      .cast("binary")), 1, 15), 16, 10).cast("long") % 120000000L
    watermarkReportOf(
      t(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("arrival_us", col("ts_us") + jitter),
      nShards = 32)
  }

  /** Out-of-orderness / watermark-design report: given each event's
    * EVENT time and ARRIVAL time, how late is each event relative to
    * the maximum event time already arrived — i.e. what watermark delay
    * would a streaming job need so that p50/p95/p99/100% of events beat
    * the watermark? This is the measurement that turns the
    * `withWatermark("ts", "<delay>")` guess into a number (reference
    * analog: the watermark declaration O3, whose delay the reference
    * hard-codes).
    *
    * The running max of event time over arrival order is a PREFIX MAX —
    * same distributed shape as the sharded prefix sum (max is
    * associative): deterministic arrival-range shards via [[PrefixSum
    * .rangePid]], a per-shard running-max window, and a ≤ nShards-row
    * shard-maxima table whose strictly-prior running max broadcasts
    * back as each shard's carry-in. Lateness then quantizes to SECONDS
    * and collapses to a histogram bounded by the lateness domain (a
    * constant in seconds — 121 rows here), over which the percentile
    * bounds are integer cross-multiplied percentile_disc; the single
    * global window runs on that parameter-sized histogram only.
    */
  def watermarkReportOf(events: DataFrame, nShards: Int): DataFrame = {
    val bounds = events.agg(min(col("arrival_us")).as("lo"),
      (max(col("arrival_us")) + 1L).as("hi"))
    val sharded = events.crossJoin(broadcast(bounds))
      .withColumn("pid",
        PrefixSum.rangePid(col("arrival_us"), col("lo"), col("hi"), nShards))
      .drop("lo", "hi")
    val ord = Window.partitionBy(col("pid"))
      .orderBy(col("arrival_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offW = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("pid"))
      .agg(max(col("ts_us")).as("__m"))
      .withColumn("carry", max(col("__m")).over(offW))
      .select(col("pid"), col("carry"))
    val late = sharded
      .withColumn("__lp", max(col("ts_us")).over(ord))
      .join(broadcast(offsets), "pid")
      .withColumn("prior_max", greatest(
        coalesce(col("__lp"), lit(Long.MinValue)),
        coalesce(col("carry"), lit(Long.MinValue))))
      .withColumn("late_s",
        when(col("prior_max") === Long.MinValue, 0L)
          .otherwise(expr("greatest(0, prior_max - ts_us) div 1000000")))
    val hist = late.groupBy(col("late_s")).agg(count(lit(1)).as("n"))
    val histW = Window.orderBy(col("late_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("n")).over(histW))
    val tot = hist.agg(sum(col("n")).as("n_events"),
      sum(when(col("late_s") > 0, col("n")).otherwise(0L)).as("n_late"),
      max(col("late_s")).as("max_late_s"))
    cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("cum") * 2 >= col("n_events"), col("late_s")))
          .as("p50_late_s"),
        min(when(col("cum") * 100 >= col("n_events") * 95, col("late_s")))
          .as("p95_late_s"),
        min(when(col("cum") * 100 >= col("n_events") * 99, col("late_s")))
          .as("p99_late_s"))
      .crossJoin(broadcast(tot))
      .select(col("n_events"), col("n_late"),
        round(col("n_late").cast("double") / col("n_events"), 6)
          .as("share_late"),
        col("p50_late_s"), col("p95_late_s"), col("p99_late_s"),
        col("max_late_s"))
  }

  def tsEmbargoSplit(s: SparkSession, dir: String): DataFrame =
    embargoSplitOf(t(s, dir, "events"), pNum = 4, pDen = 5,
      embargoUs = 86400000000L, nShards = 32)

  /** Purged temporal train/test split (time-series cross-validation with
    * an embargo): the split boundary is the EXACT p = pNum/pDen discrete
    * time percentile of the events (the q10p machinery: timestamp
    * histogram → sharded prefix sum → conditional min, thresholds
    * integer cross-multiplied); rows inside [boundary, boundary +
    * embargo) are assigned to neither side — the gap that stops lagged
    * features computed at train time from leaking into test. Reported
    * long-format: per split, count and time range.
    *
    * Why an operator and not two filters: the boundary must be an exact
    * data quantile computed scalably (no global sort, no driver
    * collect), and the embargo must be applied consistently with it in
    * ONE plan, so a caller cannot mix a sampled boundary with an exact
    * filter.
    */
  def embargoSplitOf(events: DataFrame, pNum: Int, pDen: Int,
      embargoUs: Long, nShards: Int): DataFrame = {
    val e = events.select(unix_micros(col("ts")).as("ts_us"))
    val hist = e.groupBy(col("ts_us")).agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    val bounds = hist.agg(min(col("ts_us")).as("v0"),
      max(col("ts_us")).as("v1"), sum(col("w")).as("tot"))
    val sharded = hist.crossJoin(broadcast(bounds))
      .withColumn("pid",
        PrefixSum.rangePid(col("ts_us"), col("v0"), col("v1"), nShards))
    val boundary = PrefixSum
      .shardedCumSum(sharded, Seq.empty, "pid", "ts_us", "w")
      .agg(min(when(col("cum") * pDen >= col("tot") * pNum, col("ts_us")))
        .as("b"))
    e.crossJoin(broadcast(boundary))
      .withColumn("split",
        when(col("ts_us") < col("b"), "train")
          .when(col("ts_us") < col("b") + embargoUs, "embargo")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))
      .orderBy(col("split"))
  }

  /** Driver gate: per-user CUSUM census — alarm count and the extreme
    * pre-reset sums. The DuckDB oracle replays the recurrence as an
    * ordered LIST fold with the identical literals (the ts_ewma_anomaly
    * recipe), so every double is hash-compared bit-for-bit.
    */
  def tsCusum(s: SparkSession, dir: String): DataFrame =
    cusumScanOf(t(s, dir, "events"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("alarmed"), 1L).otherwise(0L)).as("n_alarms"),
        round(max(col("sp_raw")), 6).as("max_sp"),
        round(max(col("sn_raw")), 6).as("max_sn"),
        count(lit(1)).as("n_points"))
      .orderBy(col("user_id"))
}
