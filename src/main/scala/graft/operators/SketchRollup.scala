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

  /** KMV (bottom-k / k-minimum-values) distinct sketch — the classical
    * mergeable estimator the HLL family can't replace when you ALSO need
    * a uniform sample OF THE DISTINCT SET (the k smallest hashes are
    * exactly that): D̂ = (k−1)/u₍k₎ where u₍k₎ is the k-th smallest
    * normalized hash. State is the bounded k-element heap
    * (`TopKByValue`, map-side partial agg, O(k log k) merge). The
    * distinct pre-pass here is gate-definitional (the exact count is
    * emitted alongside); a production KMV dedupes inside the buffer and
    * skips it. Self-checking gate (q12 pattern): exact distinct count
    * definitionally, sample-size and estimate-envelope verdicts pinned —
    * k=64 gives ~12.7% expected relative error (1/√(k−2)); the verdict
    * allows 3σ.
    */
  def kmvDistinct(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val du = t(s, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      // drop the sign bit → 63-bit uniform hash, normalized into [0,1)
      .withColumn("u",
        shiftrightunsigned(xxhash64(col("user_id")), 1).cast("double") /
          lit(9.223372036854776E18))
    val sk = du.groupBy(col("event_type"))
      .agg(graft.functions.TopKFunctions
        .topkByValue(-col("u"), col("user_id"), k).as("bk"),
        count(lit(1)).as("n_exact"))
    // array is sorted by -u desc = u asc; the k-th struct's v is -u₍k₎
    val uk = -element_at(col("bk"), k).getField("v")
    val est = when(col("n_exact") < k, size(col("bk")).cast("double"))
      .otherwise(lit(k - 1).cast("double") / uk)
    sk.select(col("event_type"), col("n_exact"),
      // the bottom-k IS a distinct sample: its size must be min(k, D)
      (size(col("bk")) === least(col("n_exact"), lit(k.toLong)))
        .cast("long").as("sample_ok"),
      (abs(est / col("n_exact") - 1.0) <= 0.381).cast("long").as("est_ok"))
      .orderBy(col("event_type"))
  }

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

  /** Weekly approximate distinct users per event_type via the daily-sketch
    * merge path (the raw operator output; SketchSpec pins its envelope).
    */
  def sketchRollup(s: SparkSession, dir: String): DataFrame =
    weeklyFromDaily(dailyUserSketches(t(s, dir, "events")))
      .select(unix_micros(col("week")).as("week_us"), col("event_type"),
        col("approx_users"), col("n_events"))
      .orderBy(col("week_us"), col("event_type"))

  /** Driver-gate form of [[sketchRollup]]: the HLL estimate is joined to
    * the exact weekly COUNT(DISTINCT) twin and the row carries the error
    * contract AS DATA — `within_2pct` must be 1 on every row, and the
    * DuckDB oracle pins it to 1 alongside the definitional exact count.
    * The exact twin is the verification harness, not the production path
    * (the whole point of the sketch cube is to never rescan facts); the
    * gate query pays it once to make "approximate by contract" a
    * hash-checkable statement instead of an untested claim.
    */
  def sketchRollupChecked(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val approx = weeklyFromDaily(dailyUserSketches(ev))
    val exact = ev
      .groupBy(date_trunc("week", col("ts")).as("week"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    approx.join(exact, Seq("week", "event_type"))
      .select(unix_micros(col("week")).as("week_us"), col("event_type"),
        col("exact_users"), col("n_events"),
        (abs(col("approx_users") - col("exact_users")) * 50 <=
          col("exact_users")).cast("long").as("within_2pct"))
      .orderBy(col("week_us"), col("event_type"))
  }

  /** sketch_quantile_rollup — the QUANTILE twin of the HLL distinct-count
    * cube: one mergeable KLL sketch of `value` per (day, event_type)
    * cell, weekly p50/p95 read off the MERGED day sketches — the fact
    * table is scanned once at day grain, every coarser grain is a merge
    * of fixed-size buffers (≤3·k doubles each) regardless of fact
    * cardinality. The exact-percentile path (q10b) re-scans values per
    * grain; this is the only shape that survives a quantile CUBE over
    * 100 TB. Approximate by contract at scale (KLL rank error ~1.65% at
    * the default k=200); below k retained values the sketch is exact —
    * the spec pins the merge ≡ direct-sketch mergeability contract and
    * the error envelope vs the exact percentiles.
    */
  def quantileRollup(s: SparkSession, dir: String): DataFrame =
    quantileRollupOf(t(s, dir, "events"))

  def quantileRollupOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(kll_sketch_agg_double(col("value")).as("sk"),
        count(lit(1)).as("n_events"))
    daily
      .groupBy(date_trunc("week", col("day")).as("week"), col("event_type"))
      .agg(kll_merge_agg_double(col("sk")).as("wsk"),
        sum(col("n_events")).as("n_events"))
      .select(unix_micros(col("week")).as("week_us"), col("event_type"),
        round(kll_sketch_get_quantile_double(col("wsk"), lit(0.5)), 6)
          .as("p50_approx"),
        round(kll_sketch_get_quantile_double(col("wsk"), lit(0.95)), 6)
          .as("p95_approx"),
        col("n_events"))
      .orderBy(col("week_us"), col("event_type"))
  }

  /** Driver-gate form of [[quantileRollup]]: each weekly KLL quantile is
    * rank-audited against the raw values — the true rank interval
    * [count(<q)/n, count(≤q)/n] of the returned quantile must intersect
    * p ± 3% (KLL's k=200 contract is ~1.65% rank error at 99%
    * confidence), checked with integer cross-multiplication and emitted
    * as `p50_rank_ok`/`p95_rank_ok`. The row also carries the
    * DEFINITIONAL exact inclusive-rank percentiles (smallest value whose
    * cumulative count reaches p·n — KLL's own rank convention), which
    * the DuckDB oracle recomputes verbatim, so the gate hash checks real
    * values, not just the contract bits.
    */
  def quantileRollupChecked(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events")
      .select(unix_micros(date_trunc("week", col("ts"))).as("week_us"),
        col("event_type"), col("value"))
    val approx = quantileRollupOf(t(s, dir, "events"))
      .select(col("week_us"), col("event_type"),
        col("p50_approx"), col("p95_approx"))
    // rank audit: one keyed agg over the facts with the ~25-row approx
    // table broadcast onto them
    val ranks = ev.join(broadcast(approx), Seq("week_us", "event_type"))
      .groupBy(col("week_us"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("p50_approx"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("p50_approx"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("p95_approx"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("value") <= col("p95_approx"), 1L).otherwise(0L)).as("le95"))
    // definitional exact percentiles from the value histogram (inclusive
    // rank: smallest v with cum ≥ p·n, integer cross-multiplied)
    val h = ev.groupBy(col("week_us"), col("event_type"), col("value"))
      .agg(count(lit(1)).as("w"))
    val win = Window.partitionBy(col("week_us"), col("event_type"))
      .orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = h.withColumn("cum", sum(col("w")).over(win))
      .withColumn("tot",
        sum(col("w")).over(Window.partitionBy(col("week_us"), col("event_type"))))
      .groupBy(col("week_us"), col("event_type"))
      .agg(
        min(when(col("cum") * 2 >= col("tot"), col("value"))).as("exact_p50"),
        min(when(col("cum") * 100 >= col("tot") * 95, col("value"))).as("exact_p95"))
    ranks.join(exact, Seq("week_us", "event_type"))
      .select(col("week_us"), col("event_type"), col("n").as("n_events"),
        col("exact_p50"), col("exact_p95"),
        (col("lt50") * 100 <= col("n") * 53 &&
          col("le50") * 100 >= col("n") * 47).cast("long").as("p50_rank_ok"),
        (col("lt95") * 100 <= col("n") * 98 &&
          col("le95") * 100 >= col("n") * 92).cast("long").as("p95_rank_ok"))
      .orderBy(col("week_us"), col("event_type"))
  }

  /** sketch_theta_audience — distinct-count SET ALGEBRA via Theta
    * sketches: audience overlap (users with a big purchase ∩ users with
    * a big error), difference, and union, all from ONE fact scan that
    * builds one fixed-size sketch per segment as conditional aggregates.
    * HLL can only union; Theta's intersect/difference is what answers
    * "how many users did BOTH" at 100 TB without ever shuffling raw user
    * ids — the alternative is a distinct-key self-join whose shuffle
    * scales with audience size. Below the sketch's nominal capacity
    * (2^12 entries) Theta is EXACT, so at the gate's scale this
    * hash-matches the definitional DuckDB COUNT(DISTINCT) oracle;
    * beyond it the same plan degrades gracefully to ~1.6%-error
    * estimates — that trade is the operator's contract.
    */
  def thetaAudience(s: SparkSession, dir: String): DataFrame =
    thetaAudienceOf(t(s, dir, "events"))

  def thetaAudienceOf(events: DataFrame): DataFrame = {
    val sk = events.agg(
      theta_sketch_agg(
        when(col("event_type") === "purchase" && col("value") > 200.0,
          col("user_id"))).as("buy_sk"),
      theta_sketch_agg(
        when(col("event_type") === "error" && col("value") > 200.0,
          col("user_id"))).as("err_sk"))
    // round before the long cast: identical in exact mode, unbiased in
    // the approximate regime (bare cast truncates toward zero, flooring
    // every fractional estimate ~0.5 low)
    sk.select(
      round(theta_sketch_estimate(col("buy_sk"))).cast("long")
        .as("big_purchase_users"),
      round(theta_sketch_estimate(col("err_sk"))).cast("long")
        .as("big_error_users"),
      round(theta_sketch_estimate(
        theta_intersection(col("buy_sk"), col("err_sk"))))
        .cast("long").as("both_users"),
      round(theta_sketch_estimate(
        theta_difference(col("buy_sk"), col("err_sk"))))
        .cast("long").as("only_purchase_users"),
      round(theta_sketch_estimate(theta_union(col("buy_sk"), col("err_sk"))))
        .cast("long").as("either_users"))
  }

  /** sketch_rank_sla — the INVERSE quantile read off the same KLL cube:
    * per-week share of events with value ≤ threshold (SLA attainment)
    * from MERGED day sketches — track "what fraction met the 100 ms
    * budget" at every grain without ever re-scanning facts. Exact in the
    * sketch's exact mode (inclusive rank = count(≤x)/n), ~1.65% rank
    * error beyond — so the gate hash-matches the definitional DuckDB
    * share while the same plan survives 100 TB.
    */
  def slaAttainment(s: SparkSession, dir: String,
      threshold: Double = 100.0): DataFrame = {
    // k=4096 (a fixed 32 KB buffer per cell) keeps the weekly merged
    // cells below compaction at the gate's scale, so the rank is the
    // exact count(≤x)/n; production trades k against the 1.65%·(200/k)^0.9
    // rank error curve, the plan shape is k-invariant
    val daily = t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(kll_sketch_agg_double(col("value"), 4096).as("sk"),
        count(lit(1)).as("n_events"))
    daily
      .groupBy(date_trunc("week", col("day")).as("week"), col("event_type"))
      .agg(kll_merge_agg_double(col("sk"), 4096).as("wsk"),
        sum(col("n_events")).as("n_events"))
      .select(unix_micros(col("week")).as("week_us"), col("event_type"),
        round(kll_sketch_get_rank_double(col("wsk"), lit(threshold)), 6)
          .as("sla_share"),
        col("n_events"))
      .orderBy(col("week_us"), col("event_type"))
  }

  /** sketch_overlap_matrix — every pairwise audience overlap from ONE
    * fact scan: one Theta sketch per segment (5 rows), then a
    * segment×segment self-join computing |A∩B| and Jaccard per pair.
    * The sketches are first-class COLUMN VALUES flowing through a
    * relational join — the pair count is segments², never users², and
    * the fact table is read once no matter how many pairs are asked.
    * The classic alternative (a distinct-user self-join per pair)
    * re-shuffles raw ids pair-many times. Exact below the 2^12 nominal
    * capacity (the gate's scale), ~1.6%-error beyond by contract. The
    * 10-row pair join is an intentional parameter-sized nested loop
    * (PlanHygieneSpec allowlists it).
    */
  def overlapMatrix(s: SparkSession, dir: String): DataFrame =
    overlapMatrixOf(t(s, dir, "events"))

  def overlapMatrixOf(events: DataFrame): DataFrame = {
    val sk = events.groupBy(col("event_type"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"))
    val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
    val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        round(theta_sketch_estimate(col("ska"))).cast("long").as("users_a"),
        round(theta_sketch_estimate(col("skb"))).cast("long").as("users_b"),
        round(theta_sketch_estimate(
          theta_intersection(col("ska"), col("skb"))))
          .cast("long").as("overlap"),
        round(theta_sketch_estimate(theta_union(col("ska"), col("skb"))))
          .cast("long").as("either_users"))
      .withColumn("jaccard",
        round(col("overlap").cast("double") /
          col("either_users").cast("double"), 6))
      .orderBy(col("type_a"), col("type_b"))
  }

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
    // user_id IS NOT NULL before building the day domain: the aggregates
    // ignore nulls anyway, but a day whose events ALL carry null user_id
    // must not contribute a zero-user row the null-filtered oracle lacks.
    val daily = t(s, dir, "events")
      .filter(col("user_id").isNotNull)
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

  /** Driver-gate form of [[slidingUserSketches]]: merged sliding-window
    * HLL estimates joined to the exact trailing-7-day distinct twin
    * (q30c's shape), with the ±2% contract emitted as `within_2pct` and
    * pinned to 1 by the definitional DuckDB oracle.
    */
  def slidingUserSketchesChecked(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ud = t(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        (unix_micros(col("ts")) / dayUs).cast("long").as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    val exact = ud
      .withColumn("wday", explode(sequence(col("day"), col("day") + 6)))
      .join(days.withColumnRenamed("day", "wday"), Seq("wday"), "left_semi")
      .groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .withColumnRenamed("wday", "day")
    slidingUserSketches(s, dir).join(exact, Seq("day"))
      .select(col("day"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) * 50 <=
          col("exact_users")).cast("long").as("within_2pct"))
      .orderBy(col("day"))
  }
}
