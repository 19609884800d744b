package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift scoring — the monitoring stage of a data pipeline:
  * is the value distribution of tonight's batch the same as
  * yesterday's? The population stability index (PSI) per key,
  *
  *   PSI = sum_b (p_b^A - p_b^B) * ln(p_b^A / p_b^B)
  *
  * over a fixed equi-width bucket grid, with Laplace +1 smoothing so
  * empty buckets stay finite (counts are integers, so the smoothed
  * proportions are exact ratios — no estimated densities anywhere).
  *
  * Scale shape: bucketing is a map-side floor(); the ONLY shuffle is the
  * (key, period, bucket) count — partial-aggregated, output cardinality
  * = keys x 2 x buckets regardless of row count. The full bucket spine
  * is generated per key (a bounded sequence explode, not a global cross
  * join) and left-joined so absent-in-one-period buckets contribute
  * their smoothed term. Per-bucket terms are quantized to
  * DECIMAL(20,12) before the final sum, making the reduction
  * shuffle-order-independent (the q10e recipe; doubles appear in ln and
  * the final rounding only).
  */
object Drift {

  /** Gate query: per-event-type PSI of `value` between even and odd
    * epoch-days (a deterministic period split of the synthetic data;
    * production swaps in the real batch boundary), bucket width 50 over
    * the [0, 500) value domain.
    */
  def psiByType(s: SparkSession, dir: String, width: Int = 50,
      nBuckets: Int = 10): DataFrame =
    psiOf(t(s, dir, "events"), width, nBuckets)

  /** Library-facing form over any (event_type, ts, value) frame. */
  def psiOf(events: DataFrame, width: Int = 50, nBuckets: Int = 10): DataFrame = {
    val e = events.select(col("event_type"),
      (floor(unix_micros(col("ts")) / 86400000000L) % 2).cast("int").as("p"),
      floor(col("value") / width).cast("int").as("b"))
    val counts = e.groupBy(col("event_type"), col("p"), col("b"))
      .agg(count(lit(1)).as("c"))
    // full (type, period, bucket) spine so zero buckets keep their
    // smoothed mass; one row per type from an agg, then a bounded explode
    val spine = counts.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(0), lit(1))).as("p"))
      .select(col("event_type"), col("p"),
        explode(sequence(lit(0), lit(nBuckets - 1))).as("b"))
    val filled = spine.join(counts, Seq("event_type", "p", "b"), "left")
      .select(col("event_type"), col("p"), col("b"),
        (coalesce(col("c"), lit(0L)) + 1L).as("c1"))
    val withTotals = filled
      .groupBy(col("event_type"), col("b"))
      .agg(sum(when(col("p") === 0, col("c1"))).as("ca"),
        sum(when(col("p") === 1, col("c1"))).as("cb"))
      .join(
        filled.groupBy(col("event_type"))
          .agg(sum(when(col("p") === 0, col("c1"))).as("na"),
            sum(when(col("p") === 1, col("c1"))).as("nb")),
        Seq("event_type"))
    val pa = col("ca").cast("double") / col("na").cast("double")
    val pb = col("cb").cast("double") / col("nb").cast("double")
    val term = ((pa - pb) * log(pa / pb))
      .cast(org.apache.spark.sql.types.DecimalType(20, 12))
    withTotals
      .groupBy(col("event_type"), col("na"), col("nb"))
      .agg(round(sum(term).cast("double"), 6).as("psi"))
      .select(col("event_type"),
        (col("na") - nBuckets).as("n_a"), // un-smooth the totals
        (col("nb") - nBuckets).as("n_b"), col("psi"))
      .orderBy(col("event_type"))
  }
}
