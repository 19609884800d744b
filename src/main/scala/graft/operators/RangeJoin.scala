package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Banded (bucketed) range join — the point-in-interval join class.
  *
  * Open-source Spark has no range-join optimization: a bare
  * `l.v BETWEEN r.lo AND r.hi` join plans as BroadcastNestedLoopJoin (or
  * CartesianProduct), i.e. O(|L|·|R|) predicate evaluations — unusable at
  * scale. Bucketing the value domain turns it into an equi-join: each
  * left row lands in bucket ⌊v/band⌋, each right interval is exploded to
  * every bucket it overlaps, the join runs on the bucket key (shuffle
  * hash / sort-merge, fully partitioned), and the exact BETWEEN predicate
  * filters the per-bucket candidates. With `band` ≥ the maximum interval
  * width every interval spans ≤ 2 buckets, so the blow-up factor is
  * bounded by 2× — the standard trick (cf. interval trees flattened for
  * data-parallel engines).
  *
  * Reference scope: the reference engine has no joins at all (SURVEY.md
  * §2.2); this extends the Q09 theta-join row of the declared inventory
  * with the scale-safe plan shape.
  */
object RangeJoin {

  /** Rows of `left` × `right` where `left(vCol)` ∈ [`right(loCol)`,
    * `right(hiCol)`]. Intervals may be any width (an interval spanning k
    * buckets explodes to k rows); choose `band` ≥ the typical interval
    * width so the explosion stays ≤ 2×. Caller guarantees the two sides
    * have disjoint column names.
    */
  def banded(left: DataFrame, vCol: String, right: DataFrame,
      loCol: String, hiCol: String, band: Long): DataFrame = {
    require(band > 0, "band must be positive")
    val lb = left.withColumn("__bucket", floor(col(vCol) / band))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / band), floor(col(hiCol) / band))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Q09b — banded range join over the testdata: per small part, how many
    * lineitems ship a quantity within ±2 of the part's size. The plan is
    * a key-partitioned equi-join on the quantity bucket — no nested-loop
    * operator anywhere (asserted by PlanSpec).
    *
    * COUNT decomposes over the value domain, so the fact side is first
    * collapsed to its quantity histogram (one row per distinct value —
    * a map-side-combined aggregation) and the interval join runs on the
    * histogram, not the raw rows: the joined volume is |distinct values|
    * × |intervals|, independent of fact-table row count. Without this
    * the join enumerates every (row, interval) match — ~24M at sf0.1,
    * unbounded at 100 TB.
    */
  def q09bRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val qHist = t(s, dir, "lineitem")
      .groupBy(col("l_quantity")).agg(count(lit(1)).as("n"))
    val pt = t(s, dir, "part")
      .filter(col("p_size") <= 10)
      .select(col("p_partkey"),
        (col("p_size") - 2).cast(DoubleType).as("lo"),
        (col("p_size") + 2).cast(DoubleType).as("hi"))
    banded(qHist, "l_quantity", pt, "lo", "hi", band = 5L)
      .groupBy(col("p_partkey"))
      .agg(sum(col("n")).as("n_li"))
      .orderBy(col("p_partkey"))
  }

  /** Interval × interval overlap join: rows of `a` × `b` whose half-open
    * spans [aS, aE) and [bS, bE) intersect. Same banding idea as
    * `banded`, extended to two exploded sides: each interval lands in
    * every band it touches, candidates meet on the band key (a plain
    * partitioned equi-join), and the exact predicate filters. A pair
    * overlapping across several shared bands would match once per band,
    * so each match is kept only in the canonical band — the one
    * containing max(aS, bS), which both intervals provably cover — making
    * the output exactly-once without a distinct (no wide-row shuffle
    * dedup). Explosion factor is interval width / band, so pick `band` ≥
    * the typical width. OSS Spark plans the bare predicate as a
    * nested-loop — O(|A|·|B|) — this is the scale-safe shape.
    * Intervals must be non-empty (`s < e`, half-open): a degenerate
    * [s, s) row band-explodes descending and can still satisfy the
    * strict predicate against an interval containing s.
    */
  def overlapBanded(a: DataFrame, aS: String, aE: String,
      b: DataFrame, bS: String, bE: String, band: Long): DataFrame = {
    require(band > 0, "band must be positive")
    val ab = a.withColumn("__bucket",
      explode(sequence(floor(col(aS) / band), floor((col(aE) - 1) / band))))
    val bb = b.withColumn("__bucket",
      explode(sequence(floor(col(bS) / band), floor((col(bE) - 1) / band))))
    ab.join(bb, Seq("__bucket"))
      .filter(col(aS) < col(bE) && col(bS) < col(aE))
      .filter(col("__bucket") === floor(greatest(col(aS), col(bS)) / band))
      .drop("__bucket")
  }

  /** ts_overlap — co-presence detection over the event stream: pairs of
    * (even-user, odd-user) activity sessions (30 s gap, the Q31b
    * sessionization) that overlap in time. Both session sets are narrow
    * (start/end micros + user), the band is 2 minutes ≈ 2-4× the typical
    * session width, and the join runs partitioned on the time band — no
    * quadratic pairing of the ~1M sessions a 100 TB event log yields.
    */
  def tsOverlap(s: SparkSession, dir: String): DataFrame = {
    def sessions(parity: Int, u: String, ws: String, we: String) =
      t(s, dir, "events")
        .filter(pmod(col("user_id"), lit(2)) === parity)
        .groupBy(session_window(col("ts"), "30 seconds").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id").as(u),
          unix_micros(col("w.start")).as(ws), unix_micros(col("w.end")).as(we))
    val a = sessions(0, "user_a", "a_start", "a_end")
    val b = sessions(1, "user_b", "b_start", "b_end")
    overlapBanded(a, "a_start", "a_end", b, "b_start", "b_end",
        band = 120L * 1000000L)
      .withColumn("overlap_us",
        least(col("a_end"), col("b_end")) - greatest(col("a_start"), col("b_start")))
      .select("user_a", "user_b", "a_start", "b_start", "overlap_us")
      .orderBy("user_a", "a_start", "user_b", "b_start")
  }
}
