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
}
