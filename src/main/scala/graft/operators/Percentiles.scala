package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed EXACT interpolated percentiles (percentile_cont
  * semantics): sort-rank inside each group, keep only the two bracketing
  * rows per requested percentile, interpolate
  * `lo + (hi − lo) · frac` with the same expression shape (and therefore
  * the same IEEE-754 results) as the engines' built-in.
  *
  * Why not the `percentile` aggregate: it buffers every value of a group
  * inside one aggregation buffer — a 100 TB group is an OOM, not a spill.
  * This form is a shuffle sort + window + filter; state per task is O(1)
  * beyond the sort, which spills. The cost is one full sort of (key,
  * value) — the price of exactness; use approx_percentile when a sketch
  * is acceptable.
  */
object Percentiles {

  /** Exact percentiles `ps` of `valCol` per `keyCol`. Output: keyCol,
    * p_<tag> columns in `ps` order (tag = percentile×100 rounded, e.g.
    * p50), ordered by key. NULL values are ignored (percentile_cont
    * semantics); a group whose values are ALL null is absent from the
    * output (the aggregate form would emit a NULL row for it).
    */
  def grouped(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    require(ps.map(p => math.round(p * 100)).distinct.size == ps.size,
      s"percentile tags collide after rounding to whole percents: $ps")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
    val ranked = df
      .select(col(keyCol), col(valCol))
      // percentile_cont ignores NULL values — so must the rank and count
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast(DoubleType)
    def interp(p: Double): Column = {
      // 0-based fractional position, same definition as percentile_cont;
      // floor+1 maps back to row_number's 1-based rank
      val vLo = min(when(col("__rn") === floor(pos(p)) + 1, col(valCol)))
      val vHi = min(when(col("__rn") === ceil(pos(p)) + 1, col(valCol)))
      vLo + (vHi - vLo) * min(pos(p) - floor(pos(p)))
    }
    val bracketing = ps.flatMap { p =>
      Seq(col("__rn") === floor(pos(p)) + 1, col("__rn") === ceil(pos(p)) + 1)
    }.reduce(_ || _)
    val aggs = ps.map(p => interp(p).as(s"p${math.round(p * 100)}"))
    ranked
      .filter(bracketing)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(keyCol))
  }
}
