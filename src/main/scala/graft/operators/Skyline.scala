package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-dominance) operator — the "best tradeoffs" query
  * (minimize both dimensions; a row survives iff no other row is ≤ in
  * both and < in at least one). Spark has no built-in skyline; the SQL
  * spelling is a quadratic NOT EXISTS self-join, which is exactly what
  * the DuckDB oracle runs at test SF and exactly what cannot run at
  * 100 TB.
  *
  * Scalable form (the classic two-phase distributed skyline, as in the
  * Spark-SQL skyline integration literature, EDBT 2023): each partition
  * computes its LOCAL skyline with a sort-sweep — after sorting by
  * (x asc, y asc), a point survives iff its y is strictly below the
  * sweep minimum (plus exact-duplicate points of the last survivor,
  * which are never strictly dominated) — then the union of local
  * skylines (small: dominated points never resurface) collapses to one
  * partition for the identical global sweep. Phase 1 is shuffle-free
  * (sortWithinPartitions); the only data movement is the tiny candidate
  * coalesce. mapPartitions is justified here (genuine per-partition
  * imperative sweep — dominance is not an equi-anything).
  *
  * NULL coordinates are excluded up front (dominance is undefined on
  * NULL; both engines would otherwise diverge on 3-valued comparisons).
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val schema = df.schema
    val xi = schema.fieldIndex(xCol)
    val yi = schema.fieldIndex(yCol)
    def num(r: Row, i: Int): Double = r.get(i) match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric $other")
    }
    def sweep(it: Iterator[Row]): Iterator[Row] = {
      var minY = Double.PositiveInfinity
      var keptX = Double.NaN
      var keptY = Double.NaN
      it.flatMap { r =>
        val x = num(r, xi); val y = num(r, yi)
        if (y < minY) { minY = y; keptX = x; keptY = y; Iterator.single(r) }
        else if (x == keptX && y == keptY) Iterator.single(r)
        else Iterator.empty
      }
    }
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val local = clean
      .sortWithinPartitions(col(xCol), col(yCol))
      .mapPartitions(sweep)(enc)
    local
      .coalesce(1)
      .sortWithinPartitions(col(xCol), col(yCol))
      .mapPartitions(sweep)(enc)
  }

  /** Driver-gate query: parts on the (size, retailprice) Pareto frontier
    * — cheapest part for every size class where no smaller-or-equal size
    * is also cheaper-or-equal.
    */
  def skylineParts(s: SparkSession, dir: String): DataFrame =
    skyline2D(t(s, dir, "part")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice")),
      "p_size", "p_retailprice")
      .orderBy(col("p_size"), col("p_retailprice"), col("p_partkey"))
}
