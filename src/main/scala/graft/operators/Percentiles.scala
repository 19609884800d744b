package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed EXACT interpolated percentiles (percentile_cont
  * semantics) via sketch-prune + exact ranking:
  *
  *   1. one map-side-combined pass builds, per group, the row count and a
  *      Greenwald-Khanna sketch queried at p ± 4ε (ε = 1/accuracy) — the
  *      sketch's deterministic rank-error bound means the true bracketing
  *      rows for p are guaranteed to lie inside that value bracket;
  *   2. one pass counts, exactly, the rows strictly below each bracket;
  *   3. one pass collapses in-bracket rows to (value, count) — at most
  *      ~8εn rows per group survive;
  *   4. a window over those few candidate rows assigns exact global ranks
  *      (below-count + running in-bracket count), and the two bracketing
  *      values interpolate with the same expression shape (and therefore
  *      the same IEEE-754 bits) as the engines' built-in percentile_cont.
  *
  * Why not the `percentile` aggregate: it buffers every value of a group
  * in one aggregation buffer — a 100 TB group is an OOM, not a spill.
  * Why not sort-rank (the previous form here): a row_number window sorts
  * each GROUP inside a single task — few-key workloads collapse to
  * single-reducer sorts at scale. This form's wide operations are three
  * column-pruned scans with partial aggregation; nothing anywhere holds
  * or sorts more than ~8n/accuracy rows of one group in one place.
  * Groups smaller than ~max(1000, 3·accuracy/4) rows skip pruning and
  * rank the whole group — at that size "the whole group" is already
  * candidate-sized.
  */
object Percentiles {

  /** Exact percentiles `ps` of `valCol` per `keyCol`. Output: keyCol,
    * p_<tag> columns in `ps` order (tag = percentile×100 rounded, e.g.
    * p50), ordered by key. NULL values are ignored (percentile_cont
    * semantics); a group whose values are ALL null is absent from the
    * output (the aggregate form would emit a NULL row for it). A NULL
    * group KEY survives: the key is carried as a one-field struct, whose
    * equality is null-safe, so the internal equi-joins keep the NULL-key
    * group (matching groupBy semantics).
    *
    * No broadcast hints: the stats frame is one row per group, so at high
    * key cardinality a forced broadcast would OOM the driver. All three
    * internal joins hash-partition on the same `__k`, making the stats
    * subtree a single reusable exchange; AQE converts the probe side to
    * broadcast at runtime when stats is actually small.
    */
  def grouped(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double], accuracy: Int = 1000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    require(ps.map(p => math.round(p * 100)).distinct.size == ps.size,
      s"percentile tags collide after rounding to whole percents: $ps")
    require(accuracy >= 100, s"accuracy $accuracy too low for the 4eps margin")
    def tag(p: Double): String = s"p${math.round(p * 100)}"
    val eps = 1.0 / accuracy
    val margin = 4 * eps
    // margin must exceed the sketch's rank error (eps*n) by the 2 ranks
    // floor/ceil interpolation can straddle: 4eps*n >= eps*n + 2 needs
    // n >= 2/(3eps); below that, pruning is skipped entirely
    val smallN = math.max(1000L, math.ceil(2.0 / (3 * eps)).toLong)

    // probe the sketch at p-4eps / p+4eps (clamped); 0/1 hit min/max
    val probes = ps.flatMap(p =>
      Seq(math.max(0.0, p - margin), math.min(1.0, p + margin)))
      .distinct.sorted
    val probeAt = probes.zipWithIndex.toMap
    def loC(p: Double): Column = col(s"__lo_${tag(p)}")
    def hiC(p: Double): Column = col(s"__hi_${tag(p)}")
    def belowC(p: Double): Column = col(s"__below_${tag(p)}")

    // one-field struct: struct equality treats NULL fields as equal, so
    // the equi-joins below are null-safe without <=> (which would block
    // the using-column form and exchange reuse)
    val clean = df
      .select(struct(col(keyCol)).as("__k"),
        col(valCol).cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)

    // pass 1: per-group count + sketch brackets
    val probesSql = probes.mkString("array(", ",", ")")
    val stats = clean.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"),
        expr(s"approx_percentile(__v, $probesSql, $accuracy)").as("__apx"))
      .select(Seq(col("__k"), col("__n"), (col("__n") <= smallN).as("__small")) ++
        ps.flatMap { p =>
          Seq(
            element_at(col("__apx"), probeAt(math.max(0.0, p - margin)) + 1)
              .as(s"__lo_${tag(p)}"),
            element_at(col("__apx"), probeAt(math.min(1.0, p + margin)) + 1)
              .as(s"__hi_${tag(p)}"))
        }: _*)

    val joined = clean.join(stats, "__k")

    // pass 2: exact count strictly below each lower bracket value
    val belowAggs = ps.map { p =>
      sum(when(!col("__small") && col("__v") < loC(p), 1L).otherwise(0L))
        .as(s"__below_${tag(p)}")
    }
    val below = joined.groupBy(col("__k")).agg(belowAggs.head, belowAggs.tail: _*)

    // pass 3: candidates collapsed to (value, exact multiplicity)
    val inBracket = ps.map(p => col("__v") >= loC(p) && col("__v") <= hiC(p))
      .reduce(_ || _)
    val cand = joined.filter(col("__small") || inBracket)
      .groupBy(col("__k"), col("__v")).agg(count(lit(1)).as("__c"))

    val info = stats.join(below, "__k")

    // one window over the few candidate rows: per-p running in-bracket
    // counts give exact global rank ranges [below+cum-c+1, below+cum]
    val w = Window.partitionBy(col("__k")).orderBy(col("__v"))
    val perP = ps.map { p =>
      val inB = col("__small") || (col("__v") >= loC(p) && col("__v") <= hiC(p))
      sum(when(inB, col("__c")).otherwise(0L)).over(w).as(s"__cum_${tag(p)}")
    }
    val ranked = cand.join(info, "__k")
      .select(col("*") +: perP: _*)

    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast(DoubleType)
    val aggs = ps.map { p =>
      val cum = col(s"__cum_${tag(p)}")
      val start = belowC(p) + cum - col("__c") + 1
      val end = belowC(p) + cum
      val rLo = (floor(pos(p)) + 1).cast(LongType)
      val rHi = (ceil(pos(p)) + 1).cast(LongType)
      val vLo = min(when(rLo.between(start, end), col("__v")))
      val vHi = min(when(rHi.between(start, end), col("__v")))
      (vLo + (vHi - vLo) * min(pos(p) - floor(pos(p)))).as(tag(p))
    }
    ranked.groupBy(col("__k"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__k").getField(keyCol).as(keyCol) +:
        ps.map(p => col(tag(p))): _*)
      .orderBy(col(keyCol))
  }
}
