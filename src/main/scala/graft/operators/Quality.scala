package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the validation stage a training-data
  * pipeline runs before ingesting a drop (null keys, key uniqueness,
  * domain membership, value ranges, referential integrity), reported as
  * one long-format table of (check, violations, total, pass).
  *
  * Scale shape: every row-local predicate folds into ONE full-scan
  * aggregation (map-side combined conditional counts; uniqueness rides
  * the same scan as `count − countDistinct`), and the only other pass is
  * the FK anti-join, which is a plain key-partitioned join. No
  * per-check scans — a 12-check suite still reads the table once, which
  * is the difference between one and twelve 100 TB scans.
  *
  * Reference scope: extends the reference's implicit schema checks (Avro
  * decode failures, SURVEY.md §1.2) into explicit content constraints.
  */
object Quality {

  /** Library-facing form: one-scan violation report over arbitrary named
    * row predicates (a row violates a check when its predicate is FALSE
    * or NULL) and aggregate-expression checks (a violation COUNT
    * expression, e.g. `count − countDistinct` for uniqueness) — both
    * tiers fold into the SAME single aggregation/scan. `extra` adds
    * single-row (name → count) frames for checks needing their own plan
    * (FK integrity via anti-join, …).
    */
  def report(df: DataFrame, rowChecks: Seq[(String, Column)],
      aggChecks: Seq[(String, Column)] = Seq.empty,
      extra: Seq[(String, DataFrame)] = Seq.empty): DataFrame = {
    require(rowChecks.nonEmpty)
    def vName(n: String) = s"__v_$n"
    val aggCols = (count(lit(1)).as("total") +:
      rowChecks.map { case (n, pred) =>
        sum(when(pred, 0L).otherwise(1L)).as(vName(n)) }) ++
      aggChecks.map { case (n, e) => e.as(vName(n)) }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val joined = extra.foldLeft(one) { case (acc, (n, f)) =>
      acc.crossJoin(f.toDF(vName(n))) // single-row frames
    }
    val names =
      (rowChecks.map(_._1) ++ aggChecks.map(_._1) ++ extra.map(_._1))
    val stackArgs = names
      .map(n => s"'$n', ${vName(n)}").mkString(", ")
    joined
      .select(expr(s"stack(${names.size}, $stackArgs) " +
        "AS (check_name, violations)"), col("total"))
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check_name")
  }

  /** Join-key skew diagnostic — the pre-flight check before shuffling
    * 100 TB on a key: row/key cardinalities, the per-key count
    * distribution's max/median/p99, the heaviest key, and the skew
    * ratio (max over mean). This is what decides between a plain
    * shuffle join, AQE skew splitting, and the salted join — measured,
    * not guessed.
    *
    * Scale shape: per-key counts are one map-side-combined aggregation;
    * everything after collapses to the COUNT HISTOGRAM (≤ √n rows by
    * the pigeonhole on Σ c — the vocab-coverage collapse), whose
    * cumulative pass rides the sharded prefix sum. Percentiles are
    * integer cross-multiplied over the histogram (percentile_disc
    * semantics); the heaviest key is one min-of-struct aggregate. The
    * key universe is never sorted and never passes a single task.
    */
  def skewReport(fact: DataFrame, key: Column,
      nShards: Int = 32): DataFrame = {
    val counts = fact.select(key.cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
    val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("n_keys"))
    val bounds = hist.agg(min(col("c")).as("lo"), (max(col("c")) + 1L).as("hi"))
    val cum = PrefixSum.shardedCumSum(
      hist.crossJoin(broadcast(bounds))
        .withColumn("pid",
          PrefixSum.rangePid(col("c"), col("lo"), col("hi"), nShards))
        .drop("lo", "hi"),
      Seq.empty, "pid", "c", "n_keys")
    val tot = hist.agg(
      sum(col("c") * col("n_keys")).as("n_rows"),
      sum(col("n_keys")).as("n_keys_tot"),
      max(col("c")).as("max_cnt"))
    val pcts = cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("cum") * 2 >= col("n_keys_tot"), col("c"))).as("p50_cnt"),
        min(when(col("cum") * 100 >= col("n_keys_tot") * 99, col("c")))
          .as("p99_cnt"))
    val top = counts
      .agg(min(struct((-col("c")).as("nc"), col("k"))).as("t"))
      .select(col("t.k").as("top_key"), (-col("t.nc")).as("top_cnt"))
    tot.crossJoin(broadcast(pcts)).crossJoin(broadcast(top))
      .select(col("n_rows"), col("n_keys_tot").as("n_keys"), col("max_cnt"),
        col("p50_cnt"), col("p99_cnt"), col("top_key"), col("top_cnt"),
        round(col("max_cnt").cast("double") * col("n_keys_tot") / col("n_rows"), 6)
          .as("skew_ratio"))
  }

  /** dq_skew_report gate: the skew-planted key (residues 0-2 mod 10
    * collapse onto 3 hot partkeys at ~10% of rows each) — the shape
    * where the report must scream before the cluster does.
    */
  def dqSkewReport(s: SparkSession, dir: String): DataFrame =
    skewReport(t(s, dir, "lineitem"),
      when(col("l_partkey") % 10 < 3, col("l_partkey") % 10)
        .otherwise(col("l_partkey")))

  /** The decision [[skewReport]] exists to feed — measured skew ratio →
    * join strategy, closing the measure-then-choose loop:
    *
    *   - `skew_ratio < aqeRatio` → "plain": the heaviest key is within
    *     AQE's own skew tolerance (`skewedPartitionFactor` defaults to
    *     5× median), so the unmodified shuffle join is balanced enough;
    *   - `< saltRatio`           → "aqe_skew": let AQE's runtime
    *     skew-split replicate the build side against the oversized
    *     partitions — no plan rewrite, works when a handful of keys are
    *     each a single-digit multiple of the mean;
    *   - `≥ saltRatio`           → "salted": one key owns a material
    *     share of ALL rows (the planted gate shape: 3 keys × ~10 %
    *     each ⇒ ratio in the hundreds), so the fix belongs BEFORE the
    *     exchange — [[SkewJoin.saltedInnerJoin]] fans the hot key's rows
    *     across `salts` partitions and replicates only the small side's
    *     matching rows, keeping every task bounded by construction
    *     (AQE's post-shuffle split still funnels the hot key's map
    *     output through one exchange partition's write path first).
    *
    * Pure function of the report's metrics (deterministic, spec-pinned);
    * callers `collect()` the one-row report — parameter-sized by
    * construction — and wire the verdict into their join build.
    */
  def recommendJoinStrategy(skewRatio: Double, aqeRatio: Double = 5.0,
      saltRatio: Double = 20.0): String = {
    require(aqeRatio <= saltRatio,
      s"aqeRatio $aqeRatio must not exceed saltRatio $saltRatio")
    if (skewRatio < aqeRatio) "plain"
    else if (skewRatio < saltRatio) "aqe_skew"
    else "salted"
  }

  /** Exact pre-join cardinality: |A ⋈ B on k| = Σ_k cntA(k)·cntB(k),
    * computed from the two per-key count tables (key-cardinality-sized,
    * never the fact product) — with the `topK` heaviest contributing
    * keys, the output-side complement of [[skewReport]]'s input-side
    * view: run both before committing a 100 TB shuffle join. The
    * count-table join is a plain keyed equi-join; products and their
    * sum are exact integers. Ranking the top keys uses the bounded
    * k-heap aggregate (map-side partials, O(topK) state — never a
    * key-universe sort); the heap orders on double(rows_out), exact
    * below 2⁵³, ties on key ASC, and the reported counts come from an
    * exact join-back on the winner keys. Output: one row per rank,
    * totals repeated on each.
    */
  def joinCardinality(left: DataFrame, lKey: Column, right: DataFrame,
      rKey: Column, topK: Int = 3): DataFrame = {
    graft.functions.TopKFunctions.register(left.sparkSession)
    val ca = left.select(lKey.cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("ca"))
    val cb = right.select(rKey.cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("cb"))
    val prod = ca.join(cb, "k")
      .select(col("k"), (col("ca") * col("cb")).as("rows_out"))
      .localCheckpoint(true) // two consumers: totals + the top-K rank
    val tot = prod.agg(sum(col("rows_out")).as("join_rows"),
      count(lit(1)).as("matched_keys"))
    val top = prod
      .agg(graft.functions.TopKFunctions.topkByValue(
        col("rows_out").cast("double"), col("k"), topK).as("t"))
      .select(posexplode(col("t")))
      .select((col("pos") + 1L).as("rank"), col("col.id").as("top_key"))
      .join(prod.withColumnRenamed("k", "top_key"), "top_key")
      .withColumnRenamed("rows_out", "top_rows")
    // left-outer from the totals: disjoint key sets (top empty) still
    // report their one matched_keys=0 row — the case the pre-join audit
    // exists for must not answer with silence
    tot.join(broadcast(top), lit(true), "left_outer")
      .select(col("rank"), col("top_key"), col("top_rows"),
        coalesce(col("join_rows"), lit(0L)).as("join_rows"),
        col("matched_keys"))
      .orderBy(col("rank"))
  }

  /** dq_join_cardinality gate: orders ⋈ lineitem on orderkey — the
    * fact-fact join every TPC-H shape shuffles; the estimate here is
    * EXACT (it is the definition), so the oracle replays it directly.
    */
  def dqJoinCardinality(s: SparkSession, dir: String): DataFrame =
    joinCardinality(t(s, dir, "orders"), col("o_orderkey"),
      t(s, dir, "lineitem"), col("l_orderkey"))

  /** dq_checks — the six-constraint suite over `orders` (FK → customer).
    * `date_in_range` genuinely fires on the testdata (orders spill past
    * 2001-01-01): a report with a failing row is the interesting case.
    */
  def dqOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val fk = orders
      .join(t(s, dir, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    report(orders,
      rowChecks = Seq(
        "key_not_null" -> col("o_orderkey").isNotNull,
        "price_positive" -> (col("o_totalprice") > 0.0),
        "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
        "date_in_range" ->
          (col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("2001-01-01").cast("timestamp"))),
      aggChecks = Seq("key_unique" ->
        (count(col("o_orderkey")) - countDistinct(col("o_orderkey")))),
      extra = Seq("fk_custkey_exists" -> fk))
  }
}
