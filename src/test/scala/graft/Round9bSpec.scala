package graft

import org.apache.spark.sql.functions._

/** Round-9 session-2 operators: entity resolution and the equi-depth
  * range partitioner.
  */
class Round9bSpec extends SparkSpecBase {

  import operators.{EntityResolution, Layout}

  test("er: banded blocking finds exactly the definitional match set") {
    val reg = EntityResolution.dirtyRegistry(
      Tables.t(spark, sfDir, "customer")).cache()
    // definitional matches: full in-block O(block²) join, no banding —
    // the oracle's shape, computed independently of the operator
    val brute = reg.as("a").join(reg.as("b"),
        col("a.rec_id") < col("b.rec_id") &&
          col("a.nat") === col("b.nat") && col("a.seg") === col("b.seg"))
      .filter(abs(col("a.bal") - col("b.bal")) <= 0.10 &&
        levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.rec_id").as("i"), col("b.rec_id").as("j"))
    val banded = EntityResolution.matchedPairs(reg).select("i", "j")
    assert(banded.exceptAll(brute).isEmpty, "banded emitted a non-match")
    assert(brute.exceptAll(banded).isEmpty,
      "banded blocking MISSED a definitional match (band completeness broken)")
    // and exactly-once generation: no duplicate pairs
    assert(banded.count() === banded.distinct().count())
    reg.unpersist()
  }

  test("er: variants resolve to their original; survivor is the original") {
    val ents = EntityResolution.erEntities(spark, sfDir).cache()
    val multi = ents.filter(col("n_recs") > 1)
    // every multi-record cluster is rooted at an original (rec_id ≡ 0
    // mod 10) and survives with the UNperturbed name (no 'x', length 18)
    assert(multi.filter(col("cluster_rep") % 10 =!= 0).isEmpty)
    assert(multi.filter(length(col("canonical_name")) =!= 18 ||
      col("canonical_name").contains("x")).isEmpty)
    // mod-10 customers carry two variants → at least one 3-cluster, and
    // the balance envelope must cover the synthesized ±0.04 drift
    assert(multi.agg(max(col("n_recs"))).head.getLong(0) === 3L)
    assert(multi.filter(col("bal_max") < col("bal_min")).isEmpty)
    // registry conservation: cluster sizes sum to the registry size
    val nRegs = EntityResolution.dirtyRegistry(
      Tables.t(spark, sfDir, "customer")).count()
    assert(ents.agg(sum(col("n_recs"))).head.getLong(0) === nRegs)
    ents.unpersist()
  }

  test("er: candidate join is banded-equi, comparator never in a nested loop") {
    val pairs = EntityResolution.erPairs(spark, sfDir)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"er blocking went nested-loop:\n${plan.take(1200)}")
    // levenshtein must run post-join (Filter/Project), not as part of a
    // join condition that would force a non-equi plan
    val levLines = plan.linesIterator.filter(_.contains("levenshtein")).toSeq
    assert(levLines.nonEmpty && !levLines.exists(_.contains("NestedLoop")))
  }

  test("range partitioner: equi-depth, disjoint, exhaustive, shard-invariant") {
    val orders = Tables.t(spark, sfDir, "orders")
    val stats = Layout.rangePartitionStats(orders, "o_totalprice", 16).cache()
    val rows = stats.collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until 16L))
    // equi-depth: counts differ by at most 1 across shards
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1,
      s"unbalanced shards: ${counts.mkString(",")}")
    assert(counts.sum === orders.count())
    // ranges strictly ordered and disjoint: shard i's hi < shard i+1's lo
    val los = rows.map(_.getDouble(2)); val his = rows.map(_.getDouble(3))
    assert((0 until 15).forall(i => his(i) < los(i + 1)))
    // the internal prefix-sum shard count must not leak into the result
    val alt = Layout.rangePartitionStats(orders, "o_totalprice", 16, nShards = 5)
    assert(alt.exceptAll(stats).isEmpty && stats.exceptAll(alt).isEmpty,
      "boundaries depend on the prefix-sum shard count")
    stats.unpersist()
  }
}
