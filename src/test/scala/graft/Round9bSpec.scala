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

  test("er incremental: join-existing, new-cluster, new-singleton, no chaining") {
    import spark.implicits._
    val base = Seq((10L, "alpha", 1, "A", 100.0))
      .toDF("rec_id", "name", "nat", "seg", "bal")
    val delta = Seq(
      (21L, "alpha", 1, "A", 100.05), // exact name, in tolerance -> joins 10
      (22L, "alphx", 1, "A", 100.08), // lev 1 to base -> joins 10
      (23L, "alpxa", 1, "A", 100.02), // lev 1 to base -> joins 10
      (31L, "gamma", 1, "A", 100.00), // lev 4 to base -> new singleton
      (41L, "delta", 2, "A", 50.00),  // no base in nat 2; pairs with 42
      (42L, "deltx", 2, "A", 50.05),  // -> new cluster rep 41
      (61L, "blpxx", 1, "A", 100.10)) // lev 3 to base, lev 2 to ASSIGNED 23:
      .toDF("rec_id", "name", "nat", "seg", "bal") // no chaining -> singleton
    val out = operators.EntityResolution.incrementalLink(base, delta)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      21L -> (10L, 0L), 22L -> (10L, 0L), 23L -> (10L, 0L),
      31L -> (31L, 1L), 41L -> (41L, 1L), 42L -> (41L, 1L),
      61L -> (61L, 1L)))
  }

  test("random projection: codegen ≡ reference loop, JL mean ≈ 1, map-side only") {
    val rp = operators.Quantization.randomProjection(spark, sfDir).cache()
    // reference loop (MatrixProject.projectOf) replayed on one vector
    // must reproduce the query's y1..y4 exactly
    def signOf(j: Int, i: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp_${j}_${i}".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xF) % 2 == 0) 1.0 else -1.0
    }
    val matrix = Array.tabulate(16, 64)((j, i) => signOf(j, i) * 0.25)
    val v0 = Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).toArray
    val yRef = functions.MatrixProject.projectOf(v0, matrix)
    val row0 = rp.filter(col("vec_id") === 0).head
    (1 to 4).foreach { c =>
      assert(math.abs(row0.getDouble(c) - yRef(c - 1)) < 1e-6)
    }
    // JL: per-vector norm ratios concentrate around 1 in expectation
    val meanRatio = rp.agg(avg(col("norm_ratio"))).head.getDouble(0)
    assert(meanRatio > 0.8 && meanRatio < 1.2, s"mean norm ratio $meanRatio")
    // pure map-side: the plan has no join of any kind
    val plan = rp.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"projection plan grew a join:\n${plan.take(800)}")
    rp.unpersist()
  }

  test("interpolation: known rows exact, gaps linear between neighbors") {
    val interp = operators.TimeSeries.interpolateHourly(spark, sfDir).cache()
    val fill = operators.TimeSeries.gapFillHourly(spark, sfDir)
      .select(col("user_id"), col("hour_us"), col("filled"), col("is_gap"))
    // same spine, same gap verdicts as the LOCF twin
    assert(interp.select("user_id", "hour_us", "is_gap")
      .exceptAll(fill.select("user_id", "hour_us", "is_gap")).isEmpty)
    // on non-gap rows the two fills agree exactly (both = observed value)
    val together = interp.withColumnRenamed("is_gap", "ig")
      .join(fill.drop("is_gap"), Seq("user_id", "hour_us"))
    assert(together.filter(!col("ig") && col("interp") =!= col("filled")).isEmpty)
    // every gap value lies within [min, max] of its two neighbors and is
    // strictly between them when they differ — replay per user via collect
    val rows = interp.orderBy(col("user_id"), col("hour_us")).collect()
      .groupBy(_.getLong(0))
    var gapsChecked = 0
    rows.values.foreach { series =>
      val vs = series.map(r => (r.getDouble(2), r.getBoolean(3)))
      vs.indices.foreach { i =>
        if (vs(i)._2) {
          val prev = (i - 1 to 0 by -1).find(j => !vs(j)._2).map(vs(_)._1).get
          val next = (i + 1 until vs.length).find(j => !vs(j)._2).map(vs(_)._1).get
          val lo = math.min(prev, next); val hi = math.max(prev, next)
          assert(vs(i)._1 >= lo - 1e-9 && vs(i)._1 <= hi + 1e-9,
            s"gap value ${vs(i)._1} outside [$lo, $hi]")
          gapsChecked += 1
        }
      }
    }
    assert(gapsChecked > 0, "corpus produced no gaps — test vacuous")
    interp.unpersist()
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
