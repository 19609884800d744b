package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-10 hardening: the semDedup occupancy cap (the last unguarded
  * data-controlled quadratic), reliable-checkpoint k-means, the honored
  * joinCardinality top-K, the skew-report → join-strategy decision, and
  * deterministic first-touch attribution under timestamp ties.
  */
class Round10Spec extends SparkSpecBase {

  test("semdedup bounded gate: loose cap is identity, tight cap is subset") {
    val out = operators.Similarity.semDedupBoundedChecked(spark, sfDir)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_vecs") > 0)
    assert(r.getAs[Long]("loose_cap_eq") == 1L, "loose cap changed the drop set")
    assert(r.getAs[Long]("tight_cap_subset") == 1L, "tight cap ADDED drops")
  }

  test("semdedup cap bounds a skewed cell's work data-independently") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // adversarial corpus: one near-duplicate-heavy semantic cluster (200
    // copies of the same direction, tiny deterministic jitter) plus a
    // handful of far-away vectors — the crawl-data shape where one
    // k-means cell goes quadratic without the guardrail
    val dim = 64
    val hot = (0L until 200L).map { i =>
      (i, Array.tabulate(dim)(d => (if (d == 0) 10.0 else 0.0) +
        0.001 * ((i + d) % 7).toDouble).map(_.toFloat))
    }
    val cold = (200L until 210L).map { i =>
      (i, Array.tabulate(dim)(d =>
        if (d == (i % dim).toInt) -10.0f else 0.0f))
    }
    val emb = (hot ++ cold).toDF("vec_id", "embedding")
    val k = 2
    val cap = 10
    val full = operators.Similarity.semDedupOf(emb, k, 2, 0.4, None).cache()
    val capped = operators.Similarity.semDedupOf(emb, k, 2, 0.4, Some(cap))
      .cache()
    val fullDropped = full.filter(!col("kept"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val cappedDropped = capped.filter(!col("kept"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // uncapped: the hot cell prunes nearly everything (the quadratic did
    // real work); capped: drops are bounded by k·cap by construction —
    // only admitted ids can be dropped
    assert(fullDropped.size > 150, s"hot cell under-pruned: $fullDropped")
    assert(cappedDropped.nonEmpty)
    assert(cappedDropped.size <= k * cap,
      s"cap leaked: ${cappedDropped.size} drops > k*cap=${k * cap}")
    // one-sided recall: the cap only ever KEEPS more
    assert(cappedDropped.subsetOf(fullDropped), "capped drops not a subset")
    // loose-cap identity EXECUTED through the capped admission path (the
    // gate's occupancy argument proves it by construction; this proves
    // it by running it): a cap above every cell's occupancy must
    // reproduce the uncapped output bit-for-bit
    val loose = operators.Similarity
      .semDedupOf(emb, k, 2, 0.4, Some(100000)).collect()
    assert(loose.sameElements(full.collect()),
      "a non-biting cap changed the output")
    // unadmitted vectors are all present and kept — total coverage holds
    assert(capped.count() == emb.count())
    assert(capped.filter(col("kept")).count() ==
      emb.count() - cappedDropped.size)
    full.unpersist(); capped.unpersist()
  }

  test("semdedup hierarchical: diverse cells split; identical cells can't and fall to the cap") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // gate contract holds on the corpus tables
    val g = operators.Similarity.semDedupHierChecked(spark, sfDir)
      .collect().head
    assert(g.getAs[Long]("n_vecs") > 0)
    assert(g.getAs[Long]("hier_subset") == 1L)
    assert(g.getAs[Long]("refine_no_growth") == 1L)
    // ORGANIC case: the real (near-orthogonal) corpus — refinement
    // splits wide cells, so the max refined occupancy strictly drops
    val emb = Tables.t(spark, sfDir, "embeddings")
    val asg = operators.KMeans.assignmentsOf(emb, 4, 2)
      .select(col("vec_id"), col("cid")).cache()
    val coarseMax = asg.groupBy(col("cid")).count()
      .agg(max(col("count"))).head().getLong(0)
    val sub = operators.KMeans.subAssignmentsOf(emb, asg, targetCell = 5, 2)
    val refinedMax = sub.groupBy(col("cid"), col("sub")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(refinedMax < coarseMax,
      s"diverse cells did not split: $refinedMax !< $coarseMax")
    asg.unpersist()
    // DEGENERATE case: 200 identical vectors — every point equidistant
    // to every sub-centroid, the argmin tiebreak sends all to sub 0, so
    // NO Lloyd's can split the cell…
    val dim = 64
    val degenerate = ((0L until 200L).map { i =>
      (i, Array.tabulate(dim)(d => if (d == 0) 10.0f else 0.0f))
    } ++ (200L until 210L).map { i =>
      (i, Array.tabulate(dim)(d =>
        if (d == (i % dim).toInt) -10.0f else 0.0f))
    }).toDF("vec_id", "embedding")
    val dAsg = operators.KMeans.assignmentsOf(degenerate, 2, 2)
      .select(col("vec_id"), col("cid")).cache()
    val dSub = operators.KMeans.subAssignmentsOf(degenerate, dAsg,
      targetCell = 10, 2)
    val dMax = dSub.groupBy(col("cid"), col("sub")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(dMax >= 200L, s"identical-vector cell split impossibly: $dMax")
    // …which is exactly why the cap remains the hard backstop: the
    // hierarchical form with maxCell bounds the drop set anyway
    val capped = operators.Similarity
      .semDedupHierOf(degenerate, 2, 2, 0.4, targetCell = 10,
        maxCell = Some(10)).cache()
    val nDropped = capped.filter(!col("kept")).count()
    assert(nDropped > 0 && nDropped <= 2 * 10,
      s"cap leaked through the hierarchical path: $nDropped")
    assert(capped.count() == 210L)
    capped.unpersist(); dAsg.unpersist()
  }

  test("recursive refinement: bounded fanout reaches target occupancy in levels") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // nested-diversity corpus: 2 coarse blobs × 4 sub-blobs × 8 points
    // (distinct directions at two scales) — with fanout capped at 2 a
    // single level CANNOT reach target occupancy 8; recursion must.
    // Ids interleave across blob AND sub-blob so the lowest-id seeds of
    // every Lloyd's level land in different sub-structures.
    val dim = 64
    val emb = (for {
      blob <- 0 until 2; subBlob <- 0 until 4; pt <- 0 until 8
    } yield {
      val id = (pt * 8 + subBlob * 2 + blob).toLong
      val v = Array.fill(dim)(0.0f)
      v(blob) = 100.0f                 // coarse separation (dims 0-1)
      v(8 + subBlob) = 10.0f           // sub-blob separation (dims 8-11)
      v(16 + (pt % 4)) = 1.0f + (pt / 4) // point-level texture
      (id, v)
    }).toDF("vec_id", "embedding")
    val asg = operators.KMeans.assignmentsOf(emb, 2, 2)
      .select(col("vec_id"), col("cid")).cache()
    def maxOcc(a: org.apache.spark.sql.DataFrame): Long =
      a.groupBy(col("cid")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxOcc(asg.select(col("vec_id"), col("cid").cast("long").as("cid")))
      == 32L, "coarse blobs must hold 32 points each")
    // one fanout-2 level halves at best: still over target 8
    val one = operators.KMeans.refineToTarget(emb, asg, targetCell = 8,
      iters = 1, fanout = 2, maxLevels = 1)
    assert(maxOcc(one) > 8L, "fanout 2 cannot reach target in one level")
    // enough levels: every cell lands at or under target (this corpus is
    // splittable at every scale)
    val full = operators.KMeans.refineToTarget(emb, asg, targetCell = 8,
      iters = 1, fanout = 2, maxLevels = 4)
    assert(maxOcc(full) <= 8L, s"recursion stalled at ${maxOcc(full)}")
    assert(full.count() == emb.count(), "refinement must not lose vectors")
    // the recursive dedup form: coverage + one-sided recall vs flat
    val rec = operators.Similarity.semDedupRecursiveOf(emb, 2, 2, 0.9,
      targetCell = 8, fanout = 2, maxLevels = 4).cache()
    assert(rec.count() == emb.count())
    val flatDropped = operators.Similarity.semDedupOf(emb, 2, 2, 0.9, None)
      .filter(!col("kept")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val recDropped = rec.filter(!col("kept")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(recDropped.subsetOf(flatDropped),
      "recursive drops must be one-sided vs flat")
    rec.unpersist(); asg.unpersist()
  }

  test("kmeans: reliable-checkpoint mode is bit-identical to local mode") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val local = operators.KMeans.assignmentsOf(emb, 4, 2)
      .orderBy(col("vec_id")).collect()
    val ckDir = java.nio.file.Files.createTempDirectory("graft-kmeans-ck")
      .toString
    val reliable = operators.KMeans
      .assignmentsOf(emb, 4, 2, checkpointDir = Some(ckDir))
      .orderBy(col("vec_id")).collect()
    assert(local.sameElements(reliable))
    // the reliable mode really wrote through the fault-tolerant store
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
    val wrote =
      try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally walk.close()
    assert(wrote > 0, "no reliable checkpoint files written")
  }

  test("joinCardinality honors topK: ranked rows match the definitional sort") {
    val got = operators.Quality.dqJoinCardinality(spark, sfDir).collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    // totals repeat on every rank row
    assert(got.map(_.getAs[Long]("join_rows")).distinct.length == 1)
    // definitional replay: per-key products ranked by (rows_out desc, k)
    val o = Tables.t(spark, sfDir, "orders")
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("ca"))
    val l = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cb"))
    val expect = o.join(l, "k")
      .select(col("k"), (col("ca") * col("cb")).as("rows_out"))
      .orderBy(col("rows_out").desc, col("k")).limit(3).collect()
    got.zip(expect).foreach { case (g, e) =>
      assert(g.getAs[Long]("top_key") == e.getAs[Long]("k"))
      assert(g.getAs[Long]("top_rows") == e.getAs[Long]("rows_out"))
    }
    // a wider K is honored too
    val five = operators.Quality.joinCardinality(
      Tables.t(spark, sfDir, "orders"), col("o_orderkey"),
      Tables.t(spark, sfDir, "lineitem"), col("l_orderkey"), topK = 5)
    assert(five.count() == 5)
    // disjoint key sets still answer with ONE totals row (null-ranked),
    // not silence — the audit's whole point is the zero-match verdict
    import spark.implicits._
    val disj = operators.Quality.joinCardinality(
      Seq(1L, 2L).toDF("x"), col("x"),
      Seq(9L, 10L).toDF("y"), col("y")).collect()
    assert(disj.length == 1)
    val dr = disj.head
    assert(dr.getAs[Long]("join_rows") == 0L)
    assert(dr.getAs[Long]("matched_keys") == 0L)
    assert(dr.isNullAt(dr.fieldIndex("rank")))
  }

  test("skew report's recommendation picks salted on the planted skew") {
    def ratioOf(rep: Array[Row]): Double = {
      assert(rep.length == 1)
      rep.head.getAs[Double]("skew_ratio")
    }
    // the planted gate distribution (3 keys × ~10% of rows each) at the
    // driver's gate scale (sf0.01) lands far beyond the salting
    // threshold; at sf0.001 the shrunken key universe still clears the
    // AQE band — the ratio GROWS with scale, which is the point
    val planted = ratioOf(operators.Quality
      .dqSkewReport(spark, "/root/testdata/sf0.01").collect())
    assert(planted >= 20.0, s"planted skew ratio only $planted")
    assert(operators.Quality.recommendJoinStrategy(planted) == "salted")
    val plantedSmall = ratioOf(operators.Quality.dqSkewReport(spark, sfDir)
      .collect())
    assert(plantedSmall >= 5.0, s"sf0.001 planted ratio only $plantedSmall")
    assert(operators.Quality.recommendJoinStrategy(plantedSmall) != "plain")
    // a near-unique key (o_orderkey: one row per key) is plain
    val uniform = ratioOf(operators.Quality.skewReport(
      Tables.t(spark, sfDir, "orders"), col("o_orderkey")).collect())
    assert(uniform < 5.0, s"uniform key reported ratio $uniform")
    assert(operators.Quality.recommendJoinStrategy(uniform) == "plain")
    // the middle band routes to AQE's runtime split
    assert(operators.Quality.recommendJoinStrategy(10.0) == "aqe_skew")
    intercept[IllegalArgumentException] {
      operators.Quality.recommendJoinStrategy(1.0, aqeRatio = 30.0)
    }
  }

  test("attribution: first touch breaks timestamp ties on event_id") {
    import spark.implicits._
    // two touches share a ts_us inside the window; a third is older.
    // min-of-struct must credit the tied pair's LOWER event_id (5), and
    // the rows-frame last touch the HIGHER one (10) — both
    // deterministic, engine-order-independent
    val base = 1700000000000000L // µs
    val rows = Seq(
      (1L, 10L, "click", base), // tied pair AT the window's earliest ts
      (1L, 5L, "view", base),
      (1L, 7L, "view", base + 500000L),
      (1L, 99L, "purchase", base + 1000000L))
      .toDF("user_id", "event_id", "event_type", "ts_us")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_micros(col("ts_us")).as("ts"))
    val out = queries.Analytics
      .touchAttributionOf(rows, windowUs = 3000000L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("first_touch_id") == 5L,
      s"tie not broken on id: ${r.mkString(",")}")
    assert(r.getAs[String]("first_touch_type") == "view")
    assert(r.getAs[Long]("last_touch_id") == 7L)
    // the window bound still applies: shrink it past every touch and
    // the first touch disappears entirely
    val narrow = queries.Analytics
      .touchAttributionOf(rows, windowUs = 400000L).collect().head
    assert(narrow.isNullAt(narrow.fieldIndex("first_touch_id")))
  }

  test("vocab coverage: checkpointed histogram yields the same curve") {
    val out = operators.TextAnalysis.vocabCoverage(spark, sfDir).collect()
    assert(out.length == 3)
    assert(out.forall { r =>
      val c = r.getAs[Double]("coverage"); c > 0.0 && c <= 1.0 })
    // monotone in the cutoff
    val cov = out.sortBy(_.getAs[Long]("cutoff")).map(_.getAs[Double]("coverage"))
    assert(cov.sameElements(cov.sorted))
  }
}
