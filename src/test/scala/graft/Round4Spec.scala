package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.functions.{HyperplaneBucket, ZOrderFunction}
import graft.queries.Relational

/** Round-4 fixes: percentile NULL-key groups and unhinted stats join,
  * zorder2 analysis-time typing, shared LSH sign-bit helper.
  */
class Round4Spec extends SparkSpecBase {
  import spark.implicits._

  test("percentiles: NULL group key survives and matches the aggregate form") {
    val df = (Seq.tabulate(50)(i => (Some("a"), i.toDouble)) ++
      Seq.tabulate(50)(i => (Option.empty[String], i * 2.0)))
      .toDF("k", "v")
    val out = graft.operators.Percentiles.grouped(df, "k", "v", Seq(0.5))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    val ref = df.groupBy($"k")
      .agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    assert(out.keySet == Set(Some("a"), None)) // NULL-key group present
    assert(out == ref)
  }

  test("percentiles: stats subtree plans as ONE reused exchange, no broadcast hint") {
    val df = Tables.t(spark, sfDir, "lineitem")
      .select($"l_returnflag".as("k"), $"l_quantity".cast("double").as("v"))
    val q = graft.operators.Percentiles.grouped(df, "k", "v", Seq(0.5, 0.9))
    // no forced broadcast anywhere: at high key cardinality a hinted
    // broadcast of the per-group stats frame would OOM the driver
    assert(!q.queryExecution.analyzed.toString.contains("Hint"),
      "percentile plan must not force a broadcast hint")
    q.collect() // settle AQE
    // pass 1 (count + sketch) must run once; the other instantiations of
    // the stats subtree must come back as ReusedExchange at runtime
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected stats exchange reuse in final adaptive plan:\n$plan")
  }

  test("zorder2: non-BIGINT input fails at analysis time, not runtime") {
    ZOrderFunction.register(spark)
    val df = Seq((1, 2)).toDF("x", "y") // INT columns
    val e = intercept[AnalysisException] {
      df.select(ZOrderFunction.zorder2(col("x"), col("y"))).collect()
    }
    assert(e.getMessage.contains("BIGINT"))
    // and the happy path still works
    val ok = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrderFunction.zorder2(col("x"), col("y"))).head.getLong(0)
    // interleave(x=0b11, y=0b101): x bits -> even positions (0b101 = 5),
    // y bits -> odd positions (0b100010 = 34); 5 | 34 = 39
    assert(ok == 39L)
  }

  test("mixing: per-source cap keeps the lowest doc_ids, never exceeds cap") {
    val out = graft.operators.Mixing.mixSourceCap(spark, sfDir, cap = 10)
      .select($"source", $"doc_id").as[(String, Long)].collect()
    val bySource = out.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val all = Tables.t(spark, sfDir, "documents")
      .select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    bySource.foreach { case (src, kept) =>
      assert(kept.size <= 10, s"$src over cap")
      assert(kept.sorted.toList == all(src).take(kept.size).toList,
        s"$src must keep exactly the lowest doc_ids")
    }
  }

  test("mixing: temperature targets are sub-linear and kept counts hit them") {
    val out = graft.operators.Mixing.temperatureMix(spark, sfDir, totalTarget = 60)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perSource = out.groupBy(_._1)
    perSource.foreach { case (src, rows) =>
      val target = rows.head._4
      val nDocs = rows.head._3
      assert(rows.size == math.min(target, nDocs),
        s"$src kept ${rows.size}, target $target of $nDocs docs")
    }
    // sub-linear: a source with 4x the docs gets at most 2x the target
    val targets = out.map(r => (r._1, r._3, r._4)).distinct
    for ((s1, n1, t1) <- targets; (s2, n2, t2) <- targets
         if n2 >= 4 * n1 && t1 > 0)
      assert(t2 <= 2 * t1 + 1, s"$s2 ($n2 docs, target $t2) vs $s1 ($n1, $t1)")
  }

  test("equi-depth histogram: per-group bucket counts are near-balanced") {
    val out = Relational.q10iEquidepth(spark, sfDir)
      .select($"event_type", $"bucket", $"cnt").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    out.foreach { case (et, rows) =>
      assert(rows.length == 4, s"$et should fill all 4 quartile buckets")
      val counts = rows.sortBy(_._2).map(_._3)
      val n = counts.sum.toDouble
      counts.foreach(c => assert(math.abs(c - n / 4) <= n * 0.05 + 2,
        s"$et bucket counts $counts far from balanced"))
    }
  }

  test("simhash map-side expression is bit-identical to the agg form") {
    val docs = Tables.t(spark, sfDir, "documents").select($"doc_id", $"text")
    val viaAgg = graft.operators.Dedup.simhashSigs(docs)
      .as[(Long, Long)].collect().toMap
    val viaMap = docs
      .select($"doc_id", graft.operators.Dedup.simhashMapSide($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(viaMap.size == viaAgg.size && viaMap == viaAgg)
  }

  test("streaming near-dup dedup drops same-signature docs within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val src = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(t: String) = java.sql.Timestamp.valueOf(t)
    val q = streaming.StreamingOps.nearDupDedupStream(
      src.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    src.addData(
      (1L, ts("2024-03-01 00:00:01"), "the quick brown fox jumps high"),
      // same token sequence, different separators -> same signature
      (2L, ts("2024-03-01 00:00:02"), "The quick... BROWN fox;; jumps HIGH"),
      (3L, ts("2024-03-01 00:00:03"), "completely different document text here"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("neardup").select($"doc_id")
      .as[Long].collect().sorted.toList
    assert(kept == List(1L, 3L), s"expected near-dup 2 dropped, got $kept")
  }

  test("sketch rollup: merged daily sketches track exact weekly distincts") {
    val events = Tables.t(spark, sfDir, "events")
    val merged = graft.operators.SketchRollup.sketchRollup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = events
      .groupBy(date_trunc("week", $"ts").as("week"), $"event_type")
      .agg(count_distinct($"user_id").as("n"))
      .select(unix_micros($"week"), $"event_type", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (k, est) =>
      val ex = exact(k).toDouble
      assert(math.abs(est - ex) <= math.max(2.0, ex * 0.05),
        s"week/type $k: estimate $est vs exact $ex outside HLL envelope")
    }
    // merge path ≡ direct path: unioning day sketches must estimate the
    // same as sketching the week directly (mergeability contract)
    val direct = events
      .groupBy(date_trunc("week", $"ts").as("week"), $"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("e"))
      .select(unix_micros($"week"), $"event_type", $"e")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged == direct, "daily-merge estimates diverge from direct sketch")
  }

  test("int8 quantized search: top-10 recalls the exact-dot top-3") {
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val probe = emb.filter($"vec_id" === 0)
      .select($"embedding".as("probe_emb"))
    val exactTop3 = emb.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .select($"vec_id",
        graft.functions.VectorFunctions
          .dotProduct($"embedding", $"probe_emb").as("score"))
      .orderBy($"score".desc, $"vec_id".asc).limit(3)
      .select($"vec_id").as[Long].collect().toSet
    val quantTop10 = graft.operators.Quantization
      .embQuantizedTopK(spark, sfDir, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(exactTop3.subsetOf(quantTop10),
      s"8-bit quantization lost exact top-3 $exactTop3 from top-10 $quantTop10")
  }

  test("scd2: intervals tile each user's timeline with one exchange") {
    val out = graft.operators.TimeSeries.scd2Intervals(spark, sfDir)
    val rows = out.collect().map(r => (r.getLong(0), r.getString(2),
      r.getLong(3), if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._3)
      // contiguous, non-overlapping, open-ended tail
      sorted.sliding(2).foreach {
        case Array((_, _, _, to), (_, _, from, _)) =>
          assert(to == from, s"user $u: gap/overlap at $from")
        case _ =>
      }
      assert(sorted.last._4 == Long.MaxValue, s"user $u: last interval closed")
      // consecutive intervals always change type (else they'd be merged)
      sorted.sliding(2).foreach {
        case Array((_, t1, _, _), (_, t2, _, _)) =>
          assert(t1 != t2, s"user $u: unmerged consecutive $t1")
        case _ =>
      }
    }
    out.collect() // settle AQE before reading the final plan
    // AQE's toString prints the final plan AND the initial plan — count
    // exchanges in the final-plan section only
    val planStr = out.queryExecution.executedPlan.toString
    val finalSection = planStr.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(hashEx == 1, s"scd2 should need one user_id exchange, saw $hashEx")
  }

  test("compact: rewrites to the computed file count, preserves rows") {
    val src = Tables.t(spark, sfDir, "lineitem")
    val out = "/tmp/graft_compact_test"
    val n = graft.operators.Layout.compact(src, out, 32 * 1024)
    val files = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == n, s"expected $n parquet files, found $files")
    assert(n > 1, "target chosen so compaction must split")
    assert(spark.read.parquet(out).count() == src.count())
  }

  test("topk aggregate: equals the window form and plans a partial agg") {
    val viaAgg = Relational.q16cTopKPerGroup(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = Tables.t(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
    assert(viaAgg.collect().toSeq == viaWindow.collect().toSeq)
    // the scale property: a PARTIAL ObjectHashAggregate runs map-side —
    // each partition ships at most k rows per group, no group-wide sort
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by_value"),
      s"expected map-side partial top-k aggregation in:\n$plan")
  }

  test("chunking: strided chunks cover every token with the declared overlap") {
    val out = graft.operators.TextAnalysis
      .chunkDocsOf(Seq(
        (1L, (1 to 150).map(i => s"w$i").mkString(" ")), // 150 tokens
        (2L, "short doc"),                               // 2 tokens -> 1 chunk
        (3L, "")).toDF("doc_id", "text"), 64, 48)        // empty -> no rows
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).split(" ").length, r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(3L), "empty docs emit no chunks")
    assert(byDoc(2L).map(c => (c._2, c._4)).toSeq == Seq((0L, 2L)))
    val d1 = byDoc(1L).sortBy(_._2)
    // starts at 0,48,96,144 -> 4 chunks; sizes 64,64,54->? n=150:
    // start 96 -> min(64,54)=54; start 144 -> 6
    assert(d1.map(_._4).toSeq == Seq(64L, 64L, 54L, 6L))
    assert(d1.map(_._3).toSeq == Seq(64, 64, 54, 6), "chunk text length = n_tokens")
    // full coverage: last chunk reaches token n
    assert(48 * (d1.size - 1) + d1.last._4 == 150L)
  }

  test("skyline: two-phase sweep equals brute-force dominance, ties kept") {
    // crafted set: dominated points, a dominating chain, exact duplicates
    val pts = Seq(
      (1L, 1.0, 9.0), (2L, 3.0, 7.0), (3L, 3.0, 7.0), // 2,3 duplicates, kept
      (4L, 3.0, 8.0),  // dominated by 2 (x equal, y worse)
      (5L, 5.0, 7.0),  // dominated by 2 (y equal, x worse)
      (6L, 6.0, 2.0), (7L, 9.0, 1.0),
      (8L, 7.0, 3.0),  // dominated by 6
      (9L, 0.5, 12.0)) // frontier: smallest x
      .toDF("id", "x", "y").repartition(4) // exercise the local phase
    val out = graft.operators.Skyline.skyline2D(pts, "x", "y")
      .select($"id").as[Long].collect().toSet
    def dominated(a: (Long, Double, Double)) =
      Seq((1L, 1.0, 9.0), (2L, 3.0, 7.0), (3L, 3.0, 7.0), (4L, 3.0, 8.0),
        (5L, 5.0, 7.0), (6L, 6.0, 2.0), (7L, 9.0, 1.0), (8L, 7.0, 3.0),
        (9L, 0.5, 12.0)).exists(b => b._2 <= a._2 && b._3 <= a._3 &&
        (b._2 < a._2 || b._3 < a._3))
    val expected = Seq((1L, 1.0, 9.0), (2L, 3.0, 7.0), (3L, 3.0, 7.0),
      (4L, 3.0, 8.0), (5L, 5.0, 7.0), (6L, 6.0, 2.0), (7L, 9.0, 1.0),
      (8L, 7.0, 3.0), (9L, 0.5, 12.0)).filterNot(dominated).map(_._1).toSet
    assert(out == expected)
    assert(out == Set(1L, 2L, 3L, 6L, 7L, 9L))
    // real-table cross-check against the quadratic definition
    val part = Tables.t(spark, sfDir, "part")
      .select($"p_partkey", $"p_size", $"p_retailprice")
    val fast = graft.operators.Skyline
      .skyline2D(part, "p_size", "p_retailprice")
      .select($"p_partkey").as[Long].collect().toSet
    val rows = part.as[(Long, Int, Double)].collect()
    val brute = rows.filterNot(a => rows.exists(b =>
      b._2 <= a._2 && b._3 <= a._3 &&
        (b._2 < a._2 || b._3 < a._3))).map(_._1).toSet
    assert(fast == brute)
  }

  test("ts similarity: scores bounded, probe excluded, self-probe is perfect") {
    val out = graft.operators.TimeSeries.tsSimilarity(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (u, n, c) =>
      u != 1L && n >= 4 && c >= -1.000001 && c <= 1.000001 })
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.reverse.toSeq,
      "results must rank by correlation desc")
    // a user whose series IS the probe's (shifted id) must score 1.0:
    // feed a crafted frame through the same shape via probeUser trick —
    // the probe user's own exact duplicate hours exist only for itself,
    // so instead check an analytic invariant: correlating the probe's
    // series against itself through the formula gives exactly 1
    val hourly = Tables.t(spark, sfDir, "events")
      .select($"user_id", date_trunc("hour", $"ts").as("h"),
        $"value".cast("decimal(12,2)").as("v0"))
      .groupBy($"user_id", $"h")
      .agg(sum($"v0").cast("decimal(14,2)").as("v"))
      .filter($"user_id" === 1L)
    val r = hourly.select($"v".as("x"), $"v".as("y"))
      .agg((count(lit(1)).cast("double") * sum($"x" * $"y").cast("double")
        - sum($"x").cast("double") * sum($"y").cast("double")).as("num"),
        (count(lit(1)).cast("double") * sum($"x" * $"x").cast("double")
          - sum($"x").cast("double") * sum($"x").cast("double")).as("den"))
      .head()
    assert(math.abs(r.getDouble(0) / r.getDouble(1) - 1.0) < 1e-12)
  }

  test("topk rewrite/aggregate edges: k exceeding group size keeps the group") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.GraftExtensions()).getOrCreate()
      import s2.implicits._
      // 2 groups of 3 rows, k=10 > group size: all rows survive, ordered
      Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 2.0, 3L),
        ("b", 5.0, 4L), ("b", 4.0, 5L), ("b", 3.0, 6L))
        .toDF("g", "v", "id").createOrReplaceTempView("tk_small")
      val q = s2.sql(
        """SELECT g, v, id FROM (
          |  SELECT g, v, id,
          |    row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
          |  FROM tk_small) WHERE rn <= 10""".stripMargin)
      assert(q.queryExecution.optimizedPlan.toString.contains("topk_by_value"))
      val rows = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(rows.length == 6)
      assert(rows.filter(_._1 == "a").sortBy(t => (-t._2, t._3)).map(_._3).toSeq
        == Seq(2L, 3L, 1L), "ties on v must break by id ascending")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("percentiles: minimum accuracy and single-element groups") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("k", "v")
    val out = graft.operators.Percentiles
      .grouped(df, "k", "v", Seq(0.0, 0.5, 1.0), accuracy = 100)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a") == ((1.0, 1.0, 1.0)), "singleton group: all percentiles = the value")
    assert(out("b") == ((2.0, 3.0, 4.0)), "p50 of {2,4} interpolates to 3")
  }

  test("GraftExtensions injects native functions into a plain-SQL session") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      // new session over the same SparkContext, built THROUGH the
      // extensions path a spark-submit user would configure
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), " +
          "array(cast(1.0 as float), cast(0.0 as float))) AS c, " +
          "zorder2(3L, 5L) AS z, rolling_hash('abc') AS h").head
      // the aggregate injects too: SQL-callable without the rewrite
      val tk = s2.sql(
        "SELECT topk_by_value(v, id, 2) AS t FROM VALUES " +
          "(1.0D, 1L), (3.0D, 2L), (2.0D, 3L) AS tkv(v, id)")
        .selectExpr("transform(t, e -> e.id) AS ids").head.getSeq[Long](0)
      assert(tk == Seq(2L, 3L), s"expected ids (2,3) by value desc, got $tk")
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(r.getLong(1) == 39L)
      assert(r.getLong(2) == ("abc".getBytes.foldLeft(0L)(
        (h, b) => (h * 257L + (b & 0xffL)) % 1000000000000037L)))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("TopKRewrite: window-rank top-k optimizes to the heap aggregate") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      import s2.implicits._
      val df = (1 to 100).map(i =>
        ((i % 4).toString, (i % 10).toDouble, i.toLong))
        .toDF("g", "v", "id")
      df.createOrReplaceTempView("tk")
      val q = s2.sql(
        """SELECT g, v, id FROM (
          |  SELECT g, v, id,
          |    row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
          |  FROM tk) WHERE rn <= 3""".stripMargin)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("topk_by_value"),
        s"rewrite should fire on the safe pattern:\n$opt")
      assert(!opt.contains("row_number"), "window should be gone")
      // identical results to the un-rewritten session
      val viaRule = q.collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(t => (t._1, -t._2, t._3))
      val plainDf = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(df.collect(): _*)),
        df.schema)
      plainDf.createOrReplaceTempView("tk_plain")
      val viaWindow = spark.sql(
        """SELECT g, v, id FROM (
          |  SELECT g, v, id,
          |    row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
          |  FROM tk_plain) WHERE rn <= 3""".stripMargin)
        .collect().map(r =>
          (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(t => (t._1, -t._2, t._3))
      assert(viaRule.toSeq == viaWindow.toSeq)
      // safety: rn escaping the filter blocks the rewrite
      val unsafe = s2.sql(
        """SELECT g, v, id, rn FROM (
          |  SELECT g, v, id,
          |    row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
          |  FROM tk) WHERE rn <= 3""".stripMargin)
      assert(!unsafe.queryExecution.optimizedPlan.toString.contains("topk_by_value"),
        "rewrite must not fire when the rank column is projected")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("hyperplane bucket: shared helper equals the expression over the corpus") {
    graft.functions.VectorFunctions.register(spark)
    val planes = Array(
      Array(1.0, -0.5, 0.25, 0.0), Array(-1.0, 0.0, 2.0, -0.125),
      Array(0.5, 0.5, -0.5, 0.5))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hb_test", exprs => graft.functions.HyperplaneBucket(exprs.head, planes),
      "built-in")
    val vecs = Seq(
      Array(0.9f, 0.1f, -0.3f, 2.0f), Array(-1.0f, -1.0f, -1.0f, -1.0f),
      Array(0.0f, 0.0f, 0.0f, 0.0f), // zero vector: every dot==0 -> all sign bits set
      Array(2.5f, -0.5f)) // shorter than the planes: min-length truncation
    val viaExpr = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
      .selectExpr("id", "hb_test(emb) AS b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(viaExpr(i.toLong) == HyperplaneBucket.bucketOf(v, planes),
        s"probe-side helper diverged from expression for vector $i")
    }
  }
}
