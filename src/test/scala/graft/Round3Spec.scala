package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.queries.{Analytics, Relational}

/** Round-3 operators: span dedup, decontamination, co-moment statistics,
  * cohort retention, and the shared-ANSI SQL surface.
  */
class Round3Spec extends SparkSpecBase {
  import spark.implicits._

  test("spanDedup: crafted corpus with a known repeated span") {
    // doc 1: spans [w0..w9], [w10..w19]; doc 2 repeats doc 1's first span
    // then adds a fresh one; doc 3 is too short for any span
    val d1 = (0 until 20).map(i => s"w$i").mkString(" ")
    val d2 = ((0 until 10) ++ (100 until 110)).map(i => s"w$i").mkString(" ")
    val d3 = "tiny doc under ten tokens"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = TextAnalysis.spanDedupOf(docs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 0L), (2L, 2L, 1L)))
  }

  test("decontamNgram: only train docs sharing an eval shingle are flagged") {
    val evalSet = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "something about the quick brown animal"), // shares "the quick brown"
      (2L, "completely different words here entirely")).toDF("doc_id", "text")
    val out = TextAnalysis.decontamNgramOf(train, evalSet).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out(0).getLong(1) == 1L) // exactly one shared shingle
    assert(out(0).getLong(2) == 4L) // 6 tokens -> 4 shingles
  }

  test("q10eCorr: decimal co-moment corr matches built-in corr to 1e-6") {
    val ours = Relational.q10eCorr(spark, sfDir)
      .select($"l_returnflag", $"corr_qp").as[(String, Double)].collect().toMap
    val ref = Tables.t(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"))
      .as[(String, Double)].collect().toMap
    assert(ours.keySet == ref.keySet)
    ours.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-6, k) }
  }

  test("cohort retention: week-0 dominates and event mass is conserved") {
    val out = Analytics.q28bCohort(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val byCohort = out.groupBy(_._1)
    byCohort.foreach { case (c, rows) =>
      val w0 = rows.find(_._2 == 0L)
      assert(w0.isDefined, s"cohort $c missing week 0")
      // every cohort member is active in week 0 by construction
      assert(rows.forall(_._3 <= w0.get._3), s"cohort $c retention > cohort size")
    }
    val totalEvents = Tables.t(spark, sfDir, "events").count()
    assert(out.map(_._4).sum == totalEvents)
  }

  test("shared-ANSI TPC-H statements run through spark.sql and rank correctly") {
    val q3 = Analytics.sqlTpchQ3(spark, sfDir).collect()
    assert(q3.nonEmpty && q3.length <= 10)
    val rev3 = q3.map(_.getDouble(2)).toSeq
    assert(rev3 == rev3.sortBy(-(_: Double)), "q3 not revenue-descending")
    val q5 = Analytics.sqlTpchQ5(spark, sfDir).collect()
    val rev5 = q5.map(_.getDouble(1)).toSeq
    assert(rev5 == rev5.sortBy(-(_: Double)), "q5 not revenue-descending")
  }

  test("percentiles: sketch-pruned path (large groups) equals percentile aggregate") {
    val rnd = new scala.util.Random(7)
    // two large groups (prune path), heavy duplicates in one, plus a
    // tiny group (whole-group path) in the same call
    val data = (1 to 30000).map(i => ("big", rnd.nextDouble() * 1e6)) ++
      (1 to 25000).map(i => ("dupes", (rnd.nextInt(40) * 10).toDouble)) ++
      Seq(("tiny", 1.0), ("tiny", 2.0), ("tiny", 3.0))
    val df = data.toDF("k", "v")
    val ps = Seq(0.05, 0.5, 0.99)
    val ours = graft.operators.Percentiles.grouped(df, "k", "v", ps)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = df.groupBy($"k")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("p"))
      .collect().map(r => r.getString(0) -> {
        val s = r.getSeq[Double](1); (s(0), s(1), s(2)) }).toMap
    assert(ours == ref)
  }

  test("zorder2: matches a reference interleave and is monotone per dimension") {
    graft.functions.ZOrderFunction.register(spark)
    def refSpread(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).sum
    def refZ(x: Long, y: Long): Long = refSpread(x) | (refSpread(y) << 1)
    val pts = Seq((0L, 0L), (3L, 5L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (70000L, 70001L)) // >16 bits: masked
    val got = pts.toDF("x", "y")
      .select(graft.functions.ZOrderFunction.zorder2($"x", $"y")).as[Long].collect()
    val want = pts.map { case (x, y) => refZ(x & 0xffffL, y & 0xffffL) }
    assert(got.toSeq == want)
  }

  test("zorderCluster: range partitions are narrow in BOTH dimensions") {
    val grid = for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val parts = graft.operators.Layout.zorderCluster(df, "x", "y", 16)
      .rdd.mapPartitions { it =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (rows.isEmpty) Iterator.empty
        else Iterator((rows.map(_._1).max - rows.map(_._1).min,
          rows.map(_._2).max - rows.map(_._2).min))
      }.collect()
    // a 1-D sort by x would leave y spanning the full 0..127 range in
    // every partition; z-order keeps both dimensions narrow
    assert(parts.nonEmpty)
    val avgX = parts.map(_._1).sum.toDouble / parts.length
    val avgY = parts.map(_._2).sum.toDouble / parts.length
    assert(avgX < 80 && avgY < 80, s"avg ranges $avgX/$avgY not clustered")
  }

  test("LSH index: partitioned write + directory-pruned probe matches the join form") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString
    val emb = Tables.t(spark, sfDir, "embeddings")
    Similarity.writeLshIndex(spark, emb, dir)
    val probeVec = emb.filter($"vec_id" === 0)
      .select($"embedding").head.getSeq[Float](0).toArray
    val probed = Similarity.probeLshIndex(spark, dir, probeVec, k = 6)
    // the scan must prune on the partition column, not read-all-and-filter
    val f = probed.queryExecution.executedPlan.toString
    assert(f.contains("PartitionFilters") && f.contains("bucket"),
      s"expected bucket partition pruning in:\n$f")
    // self (vec_id=0, cosine 1.0) ranks first; remaining results equal the
    // join-form ANN on the same probe
    val got = probed.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 0L && got.head._2 == 1.0)
    val joinForm = Similarity.annLshTopK(spark, sfDir, probeId = 0, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.tail.toSeq == joinForm.toSeq)
  }

  test("IVF index: partitioned write + pruned probe matches the in-query form") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    val emb = Tables.t(spark, sfDir, "embeddings")
    val centroids = Similarity.writeIvfIndex(spark, emb, dir)
    val probeVec = emb.filter($"vec_id" === 0)
      .select($"embedding").head.getSeq[Float](0).toArray
    val probed = Similarity.probeIvfIndex(spark, dir, centroids, probeVec, k = 6)
    val f = probed.queryExecution.executedPlan.toString
    assert(f.contains("PartitionFilters") && f.contains("cell"),
      s"expected cell partition pruning in:\n$f")
    val got = probed.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 0L && got.head._2 == 1.0) // self ranks first
    val inQuery = Similarity.annIvfTopK(spark, sfDir, probeId = 0, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.tail.toSeq == inQuery.toSeq)
  }

  test("bit/bool aggregates: xor of duplicated rows cancels") {
    val df = Seq(1L, 2L, 3L).toDF("v")
    val once = df.agg(expr("bit_xor(v)")).collect()(0).getLong(0)
    val twice = df.union(df).agg(expr("bit_xor(v)")).collect()(0).getLong(0)
    assert(once == (1L ^ 2L ^ 3L) && twice == 0L)
  }
}
