package graft

import graft.queries.Analytics
import org.apache.spark.sql.functions._

/** Round-9 session-3 operators: CUSUM changepoint scan and the
  * session's later additions.
  */
class Round9cSpec extends SparkSpecBase {

  // ---- per-key CUSUM changepoint scan ----

  test("cusum scan: golden recurrence, alarm reset, key isolation") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    // user 1: three sustained high points drift S⁺ over a small h;
    // user 2: one low point (S⁻ side seeds, no alarm)
    val rows = Seq(
      (1L, ts(0), 10L, "click", 90.0),  // sp = 30
      (1L, ts(1), 11L, "click", 90.0),  // sp = 60 > h=50 → alarm, reset
      (1L, ts(2), 12L, "click", 90.0),  // sp = 30 again (fresh test)
      (2L, ts(3), 20L, "click", 10.0))  // sn = 30, no alarm
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = graft.operators.TimeSeries.cusumScanOf(rows, mu = 50.0,
        kappa = 10.0, h = 50.0)
      .collect().sortBy(p => (p.user_id, p.ts_us)).toSeq
    assert(out.map(_.sp_raw) == Seq(30.0, 60.0, 30.0, 0.0),
      "S⁺ must accumulate, cross, then restart from the post-alarm reset")
    assert(out.map(_.alarmed) == Seq(false, true, false, false))
    // user 2 starts from zero state (no bleed from user 1's reset)
    assert(out.last.sn_raw == 30.0 && out.last.sp_raw == 0.0)
  }

  test("cusum scan: slack floors noise at zero; below-target drift alarms S⁻") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    val noise = (0 until 5).map(i =>
      (1L, ts(i), 10L + i, "click", if (i % 2 == 0) 55.0 else 45.0))
    val low = (0 until 3).map(i => (2L, ts(i), 30L + i, "click", 10.0))
    val rows = (noise ++ low)
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = graft.operators.TimeSeries.cusumScanOf(rows, mu = 50.0,
        kappa = 10.0, h = 70.0)
      .collect().sortBy(p => (p.user_id, p.ts_us)).toSeq
    // ±5 noise sits inside the ±10 slack: both sums stay pinned at 0
    assert(out.take(5).forall(p => p.sp_raw == 0.0 && p.sn_raw == 0.0))
    // sustained 10s: sn = 30, 60, 90 → alarm on the third point
    assert(out.drop(5).map(_.sn_raw) == Seq(30.0, 60.0, 90.0))
    assert(out.drop(5).map(_.alarmed) == Seq(false, false, true))
  }

  // ---- sparse TF-IDF cosine similarity join ----

  test("tfidf sim join: verbatim duplicates score 1, disjoint docs never pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),    // verbatim dup of 1
      (3L, "epsilon zeta eta theta"))    // token-disjoint
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis
      .tfidfSimilarPairsOf(docs, dfCap = 100, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set((1L, 2L)),
      "only the duplicate pair may emit; disjoint docs share no posting")
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-9,
      s"identical normalized vectors must score 1, got ${out((1L, 2L))}")
  }

  test("tfidf sim join: df cap removes ubiquitous tokens from the space") {
    import spark.implicits._
    // every doc shares 'common'; distinctive tokens are disjoint — the
    // only similarity signal is the ubiquitous token
    val docs = Seq(
      (1L, "common aaa bbb"), (2L, "common ccc ddd"), (3L, "common eee fff"))
      .toDF("doc_id", "text")
    val capped = operators.TextAnalysis
      .tfidfSimilarPairsOf(docs, dfCap = 2, tau = 0.01)
    assert(capped.isEmpty,
      "df=3 token must be out of the df≤2 vocabulary — no pairs")
    // with the cap open, idf(common) = ln(3/3) = 0 → weight 0 → the
    // posting join still yields cos 0, filtered by any positive tau:
    // ubiquitous tokens carry no signal even when admitted
    val open = operators.TextAnalysis
      .tfidfSimilarPairsOf(docs, dfCap = 100, tau = 0.01)
    assert(open.isEmpty)
  }

  test("tfidf sim join: exactly-once pairs, ordered, invariant to layout") {
    val docs = Tables.t(spark, sfDir, "documents")
    val base = operators.TextAnalysis
      .tfidfSimilarPairsOf(docs, dfCap = 100, tau = 0.3).collect()
    assert(base.nonEmpty, "the near-dup-rich corpus must produce pairs")
    val keys = base.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "duplicate (i,j) rows")
    assert(keys.forall { case (i, j) => i < j }, "pair orientation broken")
    val shuffled = operators.TextAnalysis
      .tfidfSimilarPairsOf(docs.repartition(32, col("doc_id")),
        dfCap = 100, tau = 0.3).collect()
    assert(base.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      shuffled.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq,
      "quantized-decimal dot products must not depend on layout")
  }

  // ---- per-group heavy hitters ----

  test("grouped heavy hitters: equals the plain grouped GROUP BY answer") {
    import spark.implicits._
    val fact = Tables.t(spark, sfDir, "events")
    val key = when($"user_id" % 10 < 3, $"user_id" % 10).otherwise($"user_id")
    val got = operators.HeavyHitters.freqHeavyHittersGrouped(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    val n = fact.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val want = fact.select($"event_type".as("grp"), key.cast("long").as("item"))
      .groupBy($"grp", $"item").agg(count(lit(1)).as("cnt"))
      .join(n.select($"event_type".as("grp"), $"n"), "grp")
      .filter($"cnt" >= ceil($"n" * 0.05))
      .select($"grp", $"item", $"cnt")
      .orderBy($"grp", $"cnt".desc, $"item")
      .as[(String, Long, Long)].collect().toSeq
    assert(want.nonEmpty, "degenerate fixture: no per-group heavy hitters")
    assert(got == want)
    // every group with data must surface its planted hot keys
    assert(got.map(_._1).distinct.size == 5, "all 5 event types must report")
  }

  test("grouped heavy hitters: sketches are per-group (no cross-group bleed)") {
    import spark.implicits._
    // item 1 is heavy ONLY in group a; group b's stream never sees it
    val rows = Seq.fill(50)(("a", 1L)) ++ (0L until 50L).map(i => ("a", 100L + i)) ++
      Seq.fill(60)(("b", 2L)) ++ (0L until 40L).map(i => ("b", 500L + i))
    val out = operators.HeavyHitters.heavyHittersByGroup(
        rows.toDF("g", "item").repartition(7), col("g"), col("item"),
        frac = 0.2, k = 8)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 1L, 50L), ("b", 2L, 60L)),
      s"got $out — thresholds must apply per group against that group's n")
  }

  // ---- contrastive pair builder ----

  test("pair builder: negatives are perceptually distinct; anchors decode true") {
    import spark.implicits._
    val pairs = operators.Multimodal.pairBuilder(spark, sfDir).cache()
    val n = pairs.count()
    val docs = Tables.t(spark, sfDir, "documents").count()
    assert(n > 0 && n <= docs, "at most one pair per anchor")
    assert(pairs.filter($"doc_id" === $"neg_doc").isEmpty)
    assert(pairs.filter($"anchor_hash" === $"neg_hash").isEmpty,
      "the true-negative guard must hold in the output")
    // the anchor hash must be the SAME 64-bit aHash the dedup operator
    // computes from decoded pixels
    val dedupKeepers = operators.Multimodal.ahashDedup(spark, sfDir)
      .select($"ahash").distinct()
    assert(pairs.select($"anchor_hash".as("ahash")).distinct()
      .exceptAll(dedupKeepers).isEmpty,
      "anchor hashes must come from the decoded-pixel hash space")
    // deterministic across invocations
    val again = operators.Multimodal.pairBuilder(spark, sfDir)
      .collect().toSeq.toString
    assert(again == pairs.orderBy($"doc_id").collect().toSeq.toString)
    pairs.unpersist()
  }

  // ---- join cardinality ----

  test("join cardinality: equals the real join size; golden with dup keys") {
    import spark.implicits._
    // r10 shape: one row per rank, totals repeated on each
    val rows = operators.Quality.dqJoinCardinality(spark, sfDir).collect()
    val actual = Tables.t(spark, sfDir, "orders").as("o")
      .join(Tables.t(spark, sfDir, "lineitem").as("l"),
        col("o.o_orderkey") === col("l.l_orderkey")).count()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("join_rows") == actual,
      "the estimate IS the definition"))
    // 2x3 + 1x1 = 7 rows out; key 1 contributes 6, key 2 contributes 1
    val a = Seq(1L, 1L, 2L).toDF("x")
    val b = Seq(1L, 1L, 1L, 2L, 9L).toDF("y")
    val g = operators.Quality
      .joinCardinality(a, col("x"), b, col("y")).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("top_key"),
        r.getAs[Long]("top_rows"), r.getAs[Long]("join_rows"),
        r.getAs[Long]("matched_keys"))).toSeq
    assert(g == Seq((1L, 1L, 6L, 7L, 2L), (2L, 2L, 1L, 7L, 2L)),
      s"golden mismatch: $g")
  }

  // ---- quantile transform table ----

  test("quantile transform: ECDF is monotone, closes at 1, conserves counts") {
    val t = Analytics.featQuantileTransform(spark, sfDir).cache()
    val byGrp = t.collect().groupBy(_.getString(0))
    assert(byGrp.nonEmpty)
    byGrp.foreach { case (g, rows) =>
      val e = rows.map(_.getDouble(4))
      assert(e.zip(e.tail).forall { case (a, b) => a < b },
        s"$g: ecdf must strictly increase over distinct values")
      assert(e.last == 1.0, s"$g: the max value must map to 1.0")
      val n = Tables.t(spark, sfDir, "lineitem")
        .filter(col("l_returnflag") === g).count()
      assert(rows.map(_.getLong(2)).sum == n, s"$g: counts must conserve")
      assert(rows.last.getLong(3) == n, s"$g: cum must close at n")
    }
    t.unpersist()
  }

  // ---- purged temporal split ----

  test("embargo split: golden boundary, gap rows in neither side") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val e = (1 to 10).map(i => (i.toLong, ts(i))).toDF("event_id", "ts")
    val got = graft.operators.TimeSeries
      .embargoSplitOf(e, pNum = 4, pDen = 5, embargoUs = 2000000L,
        nShards = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // p80 of 10 rows → boundary = 8th timestamp; embargo spans [8s, 10s)
    assert(got("train")._1 == 7L && got("embargo")._1 == 2L &&
      got("test")._1 == 1L, s"got $got")
    assert(got("train")._3 < got("embargo")._2 &&
      got("embargo")._3 < got("test")._2, "ranges must be disjoint, ordered")
  }

  test("embargo split: sides never overlap in time; shard-invariant") {
    def run(n: Int) = graft.operators.TimeSeries
      .embargoSplitOf(Tables.t(spark, sfDir, "events"), 4, 5,
        86400000000L, n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val base = run(32)
    assert(base == run(1) && base == run(7))
    val m = base.map(t => t._1 -> t).toMap
    assert(m("train")._4 < m("embargo")._3 && m("embargo")._4 < m("test")._3)
    // the embargo must cover exactly the configured span after boundary
    assert(m("embargo")._4 - m("embargo")._3 < 86400000000L)
  }

  // ---- audio trim + fertility ----

  test("audio trim: known clip golden; impossible threshold trims everything") {
    val out = operators.Multimodal.audioTrim(spark, sfDir)
      .filter(col("doc_id") === 0L).collect()
    // doc 0: base 0, n 64 → first |amp| ≥ 32 at i=32, kept 32,
    // sum 32..63 = 1520
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq == Seq((64L, 32L, 32L, 1520L)))
    val none = operators.Multimodal.audioTrim(spark, sfDir,
      threshold = 1000000L).agg(max(col("n_kept"))).head.getLong(0)
    assert(none == 0L, "a threshold above every amplitude must trim all")
  }

  test("fertility: langs partition the corpus; ratios are sane") {
    val docs = Tables.t(spark, sfDir, "documents")
    val rep = operators.TextAnalysis.textFertility(spark, sfDir).collect()
    assert(rep.map(_.getLong(1)).sum == docs.count())
    rep.foreach { r =>
      assert(r.getDouble(3) > 1.0, "docs have more than one token")
      assert(r.getDouble(4) > 1.0, "tokens span more than one char")
    }
  }

  // ---- behavioral path mining ----

  test("path trigrams: golden paths, gap break, cross-user isolation") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val rows = Seq(
      // user 1: a→b→c→d tight, then a 40-min gap breaks the chain to e
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(5)),
      (1L, 12L, "c", ts(10)), (1L, 13L, "d", ts(15)),
      (1L, 14L, "e", ts(55)),
      // user 2 repeats a→b→c once; their d is another user's event
      (2L, 20L, "a", ts(0)), (2L, 21L, "b", ts(5)), (2L, 22L, "c", ts(10)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Analytics.pathTrigramsOf(rows, gapUs = 30L * 60 * 1000000L,
        k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b>c", 2L), ("b>c>d", 1L)),
      s"got $got — c>d>e must be gap-broken, users must not chain")
  }

  // ---- watermark / out-of-orderness report ----

  test("watermark report: golden lateness distribution") {
    import spark.implicits._
    // arrival order: e1(ts 10s), e2(ts 5s → 5s late), e3(ts 20s),
    // e4(ts 18s → 2s late)
    val e = Seq(
      (1L, 10000000L, 100L), (2L, 5000000L, 200L),
      (3L, 20000000L, 300L), (4L, 18000000L, 400L))
      .toDF("event_id", "ts_us", "arrival_us")
    val Array(r) = graft.operators.TimeSeries
      .watermarkReportOf(e, nShards = 2).collect()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((4L, 2L, 0.5)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((0L, 5L, 5L, 5L)), "p50/p95/p99/max of {0,5,0,2} seconds")
  }

  test("watermark report: in-order stream reports zero lateness; shard-invariant") {
    import spark.implicits._
    val inOrder = (0L until 100L)
      .map(i => (i, i * 1000000L, i * 1000000L))
      .toSeq.toDF("event_id", "ts_us", "arrival_us")
    val Array(z) = graft.operators.TimeSeries
      .watermarkReportOf(inOrder, nShards = 8).collect()
    assert(z.getLong(1) == 0L && z.getLong(6) == 0L,
      "already-ordered arrivals must report nothing late")
    // the gate query's input under different internal shard counts
    val events = Tables.t(spark, sfDir, "events")
    val jitter = conv(substring(md5($"event_id".cast("string")
      .cast("binary")), 1, 15), 16, 10).cast("long") % 120000000L
    val withArrival = events
      .select($"event_id", unix_micros($"ts").as("ts_us"))
      .withColumn("arrival_us", $"ts_us" + jitter)
    def rep(n: Int) = graft.operators.TimeSeries
      .watermarkReportOf(withArrival, n).collect().toSeq.toString
    assert(rep(1) == rep(5) && rep(5) == rep(32),
      "prefix max must be shard-count invariant")
  }

  // ---- join-key skew report ----

  test("skew report: golden distribution incl. discrete percentiles") {
    import spark.implicits._
    val rows = (Seq.fill(5)(7L) ++ Seq(8L, 9L, 10L)).toDF("k")
    val Array(r) = operators.Quality.skewReport(rows, col("k")).collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((8L, 4L, 5L)),
      "n_rows / n_keys / max_cnt")
    assert((r.getLong(3), r.getLong(4)) == ((1L, 5L)),
      "p50 = 1 (3 of 4 keys are singletons), p99 = 5 (the whale)")
    assert((r.getLong(5), r.getLong(6)) == ((7L, 5L)), "heaviest key")
    assert(r.getDouble(7) == 2.5, "skew = max/mean = 5/(8/4)")
  }

  test("skew report: the planted-skew gate key screams") {
    val Array(r) = operators.Quality.dqSkewReport(spark, sfDir).collect()
    val n = Tables.t(spark, sfDir, "lineitem").count()
    assert(r.getLong(0) == n, "row total must match the fact table")
    assert(Set(0L, 1L, 2L).contains(r.getLong(5)),
      "the heaviest key must be one of the planted hot residues")
    assert(r.getDouble(7) > 10.0,
      s"planted 10%-keys must dominate the mean, got ratio ${r.getDouble(7)}")
  }

  // ---- hash-ring negative sampling ----

  test("negative sampling: never emits an edge or a self-pair; ≤ k per node") {
    import spark.implicits._
    val edges = operators.Graph.basketEdges(
      Tables.t(spark, sfDir, "lineitem")
        .filter(pmod($"l_partkey", lit(4)) === 0)
        .select($"l_orderkey", $"l_partkey")).cache()
    val neg = operators.Graph.negativeSample(spark, sfDir).cache()
    assert(neg.count() > 0)
    assert(neg.filter($"u" === $"neg_v").isEmpty, "self-pair leaked")
    val undirected = edges.select($"u", $"v")
      .union(edges.select($"v".as("u"), $"u".as("v")))
    assert(neg.select($"u", $"neg_v".as("v")).intersect(undirected).isEmpty,
      "a real edge survived rejection")
    val perNode = neg.groupBy($"u").count().agg(max($"count")).head.getLong(0)
    assert(perNode <= 3, "more than k draws for a node")
    // deterministic: same output under different input layout
    val again = operators.Graph
      .negativeSampleOf(edges.repartition(17), k = 3, shardBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == neg.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    edges.unpersist(); neg.unpersist()
  }

  test("negative sampling: complete graph rejects everything; draws stay in range") {
    import spark.implicits._
    // K3: every cross-node candidate IS an edge → rejection leaves none
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(operators.Graph.negativeSampleOf(k3, k = 2, shardBits = 0).isEmpty)
    // two disjoint edges: any accepted negative must cross components
    val comps = Seq((1L, 2L), (3L, 4L)).toDF("u", "v")
    val out = operators.Graph.negativeSampleOf(comps, k = 2, shardBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.nonEmpty, "4-node ring with 2 forbidden edges must accept some draw")
    val cross = Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(out.forall { case (u, v) =>
      cross.contains((math.min(u, v), math.max(u, v))) },
      s"accepted pair inside a component: ${out.toSeq}")
  }

  // ---- first/last-touch attribution ----

  test("attribution: golden credits, window edge, cross-user isolation") {
    import spark.implicits._
    val d = 24L * 3600 * 1000000
    def ts(us: Long) = new java.sql.Timestamp(1700000000000L + us / 1000)
    val wk = 7 * d
    val rows = Seq(
      // user 1: click → view → purchase (credit first=click, last=view),
      // then a late purchase whose 7-day window excludes the click
      (1L, 10L, "click", ts(0L)),
      (1L, 11L, "view", ts(2 * d)),
      (1L, 12L, "purchase", ts(3 * d)),
      (1L, 13L, "purchase", ts(wk + d)), // window [1d, 8d): click at 0 out
      // user 2: purchase with no touches at all → both credits null
      (2L, 20L, "purchase", ts(d)),
      // user 3: click exactly 7d before the purchase → still included
      (3L, 30L, "click", ts(0L)),
      (3L, 31L, "purchase", ts(wk)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Analytics.touchAttributionOf(rows, wk)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)), Option(r.get(5)), Option(r.get(7)))).toMap
    assert(out(12L) == ((Some(10L), Some(11L), Some(d))),
      "first=click, last=view, latency 1 day")
    assert(out(13L) == ((Some(11L), Some(11L), Some(wk - d))),
      "7-day window drops the old click; view credits both ends")
    assert(out(20L) == ((None, None, None)), "no touches → null credits")
    assert(out(31L) == ((Some(30L), Some(30L), Some(wk))),
      "a touch exactly windowUs old is still inside the RANGE frame")
  }

  test("attribution: both window frames share one user exchange") {
    val q = Analytics.touchAttribution(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val userExchanges = "hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges == 1,
      s"expected ONE user_id exchange feeding both frames, got $userExchanges:\n$plan")
  }

  // ---- vocabulary coverage curve ----

  test("vocab coverage: golden curve incl. a cut inside a tied count class") {
    import spark.implicits._
    // freq: a=2, b=2, c=1 → hist { c=2: 2 types, c=1: 1 type }
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    def run(ks: Seq[Long], shards: Int) = operators.TextAnalysis
      .vocabCoverageOf(docs, ks, shards)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val got = run(Seq(1L, 2L, 3L, 9L), 4)
    // k=1 cuts INSIDE the two-type c=2 class: covered = 4 − (2−1)·2 = 2
    assert(got == Seq(
      (1L, 1L, 2L, 5L, 0.4),
      (2L, 2L, 4L, 5L, 0.8),
      (3L, 3L, 5L, 5L, 1.0),
      (9L, 3L, 5L, 5L, 1.0)), s"got $got") // k > vocab clamps to vocab
  }

  test("vocab coverage: invariant to shard count; monotone on the corpus") {
    val docs = Tables.t(spark, sfDir, "documents")
    def run(shards: Int) = operators.TextAnalysis
      .vocabCoverageOf(docs, Seq(5L, 15L, 30L), shards)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(4))).toSeq
    val base = run(32)
    assert(base == run(1) && base == run(5),
      "sharded prefix sum must be shard-count invariant")
    val covs = base.map(_._3)
    assert(covs == covs.sorted && covs.distinct == covs,
      "coverage must strictly increase across these cutoffs")
  }

  // ---- calibration report ----

  test("calibration: bins partition the corpus; gaps and shares are bounded") {
    val docs = Tables.t(spark, sfDir, "documents")
    val rep = operators.TextAnalysis.calibrationReportOf(docs).collect()
    assert(rep.map(_.getLong(1)).sum == docs.count(), "bins must partition")
    assert(rep.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    rep.foreach { r =>
      val (conf, acc, gap) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(conf >= 0 && conf <= 1 && acc >= 0 && acc <= 1)
      assert(math.abs(math.abs(acc - conf) - gap) < 2e-6,
        "abs_gap must derive from the rounded per-bin means")
    }
    // the corpus has en and non-en docs: the report must not be a
    // single degenerate bin
    assert(rep.length > 1)
  }

  test("calibration: hand-built corpus lands in the exact bins with exact gaps") {
    import spark.implicits._
    // doc A: 4 en-marker tokens, nothing else → conf = 5/8, bin 6
    // doc B: no markers → conf = 1/4, bin 10 div 4 = 2 (never 'und'-
    // binned away)
    val docs = Seq(
      (1L, "the of and is", "en"),
      (2L, "zzz yyy xxx", "fr"))
      .toDF("doc_id", "text", "lang")
    val rep = operators.TextAnalysis.calibrationReportOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rep.keySet == Set(2L, 6L), s"got ${rep.keySet}")
    assert(rep(6L) == ((1L, 0.625, 1.0)), "en doc: conf 5/8, accurate")
    assert(rep(2L) == ((1L, 0.25, 0.0)), "fr doc: conf 1/4, inaccurate")
  }

  test("cusum scan: result invariant to input partitioning") {
    val events = Tables.t(spark, sfDir, "events")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.cusumScanOf(df)
        .collect().map(p => (p.user_id, p.event_id) ->
          (p.sp_raw, p.sn_raw, p.alarmed)).toMap
    val base = run(events)
    val shuffled = run(events.repartition(32, col("event_id")))
    val single = run(events.coalesce(1))
    assert(base == shuffled && base == single,
      "per-key scan must not depend on the incoming layout")
  }
}
