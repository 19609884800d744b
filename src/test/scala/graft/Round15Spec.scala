package graft

import org.apache.spark.sql.functions._

/** Round-15 goldens: cross-variable DEFINE navigation (parse, machine
  * semantics, rejections for the undecidable forms), the finished
  * quantifier family ({m} / {,n} desugars), MEASURES expression
  * breadth (AVG + arithmetic on both output paths), exact substring
  * dedup (the shifted-quote class span tiling misses), and the
  * measured multi-pattern channel (single-machine equivalence +
  * kill/restart recovery).
  */
class Round15Spec extends SparkSpecBase {

  import graft.operators.{Cep, MatchRecognize => MR}

  private val M = 60000000L // one minute in micros

  private def withRocks[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def funnelWith(defineTail: String): String =
    s"""MATCH_RECOGNIZE (
       |  PARTITION BY user_id
       |  ORDER BY ts, event_id
       |  ONE ROW PER MATCH
       |  AFTER MATCH SKIP PAST LAST ROW
       |  PATTERN (C V+ P)
       |  WITHIN INTERVAL '7' DAY
       |  DEFINE C AS C.event_type = 'click',
       |         V AS V.event_type = 'view',
       |         P AS P.event_type = 'purchase'$defineTail
       |)""".stripMargin

  // ---- quantifier family: {m} and {,n} desugar at parse ----

  test("{m} desugars to {m,m}, {,n} to {0,n}, {m,} stays open-ended") {
    def quant(q: String): Option[(Int, Int)] =
      MR.parse(s"""MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts, event_id
        | ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        | PATTERN (C V$q P) WITHIN INTERVAL '7' DAY
        | DEFINE C AS C.event_type = 'click',
        |        V AS V.event_type = 'view',
        |        P AS P.event_type = 'purchase')""".stripMargin)
        .pattern(1).rep
    assert(quant("{2}") == Some((2, 2)))
    assert(quant("{,3}") == Some((0, 3)))
    assert(quant("{2,}") == Some((2, Int.MaxValue)))
    assert(quant("{2,3}") == Some((2, 3)))
    // the respelled forms are STRUCTURALLY the canonical ones — the
    // whole parse (machine included) is equal, so every gate proof
    // for {m,m}/{0,n} covers {m}/{,n}
    val viaExact = MR.parse(funnelWith("").replace("V+", "V{2}"))
    val viaPair = MR.parse(funnelWith("").replace("V+", "V{2,2}"))
    assert(viaExact == viaPair)
    val viaOpen = MR.parse(funnelWith("").replace("V+", "V{,3}"))
    val viaZero = MR.parse(funnelWith("").replace("V+", "V{0,3}"))
    assert(viaOpen == viaZero)
    val e = intercept[IllegalArgumentException] {
      MR.parse(funnelWith("").replace("V+", "V{x}"))
    }
    assert(e.getMessage.contains("integer bounds"))
  }

  // ---- cross-variable DEFINE: parse ----

  test("cross-variable DEFINE parses FIRST/LAST and the bare form") {
    val p = MR.parse(MR.FunnelCrossSql)
    assert(p.pattern(0).cross.isEmpty && p.pattern(1).cross.isEmpty)
    assert(p.pattern(2).cross ==
      List(Cep.CrossRef(1, first = true, Cep.PrevGt),
        Cep.CrossRef(0, first = false, Cep.PrevGe)))
    // bare B.value == explicit LAST(B.value) — structurally identical
    val bare = MR.parse(funnelWith(" AND P.value >= C.value"))
    val expl = MR.parse(funnelWith(" AND P.value >= LAST(C.value)"))
    assert(bare == expl)
  }

  test("cross-variable DEFINE rejections name the undecidable forms") {
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](MR.parse(sql))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    // forward reference: C navigates P, which has not matched yet
    bad(
      """MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts, event_id
        | ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        | PATTERN (C V+ P) WITHIN INTERVAL '7' DAY
        | DEFINE C AS C.event_type = 'click' AND C.value < P.value,
        |        V AS V.event_type = 'view',
        |        P AS P.event_type = 'purchase')""".stripMargin,
      "not yet matched")
    // self-navigation
    bad(funnelWith(" AND P.value > FIRST(P.value)"), "self-navigation")
    bad(funnelWith(" AND P.value > P.value"), "compared against itself")
    // SUBSET targets
    bad(
      """MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts, event_id
        | ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        | PATTERN (C V+ P) WITHIN INTERVAL '7' DAY
        | SUBSET U = (C, V)
        | DEFINE C AS C.event_type = 'click',
        |        V AS V.event_type = 'view',
        |        P AS P.event_type = 'purchase' AND P.value > FIRST(U.value)
        |)""".stripMargin,
      "union variables")
    // repeated referenced variable — both occurrences EARLIER, so the
    // ordering rule passes and the ambiguity rejection fires
    bad(
      """MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts, event_id
        | ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        | PATTERN (V C V P) WITHIN INTERVAL '1' DAY
        | DEFINE V AS V.event_type = 'view',
        |        C AS C.event_type = 'click',
        |        P AS P.event_type = 'purchase' AND P.value > FIRST(V.value)
        |)""".stripMargin,
      "ambiguous")
    // a later occurrence of the referenced variable → the ordering rule
    bad(
      """MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts, event_id
        | ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        | PATTERN (V C V) WITHIN INTERVAL '1' DAY
        | DEFINE V AS V.event_type = 'view',
        |        C AS C.event_type = 'click' AND C.value > FIRST(V.value)
        |)""".stripMargin,
      "not yet matched")
    // grouped pattern: REJECTED when this spec was written; r17
    // implemented grouped cross-variable DEFINE (eagerly-recorded
    // per-leaf pools), so the same clause now PARSES into a grouped
    // machine whose P leaf carries the resolved cross ref — Round17Spec
    // owns the semantics pins, this asserts the old rejection is gone
    val gp = MR.parse(
      """MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts, event_id
        | ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        | PATTERN (C (V W)+ P) WITHIN INTERVAL '7' DAY
        | DEFINE C AS C.event_type = 'click',
        |        V AS V.event_type = 'view',
        |        W AS W.event_type = 'error',
        |        P AS P.event_type = 'purchase' AND P.value > FIRST(C.value)
        |)""".stripMargin)
    assert(gp.grouped.nonEmpty)
    assert(gp.pattern(3).cross ==
      List(Cep.CrossRef(0, first = true, Cep.PrevGt)), s"${gp.pattern}")
    // machine-level twins: relaxed contiguity and the timeout scope.
    // r16: cross refs are ACCEPTED in relaxed mode (Round16Spec's
    // goldens); the relaxed rejection class that remains is the
    // running-aggregate DEFINE (not prefix-decidable under skips)
    val crossPat = Seq(Cep.Step("click"), Cep.Step("view", plus = true),
      Cep.Step("purchase",
        cross = List(Cep.CrossRef(1, first = true, Cep.PrevGt))))
    val e1 = intercept[IllegalArgumentException] {
      Cep.cepFollowedByOf(null, Seq(Cep.Step("click"),
        Cep.Step("purchase", plus = true, sumCap = Some(100L))), M)
    }
    assert(e1.getMessage.contains("contiguous-mode"))
    val e2 = intercept[IllegalArgumentException] {
      import spark.implicits._
      graft.streaming.StreamingOps.cepStream(
        spark.emptyDataset[(Long, Long, Long, String)], crossPat, M)
    }
    assert(e2.getMessage.contains("cepStreamValued"))
    // forward / self reference at the machine boundary
    val e3 = intercept[IllegalArgumentException] {
      Cep.cepMatchOf(null, Seq(Cep.Step("click",
        cross = List(Cep.CrossRef(0, first = true, Cep.PrevGt))),
        Cep.Step("purchase")), M)
    }
    assert(e3.getMessage.contains("EARLIER step"))
  }

  // ---- cross-variable DEFINE: machine semantics ----

  private def feedAll(m: Cep.Machine,
      rows: Seq[(Long, Long, String, Long)]): List[(Long, Long)] =
    (rows.flatMap { case (ts, id, tpe, vc) => m.feedM(ts, id, tpe, vc) }
      ++ m.flush()).map(p => (p._1.start_event_id, p._1.end_event_id))
      .toList

  test("FIRST vs LAST navigation read the referenced run's two ends") {
    // c(0) v(50) v(10) p(30): FIRST(V)=50 → 30 > 50 fails;
    // LAST(V)=10 → 30 > 10 matches. The two readings provably differ.
    val rows = Seq((0L, 1L, "c", 0L), (1L, 2L, "v", 50L),
      (2L, 3L, "v", 10L), (3L, 4L, "p", 30L))
    def pat(first: Boolean) = IndexedSeq(Cep.Step("c"),
      Cep.Step("v", plus = true),
      Cep.Step("p", cross = List(Cep.CrossRef(1, first, Cep.PrevGt))))
    assert(feedAll(new Cep.Machine(pat(first = true), M), rows) == Nil)
    assert(feedAll(new Cep.Machine(pat(first = false), M), rows) ==
      List((1L, 4L)))
  }

  test("a referenced optional that took zero rows is NULL — no match") {
    // pattern c e? p, p.value > LAST(e.value): without an error row the
    // navigation is NULL (row never matches); with one it compares
    val pat = IndexedSeq(Cep.Step("c"), Cep.Step("e", opt = true),
      Cep.Step("p", cross = List(Cep.CrossRef(1, first = false,
        Cep.PrevGt))))
    val without = Seq((0L, 1L, "c", 0L), (1L, 2L, "p", 99L))
    assert(feedAll(new Cep.Machine(pat, M), without) == Nil)
    val withE = Seq((0L, 1L, "c", 0L), (1L, 2L, "e", 10L),
      (2L, 3L, "p", 99L))
    assert(feedAll(new Cep.Machine(pat, M), withE) == List((1L, 3L)))
  }

  test("cross predicate sees the PATH's take, not the greedy maximum") {
    // a a b, B.value > LAST(A.value), pattern a+ b. Greedy a+ takes
    // both a rows → LAST = 40 → b(30) fails; backing off to one a row
    // would leave an 'a' at b's position (symbol mismatch) — so no
    // match, NOT a sneaky shorter-take acceptance. With b = 50 the
    // greedy take matches outright.
    val pat = IndexedSeq(Cep.Step("a", plus = true),
      Cep.Step("b", cross = List(Cep.CrossRef(0, first = false,
        Cep.PrevGt))))
    val rows = Seq((0L, 1L, "a", 10L), (1L, 2L, "a", 40L),
      (2L, 3L, "b", 30L))
    assert(feedAll(new Cep.Machine(pat, M), rows) == Nil)
    val rows2 = Seq((0L, 1L, "a", 10L), (1L, 2L, "a", 40L),
      (2L, 3L, "b", 50L))
    assert(feedAll(new Cep.Machine(pat, M), rows2) == List((1L, 3L)))
  }

  test("cep_cross_define binds at sf0.001: the value conditions kill " +
      "funnels the plain gate keeps") {
    val plain = graft.operators.Cep.cepFunnel(spark, sfDir).count()
    val crossed = MR.cepCrossDefine(spark, sfDir).count()
    assert(plain == 8L && crossed == 2L,
      s"plain $plain (want 8), crossed $crossed (want 2)")
  }

  // ---- MEASURES breadth ----

  test("MEASURES expressions parse; malformed shapes reject by name") {
    val p = MR.parse(MR.FunnelMeasuresExtSql)
    val ms = MR.parseMeasures(p.rawMeasures)
    assert(ms.map(_.alias) == Seq("v_avg_c", "vc_diff_c", "vc_cnt",
      "v_ratio_c", "v_scaled_c", "v_dollars", "vc_per_row", "v_cnt2"))
    assert(ms(0).expr == MR.MAgg("AVG", "V"))
    assert(ms(1).expr ==
      MR.MBin('-', MR.MAgg("SUM", "V"), MR.MAgg("SUM", "C")))
    assert(ms(2).expr ==
      MR.MBin('+', MR.MAgg("COUNT", "V"), MR.MAgg("COUNT", "C")))
    assert(ms(3).expr ==
      MR.MBin('/', MR.MAgg("SUM", "V"), MR.MAgg("COUNT", "V")))
    assert(ms(4).expr ==
      MR.MBin('*', MR.MAgg("MAX", "V"), MR.MAgg("COUNT", "V")))
    // r16: numeric literals and parentheses
    assert(ms(5).expr ==
      MR.MBin('/', MR.MAgg("SUM", "V"), MR.MLit("100")))
    assert(ms(6).expr == MR.MBin('/',
      MR.MBin('+', MR.MAgg("SUM", "V"), MR.MAgg("SUM", "C")),
      MR.MBin('+', MR.MAgg("COUNT", "V"), MR.MAgg("COUNT", "C"))))
    assert(ms(7).expr == MR.MBin('+',
      MR.MBin('*', MR.MAgg("COUNT", "V"), MR.MLit("2")), MR.MLit("1")))
    // precedence: * binds tighter than −, levels left-associate
    val prec = MR.parseMeasures(MR.parse(MR.FunnelMeasuresExtSql.replace(
      """AVG(V.value) AS v_avg_c,
        |           SUM(V.value) - SUM(C.value) AS vc_diff_c,
        |           COUNT(V.*) + COUNT(C.*) AS vc_cnt,
        |           SUM(V.value) / COUNT(V.*) AS v_ratio_c,
        |           MAX(V.value) * COUNT(V.*) AS v_scaled_c""".stripMargin,
      "SUM(V.value) - SUM(C.value) * COUNT(C.*) + COUNT(V.*) AS x"))
      .rawMeasures)
    assert(prec.head.expr == MR.MBin('+',
      MR.MBin('-', MR.MAgg("SUM", "V"),
        MR.MBin('*', MR.MAgg("SUM", "C"), MR.MAgg("COUNT", "C"))),
      MR.MAgg("COUNT", "V")), s"got ${prec.head.expr}")
    def badM(measures: String, frag: String): Unit = {
      val sql = MR.FunnelMeasuresExtSql.replace(
        """AVG(V.value) AS v_avg_c,
          |           SUM(V.value) - SUM(C.value) AS vc_diff_c,
          |           COUNT(V.*) + COUNT(C.*) AS vc_cnt""".stripMargin,
        measures)
      val e = intercept[IllegalArgumentException](
        MR.parseMeasures(MR.parse(sql).rawMeasures))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    badM("FIRST(C.event_id) + COUNT(V.*) AS x", "navigations stand alone")
    badM("MATCH_NUMBER() + COUNT(V.*) AS x", "stand alone")
    badM("RUNNING MATCH_NUMBER() AS x", "drop the marker")
    // (message updated r17: AVG now ranges over any input column,
    // but never the field-less * form)
    badM("AVG(V.*) AS x", "AVG needs a field")
  }

  test("rows-path AVG and arithmetic equal hand-computed windows") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val events = Seq(
      (1L, ts(0), 10L, "click", 1.00),
      (1L, ts(1), 11L, "view", 2.00),
      (1L, ts(2), 12L, "view", 4.00),
      (1L, ts(3), 13L, "purchase", 1.00))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = MR.matchRecognizeRowsOf(events,
      """MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts, event_id
        | MEASURES AVG(V.value) AS v_avg_c,
        |          SUM(V.value) - SUM(C.value) AS d_c,
        |          FINAL AVG(V.value) AS v_avg_fin_c
        | ALL ROWS PER MATCH AFTER MATCH SKIP PAST LAST ROW
        | PATTERN (C V+ P) WITHIN INTERVAL '1' DAY
        | DEFINE C AS C.event_type = 'click',
        |        V AS V.event_type = 'view',
        |        P AS P.event_type = 'purchase')""".stripMargin)
      .orderBy(col("ts_us"))
      .select(col("event_id"), col("v_avg_c"), col("d_c"),
        col("v_avg_fin_c"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        r.getDouble(3)))
      .toList
    // RUNNING: the C row sees zero views — AVG is null and the
    // difference NULL − 100 is null (SQL null propagation, same in
    // the DuckDB reading); V1 avg 200 diff 100, V2 avg 300 diff 500;
    // FINAL avg = 300 on every row
    assert(out == List(
      (10L, null, null, 300.0),
      (11L, 200.0, 100L, 300.0),
      (12L, 300.0, 500L, 300.0),
      (13L, 300.0, 500L, 300.0)), s"got $out")
  }

  // ---- exact substring dedup ----

  test("substring dedup catches a shifted quote that span tiling misses") {
    import spark.implicits._
    val quote = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon $quote tail one"),
      // the quote sits at a +3 offset — not a multiple of the 10-token
      // tile, so no 10-token tile aligns between the two docs
      (2L, s"one two three $quote other trailing words here"))
      .toDF("doc_id", "text")
    val spans = graft.operators.TextAnalysis.spanDedupOf(docs, 10)
      .agg(sum(col("n_dup"))).collect()(0).getLong(0)
    assert(spans == 0L, s"span tiling should miss the shifted quote")
    val runs = graft.operators.TextAnalysis
      .substringDedupOf(docs, 5, 15)
      .collect()
    assert(runs.length == 1)
    val r = runs(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("a_start") == 5L &&
      r.getAs[Long]("b_start") == 3L && r.getAs[Long]("run_len") == 20L)
  }

  test("two shared runs on different diagonals surface independently " +
      "with exact extents") {
    import spark.implicits._
    val runA = (1 to 16).map(i => s"a$i").mkString(" ")
    val runB = (1 to 15).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$runA filler0 filler1 filler2 $runB"),
      (2L, s"x y $runB z w q r s t u v $runA"))
      .toDF("doc_id", "text")
    val runs = graft.operators.TextAnalysis
      .substringDedupOf(docs, 5, 15)
      .orderBy(col("a_start"))
      .collect()
      .map(r => (r.getAs[Long]("a_start"), r.getAs[Long]("b_start"),
        r.getAs[Long]("run_len"))).toList
    // doc1: runA at 0..15, runB at 19..33; doc2: x y (0-1), runB at
    // 2..16, 8 fillers (17-24), runA at 25..40
    assert(runs == List((0L, 25L, 16L), (19L, 2L, 15L)), s"got $runs")
  }

  test("substring novelty counts corpus-vs-incoming runs ONLY — " +
      "incoming docs sharing text with each other stay novel") {
    import spark.implicits._
    val quoteA = (1 to 18).map(i => s"qa$i").mkString(" ")
    val quoteB = (1 to 16).map(i => s"qb$i").mkString(" ")
    val corpus = Seq((1L, s"corpus preamble $quoteA corpus tail"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, s"lead in $quoteA trailing words"),   // contaminated
      (11L, s"fresh $quoteB first copy here"),    // shares with 12 only
      (12L, s"other $quoteB second copy text"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .substringNoveltyOf(corpus, incoming, 5, 15)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List((10L, 22L, 18L), (11L, 20L, 0L),
      (12L, 20L, 0L)), s"got $out")
  }

  test("the df cap does not bind at gate scale (oracle stays cap-free)") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val toksBound = docs.select(
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val maxOcc = toksBound
      .select(explode(when(size(col("toks")) >= 5,
        transform(sequence(lit(0), size(col("toks")) - 5),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(5)))))
        .otherwise(array())).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxOcc <= 100L,
      s"max shingle posting $maxOcc approaches the 5000 cap — " +
        "re-examine the cap-free-oracle claim")
  }

  // ---- the measured multi-pattern channel ----

  test("measured multi channel ≡ the single-machine measures stream; " +
      "match channel byte-identical with the flag on") { withRocks {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pattern = Seq(Cep.Step("click"), Cep.Step("view", plus = true),
      Cep.Step("purchase"))
    val rows = Seq(
      (1L, 0L, 1L, "click", 100L), (1L, M, 2L, "view", 250L),
      (1L, 2 * M, 3L, "view", 50L), (1L, 3 * M, 4L, "purchase", 400L),
      (2L, 0L, 5L, "click", 10L), (2L, M, 6L, "view", 20L),
      (2L, 2 * M, 7L, "error", 0L),
      (9L, 60 * M, 99L, "flush", 0L))
    def run[T <: Product : org.apache.spark.sql.Encoder](name: String)(
        build: org.apache.spark.sql.Dataset[
          (Long, Long, Long, String, Long)] => org.apache.spark.sql
          .Dataset[T]): List[T] = {
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      val q = build(src.toDS()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      src.addData(rows.take(4)); q.processAllAvailable()
      src.addData(rows.drop(4)); q.processAllAvailable()
      q.stop()
      spark.table(name).as[T].collect().toList
    }
    val single = run("r15mm_single")(ds =>
      graft.streaming.StreamingOps.cepStreamMeasures(ds, pattern, 10 * M))
      .filter(_.user_id != 9L).sortBy(m => (m.user_id, m.step))
    val multi = run("r15mm_multi")(ds =>
      graft.streaming.StreamingOps.cepStreamMultiMeasured(ds,
        Seq(graft.streaming.StreamingOps.CepSpec(pattern.toIndexedSeq,
          10 * M, measured = true))))
    val measuredRows = multi.filter(_._1 ==
      graft.streaming.StreamingOps.CepMeasuredTag)
      .map(_._2).filter(_.user_id != 9L).sortBy(m => (m.user_id, m.step))
    assert(measuredRows == single,
      s"measured channel $measuredRows != single $single")
    val matchRows = multi.filter(_._1 == 0).map(_._2)
      .filter(_.user_id != 9L)
    assert(matchRows.forall(m => m.step == -1 && m.cnt == 0L))
    assert(matchRows.map(m => (m.user_id, m.start_event_id,
      m.end_event_id, m.n_rows)) == List((1L, 1L, 4L, 4L)))
  } }

  test("measured multi recovery: per-step rows for a match spanning " +
      "the kill+restart seam come out of the recovered snapshot") { withRocks {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val specs = Seq(graft.streaming.StreamingOps.CepSpec(
      IndexedSeq(Cep.Step("click"), Cep.Step("view", plus = true),
        Cep.Step("purchase")), 10 * M, measured = true))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-r15-mm-ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-r15-mm-out").toString
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String, Long)]
    def start() = graft.streaming.StreamingOps
      .cepStreamMultiMeasured(src.toDS(), specs).toDF()
      .select(col("_1").as("pat"), col("_2.*"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir); ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()
    // run 1: click + first view drain (flush row advances the
    // watermark past them), then KILL — the partial lives in m2_0
    val q1 = start()
    src.addData((1L, 0L, 1L, "click", 100L), (1L, M, 2L, "view", 250L))
    q1.processAllAvailable()
    src.addData((8L, 3 * M, 50L, "x", 0L))
    q1.processAllAvailable()
    q1.stop()
    // run 2: second view + purchase complete the match from the
    // RECOVERED buffer/machine state
    val q2 = start()
    src.addData((1L, 4 * M, 3L, "view", 50L),
      (1L, 5 * M, 4L, "purchase", 400L))
    q2.processAllAvailable()
    src.addData((8L, 30 * M, 51L, "x", 0L))
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir)
      .filter(col("user_id") === 1L)
    val measured = out.filter(col("pat") ===
        graft.streaming.StreamingOps.CepMeasuredTag)
      .orderBy(col("step"))
      .select(col("step"), col("cnt"), col("sum_value_c"),
        col("first_event_id"), col("last_event_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(measured == List((0, 1L, 100L, 1L, 1L),
      (1, 2L, 300L, 2L, 3L), (2, 1L, 400L, 4L, 4L)),
      s"recovered measured rows: $measured")
    assert(out.filter(col("pat") === 0).count() == 1L)
  } }
}
