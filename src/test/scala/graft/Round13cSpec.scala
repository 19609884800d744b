package graft

import org.apache.spark.sql.functions._

/** Round-13 part 3: GROUP QUANTIFIERS — PATTERN ((A B)+ C), the
  * quantified-sub-sequence class the flat step model cannot express,
  * batch + SQL surface goldens and the validation boundary.
  */
class Round13cSpec extends SparkSpecBase {
  import graft.operators.{Cep, MatchRecognize => MR}
  import Cep.{GLf, GCat, GRep, Step}

  private def abPlusC: Cep.GPat = GCat(Seq(
    GRep(GCat(Seq(GLf(Step("a")), GLf(Step("b")))), 1, Int.MaxValue),
    GLf(Step("c"))))

  test("group quantifiers: greedy multi-iteration, leftmost start") {
    import spark.implicits._
    // a b a b c → one match consuming BOTH iterations (greedy), start
    // at the FIRST a; then a b c — a second disjoint match
    val rows = Seq("a", "b", "a", "b", "c", "a", "b", "c").zipWithIndex
      .map { case (t, i) => (1L, (i + 1) * 1000000L, (i + 1).toLong, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Cep.cepMatchGroupedOf(rows, abPlusC, windowUs = 100000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq.sorted
    assert(got == Seq((1L, 5L, 5L), (6L, 8L, 3L)), s"$got")
  }

  test("group quantifiers: window kill falls back along the chain") {
    import spark.implicits._
    // a1 b2 a3 b4 c5 with a 2.5s window: the leftmost start a1 spans
    // 4s to c5 → killed; the machine falls back to the next first-set
    // row (a3) whose single iteration fits → (3, 5)
    val rows = Seq(
      (1L, 1000000L, 1L, "a"), (1L, 2000000L, 2L, "b"),
      (1L, 3000000L, 3L, "a"), (1L, 4000000L, 4L, "b"),
      (1L, 5000000L, 5L, "c"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Cep.cepMatchGroupedOf(rows, abPlusC, windowUs = 2500000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(got == Seq((3L, 5L, 3L)), s"$got")
  }

  test("group quantifiers: nested leaf quantifier inside a repeated " +
      "group — (a b+)+ c") {
    import spark.implicits._
    // a b b a b c: the group iterates twice, the first iteration's b+
    // takes two rows — nested greed under group greed
    val rows = Seq("a", "b", "b", "a", "b", "c").zipWithIndex
      .map { case (t, i) => (1L, (i + 1) * 1000000L, (i + 1).toLong, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val g = GCat(Seq(
      GRep(GCat(Seq(GLf(Step("a")), GLf(Step("b", plus = true)))),
        1, Int.MaxValue),
      GLf(Step("c"))))
    val got = Cep.cepMatchGroupedOf(rows, g, windowUs = 100000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(got == Seq((1L, 6L, 6L)), s"$got")
  }

  test("group quantifiers: reluctant group takes the fewest iterations") {
    import spark.implicits._
    // a b a b c with (a b)+? c: the lazy group tries ONE iteration
    // first — but c only follows the second, so it backs INTO two (the
    // shortest take that completes); with trailing (a b)+? a-b-a-b and
    // no c, lazy commits at one iteration per match → two matches
    val rows = Seq("a", "b", "a", "b").zipWithIndex
      .map { case (t, i) => (1L, (i + 1) * 1000000L, (i + 1).toLong, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val lazyG = GCat(Seq(
      GRep(GCat(Seq(GLf(Step("a")), GLf(Step("b")))), 1, Int.MaxValue,
        reluctant = true)))
    val got = Cep.cepMatchGroupedOf(rows, lazyG, windowUs = 100000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id)).toSeq.sorted
    assert(got == Seq((1L, 2L), (3L, 4L)), s"$got")
    // the greedy twin pends mid-stream but the batch flush resolves it
    // to ONE whole-run match
    val greedyG = GCat(Seq(
      GRep(GCat(Seq(GLf(Step("a")), GLf(Step("b")))), 1, Int.MaxValue)))
    val got2 = Cep.cepMatchGroupedOf(rows, greedyG, windowUs = 100000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id)).toSeq
    assert(got2 == Seq((1L, 4L)), s"$got2")
  }

  test("match_recognize: grouped PATTERN parses and runs — " +
      "((A B)+ C) ≡ the programmatic tree") {
    import spark.implicits._
    val rows = Seq("a", "b", "a", "b", "c").zipWithIndex
      .map { case (t, i) => (1L, (i + 1) * 1000000L, (i + 1).toLong, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val sql =
      """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts, event_id
        | AFTER MATCH SKIP PAST LAST ROW
        | PATTERN ((A B)+ C) WITHIN INTERVAL '1' HOUR
        | DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
        |        C AS C.event_type = 'c')""".stripMargin
    val viaSql = MR.matchRecognizeOf(rows, sql)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    val viaApi = Cep.cepMatchGroupedOf(rows, abPlusC, 3600000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(viaSql == viaApi && viaSql == Seq((1L, 5L, 5L)),
      s"$viaSql vs $viaApi")
    // parse structure
    val p = MR.parse(sql)
    assert(p.grouped.contains(abPlusC), s"${p.grouped}")
  }

  test("sequence alternation: leftmost-arm bias, alternation under " +
      "repetition, and the SQL '|' surface") {
    import spark.implicits._
    // c v v c p: iteration 1 matches arm (c v), iteration 2 arm (v c)
    // — mixed arms inside ONE repeated group
    val rows = Seq("c", "v", "v", "c", "p").zipWithIndex
      .map { case (t, i) => (1L, (i + 1) * 1000000L, (i + 1).toLong, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val g = GCat(Seq(
      GRep(Cep.GAlt(Seq(
        GCat(Seq(GLf(Step("c")), GLf(Step("v")))),
        GCat(Seq(GLf(Step("v")), GLf(Step("c")))))), 1, Int.MaxValue),
      GLf(Step("p"))))
    val got = Cep.cepMatchGroupedOf(rows, g, windowUs = 100000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(got == Seq((1L, 5L, 5L)), s"$got")
    // leftmost-arm bias is observable through consumption: with arms
    // (a | a b) over rows a b c, the leftmost single-a arm wins and b
    // is left for the next leaf
    val g2 = GCat(Seq(
      Cep.GAlt(Seq(GCat(Seq(GLf(Step("a")))),
        GCat(Seq(GLf(Step("a")), GLf(Step("b")))))),
      GLf(Step("b"))))
    val rows2 = Seq("a", "b").zipWithIndex
      .map { case (t, i) => (1L, (i + 1) * 1000000L, (i + 1).toLong, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got2 = Cep.cepMatchGroupedOf(rows2, g2, windowUs = 100000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id)).toSeq
    assert(got2 == Seq((1L, 2L)), s"$got2")
    // SQL surface: '|' inside a group parses to GAlt
    val sql =
      """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts, event_id
        | PATTERN ((C V | V C)+ P) WITHIN INTERVAL '1' HOUR
        | DEFINE C AS C.event_type = 'c', V AS V.event_type = 'v',
        |        P AS P.event_type = 'p')""".stripMargin
    val viaSql = MR.matchRecognizeOf(rows, sql)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(viaSql == got, s"$viaSql vs $got")
    assert(MR.parse(sql).grouped.contains(g), s"${MR.parse(sql).grouped}")
  }

  test("group quantifiers: validation boundary") {
    import graft.operators.Cep
    // nullable star body — loops forever, rejected
    intercept[IllegalArgumentException](Cep.validateGrouped(
      GCat(Seq(GRep(GCat(Seq(GLf(Step("a", opt = true)))),
        0, Int.MaxValue)))))
    // all-optional pattern — empty match, rejected
    intercept[IllegalArgumentException](Cep.validateGrouped(
      GCat(Seq(GRep(GCat(Seq(GLf(Step("a")))), 0, 1)))))
    // PREV on a first-set leaf — rejected (same rule as flat step 0)
    intercept[IllegalArgumentException](Cep.validateGrouped(
      GCat(Seq(GLf(Step("a", cmp = Some(Cep.PrevLt))), GLf(Step("b"))))))
    // negation leaves are the linear machine's
    intercept[IllegalArgumentException](Cep.validateGrouped(
      GCat(Seq(GLf(Step("a")), GLf(Step("b", neg = true))))))
    // oversized bounded unroll
    intercept[IllegalArgumentException](Cep.validateGrouped(
      GCat(Seq(GRep(GCat(Seq(GLf(Step("a")))), 0, 100)))))
    // AFTER MATCH FIRST/LAST with a grouped machine — rejected
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Step("a"), Step("b")), 100L, Cep.SkipToFirst(1),
      contiguous = true, grouped = Some(abPlusC)))
    // the SQL surface rejects MEASURES over grouped patterns
    intercept[IllegalArgumentException](MR.matchRecognizeMeasuresOf(null,
      """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
        | MEASURES COUNT(A.*) AS n PATTERN ((A B)+)
        | DEFINE A AS A.event_type = 'a',
        | B AS B.event_type = 'b')""".stripMargin))
  }
}
