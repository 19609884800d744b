package graft

import org.apache.spark.sql.functions._

/** Round-13 part 2: the MATCH_RECOGNIZE SQL-string surface — parse
  * structure, runner equivalence, and the rejection set mirroring the
  * machine's own requires.
  */
class Round13bSpec extends SparkSpecBase {
  import graft.operators.{Cep, MatchRecognize => MR}

  test("match_recognize: the V-pattern SQL parses to the programmatic " +
      "form exactly") {
    val p = MR.parse(MR.VshapeSql)
    assert(p.partitionCol == "user_id")
    assert(p.orderCols == Seq("ts", "event_id"))
    assert(p.after == Cep.SkipPastLast)
    assert(p.windowUs == 7L * 24 * 3600 * 1000000)
    assert(p.pattern == Seq(
      Cep.Step("*", any = true),
      Cep.Step("*", plus = true, any = true, cmp = Some(Cep.PrevLt)),
      Cep.Step("*", plus = true, any = true, cmp = Some(Cep.PrevGt))),
      s"${p.pattern}")
  }

  test("match_recognize: quantifiers, alternation, IN sets, bounded " +
      "repeats, reluctant, PREV offsets, SUM caps, skip-to variables") {
    val p = MR.parse(
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  AFTER MATCH SKIP TO FIRST V
        |  PATTERN (C V{2,3} W+? X? S*)
        |  WITHIN INTERVAL '30' MINUTE
        |  DEFINE C AS C.event_type = 'click',
        |         V AS V.event_type IN ('view', 'error'),
        |         W AS W.event_type = 'view'
        |                AND W.value > PREV(W.value, 2),
        |         S AS S.event_type = 'purchase'
        |                AND SUM(S.value) <= 150.00
        |)""".stripMargin)
    assert(p.after == Cep.SkipToFirst(1))
    assert(p.windowUs == 30L * 60000000)
    assert(p.pattern == Seq(
      Cep.Step("click"),
      Cep.Step("view", alt = Set("error"), rep = Some((2, 3))),
      Cep.Step("view", plus = true, reluctant = true,
        cmp = Some(Cep.PrevGt), cmpOff = 2),
      // X has no DEFINE entry → the undefined (always-true) variable
      Cep.Step("*", opt = true, any = true),
      Cep.Step("purchase", plus = true, opt = true,
        sumCap = Some(15000L))), s"${p.pattern}")
  }

  test("match_recognize: runner == programmatic cepMatchOf on a live " +
      "frame") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 1.0), (1L, 4L, 4.0),
      (1L, 5L, 6.0), (1L, 6L, 2.0), (1L, 7L, 9.0), (1L, 8L, 9.0))
      .map { case (u, id, v) => (u, id * 1000000L, id, "view", v) }
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val viaSql = MR.matchRecognizeOf(rows, MR.VshapeSql)
      .collect().map(m => (m.start_event_id, m.end_event_id)).toSeq.sorted
    val viaApi = Cep.cepMatchOf(rows,
      Seq(Cep.Step("*", any = true),
        Cep.Step("*", plus = true, any = true, cmp = Some(Cep.PrevLt)),
        Cep.Step("*", plus = true, any = true, cmp = Some(Cep.PrevGt))),
      windowUs = 7L * 24 * 3600 * 1000000)
      .collect().map(m => (m.start_event_id, m.end_event_id)).toSeq.sorted
    assert(viaSql == viaApi && viaSql.nonEmpty, s"$viaSql vs $viaApi")
  }

  test("match_recognize MEASURES: pivot runner == cepMeasuresOf columns") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, "click", 0.10), (1L, 2L, "view", 0.30),
      (1L, 3L, "view", 0.50), (1L, 4L, "purchase", 9.99),
      (1L, 5L, "click", 0.20), (1L, 6L, "purchase", 1.00))
      .map { case (u, id, t, v) => (u, id * 1000000L, id, t, v) }
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = MR.matchRecognizeMeasuresOf(rows, MR.FunnelMeasuresSql)
      .select("click_id", "views_cnt", "views_sum_c", "views_max_c",
        "purchase_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    // one funnel: click1, views 2+3 (30c + 50c), purchase4; the second
    // click has no view before its purchase → no match
    assert(got == Seq((1L, 2L, 80L, 50L, 4L)), s"$got")
  }

  test("match_recognize MEASURES: strict-parse rejections") {
    def bad(sql: String): String =
      intercept[IllegalArgumentException](
        MR.matchRecognizeMeasuresOf(null, sql)).getMessage
    val base =
      """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
        | MEASURES %s
        | PATTERN (A B+) WITHIN INTERVAL '1' HOUR
        | DEFINE A AS A.event_type = 'click',
        | B AS B.event_type = 'view')""".stripMargin
    // unsupported aggregate
    assert(bad(base.format("MEDIAN(B.value) AS m"))
      .contains("unsupported MEASURES aggregate"))
    // field-less aggregate forms (r17 field breadth legalized
    // SUM(B.event_id) / FIRST(B.value) — Round17Spec owns the
    // positive pins; the *-forms remain parse rejections)
    assert(bad(base.format("SUM(B.*) AS s"))
      .contains("needs a field"))
    assert(bad(base.format("FIRST(B.*) AS f"))
      .contains("needs a field"))
    assert(bad(base.format("COUNT(B.value) AS c"))
      .contains("COUNT(B.*)"))
    // a measure over a variable PATTERN never uses
    assert(bad(base.format("COUNT(Z.*) AS z"))
      .contains("never uses"))
    // repeated pattern variable — ambiguous step
    assert(intercept[IllegalArgumentException](
      MR.matchRecognizeMeasuresOf(null,
        """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
          | MEASURES COUNT(A.*) AS n PATTERN (A B A)
          | DEFINE A AS A.event_type = 'view',
          | B AS B.event_type = 'click')""".stripMargin))
      .getMessage.contains("2 times"))
    // no MEASURES clause at all
    assert(intercept[IllegalArgumentException](
      MR.matchRecognizeMeasuresOf(null,
        """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
          | PATTERN (A) DEFINE A AS A.event_type = 'click')""".stripMargin))
      .getMessage.contains("MEASURES clause is empty"))
  }

  test("cep stream: the late-drop counter counts exactly the rows the " +
      "watermark contract rejects") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // transformWithState requires the RocksDB store (multi-column-
    // family support) — scope it to this test like the gate harness
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
    val counter = spark.sparkContext.longAccumulator("test.cep.late")
    val src = MemoryStream[(Long, Long, Long, String)]
    val q = graft.streaming.StreamingOps.cepStream(src.toDS(),
      Seq(Cep.Step("click"), Cep.Step("view", plus = true),
        Cep.Step("purchase")),
      windowUs = 600000000L, lateCounter = Some(counter))
      .writeStream.format("memory").queryName("ceplate")
      .outputMode("append").start()
    // batch 1: a funnel at 0-20s plus an advancer at 100s → the
    // watermark lands at 95s
    src.addData((1L, 0L, 1L, "click"), (1L, 10000000L, 2L, "view"),
      (1L, 20000000L, 3L, "purchase"), (1L, 100000000L, 4L, "signup"))
    q.processAllAvailable()
    // batch 2: two rows at/below the 95s watermark (DROPPED + counted),
    // one above it (admitted)
    src.addData((1L, 30000000L, 5L, "view"), (1L, 95000000L, 6L, "view"),
      (1L, 96000000L, 7L, "view"))
    q.processAllAvailable()
    q.stop()
    assert(counter.value == 2L, s"late counter: ${counter.value}")
    // the admitted funnel still completed (drops didn't break matching)
    val got = spark.table("ceplate").count()
    assert(got == 1L, s"matches: $got")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("match_recognize: rejections mirror the machine's requires") {
    def bad(sql: String): String =
      intercept[IllegalArgumentException](MR.parse(sql)).getMessage
    // optional first step — the machine's required-first rule
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | PATTERN (A? B) DEFINE A AS A.event_type = 'click',
      | B AS B.event_type = 'view')""".stripMargin)
      .contains("first step"))
    // PREV on the first step — outside the buffer
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | PATTERN (A B) DEFINE A AS A.value < PREV(A.value),
      | B AS B.event_type = 'view')""".stripMargin)
      .contains("PREV"))
    // SKIP TO a variable PATTERN never uses
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | AFTER MATCH SKIP TO FIRST Z PATTERN (A B)
      | DEFINE A AS A.event_type = 'click',
      | B AS B.event_type = 'view')""".stripMargin)
      .contains("never uses"))
    // SKIP TO step 0 — the looping strategy Flink rejects
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | AFTER MATCH SKIP TO FIRST A PATTERN (A B)
      | DEFINE A AS A.event_type = 'click',
      | B AS B.event_type = 'view')""".stripMargin)
      .contains("step 0"))
    // DEFINE for a variable PATTERN never uses
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | PATTERN (A) DEFINE A AS A.event_type = 'click',
      | Q AS Q.event_type = 'view')""".stripMargin)
      .contains("never uses"))
    // a DEFINE condition referencing another variable
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | PATTERN (A B) DEFINE B AS A.event_type = 'click')""".stripMargin)
      .contains("their own variable"))
    // unsupported interval unit
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | PATTERN (A) WITHIN INTERVAL '3' FORTNIGHT
      | DEFINE A AS A.event_type = 'click')""".stripMargin)
      .contains("INTERVAL unit"))
    // unsupported DEFINE field
    assert(bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      | PATTERN (A) DEFINE A AS A.props = 'x')""".stripMargin)
      .contains("DEFINE field"))
    // runner shape: wrong partition key
    import spark.implicits._
    val df = Seq((1L, 1000000L, 1L, "click", 0.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    assert(intercept[IllegalArgumentException](MR.matchRecognizeOf(df,
      """MATCH_RECOGNIZE (PARTITION BY other ORDER BY ts
        | PATTERN (A) DEFINE A AS A.event_type = 'click')""".stripMargin))
      .getMessage.contains("user_id"))
  }
}
