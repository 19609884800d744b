package graft

import org.apache.spark.sql.functions._

/** Round-14b goldens: SUBSET union variables, RUNNING/FINAL per-row
  * MEASURES over ALL ROWS PER MATCH, MATCH_NUMBER()/CLASSIFIER(), and
  * the parse rejections that keep the new surface SQL-shaped.
  */
class Round14bSpec extends SparkSpecBase {

  import graft.operators.MatchRecognize

  private val M = 60000000L // one minute in micros

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

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

  // two funnels for user 1 (the second a minimal click view purchase),
  // one for user 2 — MATCH_NUMBER restarts per partition
  private def funnelFrame() = {
    import spark.implicits._
    Seq(
      (1L, 0L, 1L, "click", 1.00), (1L, 1 * M, 2L, "view", 2.25),
      (1L, 2 * M, 3L, "view", 3.50), (1L, 3 * M, 4L, "purchase", 9.99),
      (1L, 10 * M, 5L, "click", 0.50), (1L, 11 * M, 6L, "view", 7.00),
      (1L, 12 * M, 7L, "purchase", 0.25),
      (2L, 0L, 8L, "click", 2.00), (2L, 1 * M, 9L, "view", 4.00),
      (2L, 2 * M, 10L, "purchase", 6.00))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
  }

  private val subsetHeader =
    """MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY ts, event_id
      |  MEASURES MATCH_NUMBER() AS mn, COUNT(U.*) AS u_cnt,
      |           SUM(U.value) AS u_sum_c, FIRST(U.event_id) AS u_first_id,
      |           LAST(U.event_id) AS u_last_id,
      |           FINAL MAX(V.value) AS views_max_c
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP PAST LAST ROW
      |  PATTERN (C V+ P)
      |  WITHIN INTERVAL '7' DAY
      |  SUBSET U = (V, P)
      |  DEFINE C AS C.event_type = 'click',
      |         V AS V.event_type = 'view',
      |         P AS P.event_type = 'purchase'
      |)""".stripMargin

  test("SUBSET on the ONE-ROW pivot: U = (V, P) pools members, " +
      "FIRST/LAST navigate in match order, MATCH_NUMBER per key") {
    val got = MatchRecognize
      .matchRecognizeMeasuresOf(funnelFrame(), subsetHeader)
      .orderBy("user_id", "start_ts_us")
      .select("user_id", "mn", "u_cnt", "u_sum_c", "u_first_id",
        "u_last_id", "views_max_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      // funnel 1: views 225+350, purchase 999 → u pools all three
      (1L, 1L, 3L, 225L + 350L + 999L, 2L, 4L, 350L),
      (1L, 2L, 2L, 700L + 25L, 6L, 7L, 700L),
      (2L, 1L, 2L, 400L + 600L, 9L, 10L, 400L)), s"${got.toSeq}")
  }

  test("ALL ROWS + MEASURES: unmarked defaults to RUNNING, FINAL reads " +
      "the whole match, CLASSIFIER/MATCH_NUMBER per row") {
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls,
        |           COUNT(V.*) AS v_run_cnt,
        |           RUNNING SUM(V.value) AS v_run_sum_c,
        |           FINAL COUNT(V.*) AS v_fin_cnt,
        |           FINAL LAST(V.event_id) AS v_fin_last,
        |           RUNNING LAST(U.event_id) AS u_run_last
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (C V+ P)
        |  WITHIN INTERVAL '7' DAY
        |  SUBSET U = (C, P)
        |  DEFINE C AS C.event_type = 'click',
        |         V AS V.event_type = 'view',
        |         P AS P.event_type = 'purchase'
        |)""".stripMargin
    val got = MatchRecognize.matchRecognizeRowsOf(funnelFrame(), sql)
      .filter(col("user_id") === 1 && col("start_event_id") === 1)
      .orderBy("ts_us", "event_id")
      .select("event_id", "mn", "cls", "v_run_cnt", "v_run_sum_c",
        "v_fin_cnt", "v_fin_last", "u_run_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      // click: no V yet → RUNNING count 0 / sum null; FINAL sees both
      (1L, 1L, "C", 0L, None, 2L, 3L, 1L),
      (2L, 1L, "V", 1L, Some(225L), 2L, 3L, 1L),
      (3L, 1L, "V", 2L, Some(575L), 2L, 3L, 1L),
      // purchase joins U → u_run_last flips from the click to it
      (4L, 1L, "P", 2L, Some(575L), 2L, 3L, 4L)), s"${got.toSeq}")
    // second match of the same key numbers 2 (dense rank in match order)
    val mn2 = MatchRecognize.matchRecognizeRowsOf(funnelFrame(), sql)
      .filter(col("user_id") === 1 && col("start_event_id") === 5)
      .select("mn").distinct().collect().map(_.getLong(0)).toSeq
    assert(mn2 == Seq(2L), s"$mn2")
  }

  test("RUNNING at the match's last row == the ONE-ROW pivot (the " +
      "standard's equivalence), on the sf corpus") {
    val events = Tables.t(spark, sfDir, "events")
    val perRow = MatchRecognize
      .matchRecognizeRowsOf(events, MatchRecognize.FunnelRunningSql)
    // the final row of each match carries the full-match RUNNING values
    val lastRows = perRow.filter(col("event_id") === col("end_event_id"))
      .select(col("user_id"), col("start_event_id"),
        col("v_run_cnt"), col("v_run_sum_c"))
    val pivot = MatchRecognize
      .matchRecognizeMeasuresOf(events, MatchRecognize.FunnelMeasuresSql)
      .select(col("user_id"), col("start_event_id"), col("views_cnt"),
        col("views_sum_c"))
    assert(pivot.count() > 0)
    val joined = pivot.join(lastRows, Seq("user_id", "start_event_id"))
    assert(joined.count() == pivot.count())
    assert(joined.filter(col("views_cnt") =!= col("v_run_cnt") ||
      col("views_sum_c") =!= col("v_run_sum_c")).count() == 0)
  }

  test("SUBSET parse rejections: collisions, unknown/duplicate " +
      "members, one-member unions, DEFINE over a subset") {
    def clause(subset: String, define: String =
        "DEFINE A AS A.event_type = 'click'") =
      s"""MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY ts, event_id
         |  ONE ROW PER MATCH
         |  PATTERN (A B)
         |  $subset
         |  $define
         |)""".stripMargin
    val collide = intercept[IllegalArgumentException](
      MatchRecognize.parse(clause("SUBSET A = (A, B)")))
    assert(collide.getMessage.contains("collides"), collide.getMessage)
    val unknown = intercept[IllegalArgumentException](
      MatchRecognize.parse(clause("SUBSET U = (A, Z)")))
    assert(unknown.getMessage.contains("never uses"), unknown.getMessage)
    val dup = intercept[IllegalArgumentException](
      MatchRecognize.parse(clause("SUBSET U = (A, A)")))
    assert(dup.getMessage.contains("repeats"), dup.getMessage)
    val single = intercept[IllegalArgumentException](
      MatchRecognize.parse(clause("SUBSET U = (A)")))
    assert(single.getMessage.contains("two"), single.getMessage)
    val twice = intercept[IllegalArgumentException](
      MatchRecognize.parse(
        clause("SUBSET U = (A, B), U = (B, A)")))
    assert(twice.getMessage.contains("twice"), twice.getMessage)
    val defOnSubset = intercept[IllegalArgumentException](
      MatchRecognize.parse(clause("SUBSET U = (A, B)",
        "DEFINE U AS U.event_type = 'click'")))
    assert(defOnSubset.getMessage.contains("union"), defOnSubset.getMessage)
    // and a valid declaration parses with its members recorded
    val ok = MatchRecognize.parse(clause("SUBSET U = (A, B)"))
    assert(ok.subsets == Map("U" -> List("A", "B")))
  }

  test("cepStreamMulti: per-tag emissions == the single-machine " +
      "queries, across a micro-batch seam, absence timers included") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Cep
    import graft.streaming.StreamingOps
    val specs = Seq(
      // funnel (contiguous), abandoned-cart (negation, horizon timer),
      // reluctant pair — three distinct machine classes on one buffer
      StreamingOps.CepSpec(IndexedSeq(Cep.Step("click"),
        Cep.Step("view", plus = true), Cep.Step("purchase")), 10 * M),
      StreamingOps.CepSpec(IndexedSeq(Cep.Step("click"),
        Cep.Step("purchase", neg = true)), 5 * M, contiguous = false),
      StreamingOps.CepSpec(IndexedSeq(
        Cep.Step("view", plus = true, reluctant = true),
        Cep.Step("view")), 10 * M))
    // user 7 completes the funnel across the seam; user 9's click sees
    // no purchase inside 5 min (absence emits on the horizon timer);
    // views pair reluctantly for both users
    val batch1 = Seq((7L, 0L, 1L, "click", 0L), (7L, 1 * M, 2L, "view", 0L),
      (9L, 0L, 10L, "click", 0L))
    val batch2 = Seq((7L, 2 * M, 3L, "view", 0L),
      (7L, 3 * M, 4L, "purchase", 0L), (9L, 2 * M, 11L, "view", 0L))
    val flush = Seq((999L, 60 * M, 999L, "flush", 0L))
    def runMulti(): Map[Int, Set[(Long, Long, Long, Long)]] = {
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      val name = s"multi_${System.nanoTime()}"
      val q = StreamingOps.cepStreamMulti(src.toDS(), specs)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      Seq(batch1, batch2, flush).foreach { b =>
        src.addData(b); q.processAllAvailable()
      }
      q.stop()
      spark.table(name).as[(Int, Cep.CepMatch)].collect()
        .groupBy(_._1).view.mapValues(_.map { case (_, m) =>
          (m.user_id, m.start_event_id, m.end_event_id, m.n_rows)
        }.toSet).toMap.withDefaultValue(Set.empty)
    }
    def runSingle(i: Int): Set[(Long, Long, Long, Long)] = {
      val sp = specs(i)
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      val name = s"single${i}_${System.nanoTime()}"
      val q = StreamingOps.cepStreamValued(src.toDS(), sp.pattern,
        sp.windowUs, sp.after, sp.contiguous, None, sp.grouped)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      Seq(batch1, batch2, flush).foreach { b =>
        src.addData(b); q.processAllAvailable()
      }
      q.stop()
      spark.table(name).as[Cep.CepMatch].collect()
        .map(m => (m.user_id, m.start_event_id, m.end_event_id, m.n_rows))
        .toSet
    }
    withRocks {
      val multi = runMulti()
      specs.indices.foreach { i =>
        assert(multi(i) == runSingle(i), s"spec $i diverged: ${multi(i)}")
      }
      // every machine class actually fired something
      assert(multi(0) == Set((7L, 1L, 4L, 4L)), s"${multi(0)}")
      assert(multi(1).map(_._2) == Set(10L), s"${multi(1)}") // abandoned
      assert(multi(2).nonEmpty, s"${multi(2)}")
    }
  }

  test("WITH UNMATCHED ROWS: non-consumed rows ride with null match " +
      "columns and measures; consumed rows unchanged") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L, 1L, "click", 1.00), (1L, 1 * M, 2L, "view", 2.25),
      (1L, 2 * M, 3L, "purchase", 9.99), (1L, 3 * M, 4L, "error", 0.10),
      (2L, 0L, 5L, "signup", 0.00))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls
        |  ALL ROWS PER MATCH WITH UNMATCHED ROWS
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (C V+ P)
        |  WITHIN INTERVAL '7' DAY
        |  DEFINE C AS C.event_type = 'click',
        |         V AS V.event_type = 'view',
        |         P AS P.event_type = 'purchase'
        |)""".stripMargin
    val got = MatchRecognize.matchRecognizeRowsOf(rows, sql)
      .orderBy("user_id", "ts_us", "event_id")
      .select("user_id", "event_id", "cls", "mn", "start_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (1L, 1L, Some("C"), Some(1L), Some(1L)),
      (1L, 2L, Some("V"), Some(1L), Some(1L)),
      (1L, 3L, Some("P"), Some(1L), Some(1L)),
      (1L, 4L, None, None, None),
      (2L, 5L, None, None, None)), s"${got.toSeq}")
    // ONE ROW + WITH UNMATCHED is a parse error (the option is the
    // ALL ROWS mode's)
    val e = intercept[IllegalArgumentException](MatchRecognize.parse(
      sql.replace("ALL ROWS PER MATCH WITH UNMATCHED ROWS",
        "ONE ROW PER MATCH WITH UNMATCHED ROWS")))
    assert(e.getMessage.nonEmpty)
  }

  test("cepTimedOutOf: all five outcomes — late-view timeout with a " +
      "truncated partial, terminator timeout, flush timeout, match, " +
      "silent kill") {
    import spark.implicits._
    import graft.operators.Cep
    val W = 10 * M // 10-minute window
    val rows = Seq(
      // user 1: click, view@1m, view@11m (PAST horizon) — times out at
      // the late view; partial = click + first view only
      (1L, 0L, 1L, "click"), (1L, 1 * M, 2L, "view"),
      (1L, 11 * M, 3L, "view"),
      // user 2: click, view@1m, purchase@12m (terminator past horizon)
      // — times out with the whole run
      (2L, 0L, 4L, "click"), (2L, 1 * M, 5L, "view"),
      (2L, 12 * M, 6L, "purchase"),
      // user 3: click, view — stream ends: flush timeout (wm → ∞)
      (3L, 0L, 7L, "click"), (3L, 1 * M, 8L, "view"),
      // user 4: the completing funnel inside the window
      (4L, 0L, 9L, "click"), (4L, 1 * M, 10L, "view"),
      (4L, 2 * M, 11L, "purchase"),
      // user 5: click, view, ERROR inside the window — a kill, not a
      // timeout (Flink's own distinction); nothing emitted
      (5L, 0L, 12L, "click"), (5L, 1 * M, 13L, "view"),
      (5L, 2 * M, 14L, "error"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("value", lit(1.0))
    val got = Cep.cepTimedOutOf(rows,
      Seq(Cep.Step("click"), Cep.Step("view", plus = true),
        Cep.Step("purchase")), W)
      .collect().sortBy(_.user_id)
      .map(o => (o.user_id, o.start_event_id, o.end_event_id, o.n_rows,
        o.timed_out))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 2L, true),
      (2L, 4L, 5L, 2L, true),
      (3L, 7L, 8L, 2L, true),
      (4L, 9L, 11L, 3L, false)), s"${got.toSeq}")
    // out-of-scope pattern classes are rejected driver-side
    val e = intercept[IllegalArgumentException](Cep.cepTimedOutOf(rows,
      Seq(Cep.Step("view", plus = true), Cep.Step("view")), W))
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("cepStreamTimedOut: a partial with NO further rows times out on " +
      "its horizon timer; a completing funnel stays a match") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Cep
    import graft.streaming.StreamingOps
    withRocks {
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      val q = StreamingOps.cepStreamTimedOut(src.toDS(),
        Seq(Cep.Step("click"), Cep.Step("view", plus = true),
          Cep.Step("purchase")), 10 * M)
        .writeStream.format("memory").queryName("cep_tmo")
        .outputMode("append").start()
      // user 7: click + view, then NOTHING ever again for that key;
      // user 8 completes a funnel and keeps the stream alive
      src.addData((7L, 0L, 1L, "click", 0L), (7L, 1 * M, 2L, "view", 0L),
        (8L, 0L, 3L, "click", 0L))
      q.processAllAvailable()
      src.addData((8L, 1 * M, 4L, "view", 0L),
        (8L, 2 * M, 5L, "purchase", 0L))
      q.processAllAvailable()
      // another key's far-future row advances the watermark past user
      // 7's horizon — the timeout must ride the event-time timer alone
      src.addData((9L, 60 * M, 90L, "error", 0L))
      q.processAllAvailable()
      src.addData((9L, 61 * M, 91L, "error", 0L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("cep_tmo").as[Cep.CepOutcome].collect()
        .map(o => (o.user_id, o.start_event_id, o.end_event_id, o.n_rows,
          o.timed_out)).toSet
      assert(got == Set(
        (7L, 1L, 2L, 2L, true),
        (8L, 3L, 5L, 3L, false)), s"$got")
    }
  }

  test("CepMultiStreamProcessor recovery: shared buf2, per-spec m2_$i " +
      "and horizon timers survive kill+restart; committed batches not " +
      "replayed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Cep
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.CepSpec
    withRocks {
      // two machine classes on one buffer: the funnel WITH timeouts
      // (simple walk + timeout timers) and the abandoned-cart negation
      // (relaxed walk + absence timers)
      val specs = Seq(
        CepSpec(IndexedSeq(Cep.Step("click"),
          Cep.Step("view", plus = true), Cep.Step("purchase")), 10 * M,
          withTimeouts = true),
        CepSpec(IndexedSeq(Cep.Step("click"),
          Cep.Step("purchase", neg = true)), 10 * M, contiguous = false))
      val ckpt = tmp("graft-multi-ckpt")
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      def start(outDir: String) =
        StreamingOps.cepStreamMulti(src.toDS(), specs)
          .toDF().select(col("_1").as("pat"), col("_2.*"))
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(outDir); ()
          }
          .outputMode("append")
          .option("checkpointLocation", ckpt).start()
      def outcomes(dir: String): Set[(Int, Long, Long, Long)] =
        spark.read.parquet(dir)
          .select("pat", "user_id", "start_event_id", "n_rows")
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet

      // run 1: key 3 completes a funnel; key 2's lone click expires
      // inside run 1 (timeout + absence); key 1's click+view partial
      // and key 4's click stay PENDING across the kill
      val out1 = tmp("graft-multi-out1")
      val q1 = start(out1)
      src.addData(
        (1L, 20 * M, 1L, "click", 0L), (1L, 21 * M, 2L, "view", 0L),
        (2L, 5 * M, 3L, "click", 0L),
        (3L, 0L, 4L, "click", 0L), (3L, 1 * M, 5L, "view", 0L),
        (3L, 2 * M, 6L, "purchase", 0L),
        (4L, 19 * M, 9L, "click", 0L))
      q1.processAllAvailable()
      q1.stop()
      val run1 = outcomes(out1)
      assert(run1 == Set(
        (0, 3L, 4L, 3L), // key 3's funnel match
        (1000, 2L, 3L, 1L), // key 2's click timed out inside run 1
        (1, 2L, 3L, 1L)), // ... and its absence emitted
        s"run1: $run1")

      // run 2 on the SAME checkpoint: key 1's funnel completes ACROSS
      // the seam (recovered buf2 + m2_0); key 4 resolves on recovered
      // horizon TIMERS alone (the only new rows are another key's);
      // nothing from run 1 re-emits
      val out2 = tmp("graft-multi-out2")
      val q2 = start(out2)
      src.addData((1L, 22 * M, 7L, "view", 0L),
        (1L, 23 * M, 8L, "purchase", 0L))
      q2.processAllAvailable()
      src.addData((9L, 40 * M, 90L, "error", 0L))
      q2.processAllAvailable()
      src.addData((9L, 40 * M + 1L, 91L, "error", 0L))
      q2.processAllAvailable()
      q2.stop()
      val run2 = outcomes(out2)
      assert(run2 == Set(
        (0, 1L, 1L, 4L), // click view | view purchase across the seam
        (1000, 4L, 9L, 1L), // key 4's timer-driven timeout
        (1, 4L, 9L, 1L)), // ... and absence (no purchase ever came)
        s"run2: $run2")

      // unbroken twin: identical feeds, one query, fresh checkpoint
      val src3 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      val out3 = tmp("graft-multi-out3")
      val q3 = StreamingOps.cepStreamMulti(src3.toDS(), specs)
        .toDF().select(col("_1").as("pat"), col("_2.*"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out3); ()
        }
        .outputMode("append")
        .option("checkpointLocation", tmp("graft-multi-ckpt3")).start()
      src3.addData(
        (1L, 20 * M, 1L, "click", 0L), (1L, 21 * M, 2L, "view", 0L),
        (2L, 5 * M, 3L, "click", 0L),
        (3L, 0L, 4L, "click", 0L), (3L, 1 * M, 5L, "view", 0L),
        (3L, 2 * M, 6L, "purchase", 0L),
        (4L, 19 * M, 9L, "click", 0L))
      q3.processAllAvailable()
      src3.addData((1L, 22 * M, 7L, "view", 0L),
        (1L, 23 * M, 8L, "purchase", 0L))
      q3.processAllAvailable()
      src3.addData((9L, 40 * M, 90L, "error", 0L))
      q3.processAllAvailable()
      src3.addData((9L, 40 * M + 1L, 91L, "error", 0L))
      q3.processAllAvailable()
      q3.stop()
      assert(run1 ++ run2 == outcomes(out3),
        s"split ${run1 ++ run2} != unbroken ${outcomes(out3)}")
    }
  }

  test("cepStreamMeasures: per-step aggregates emit live at match " +
      "completion, spanning the micro-batch seam") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Cep
    withRocks {
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      val q = graft.streaming.StreamingOps.cepStreamMeasures(src.toDS(),
        Seq(Cep.Step("click"), Cep.Step("view", plus = true),
          Cep.Step("purchase")), 10 * M)
        .writeStream.format("memory").queryName("cep_sm")
        .outputMode("append").start()
      src.addData((7L, 0L, 1L, "click", 100L), (7L, 1 * M, 2L, "view", 225L))
      q.processAllAvailable()
      src.addData((7L, 2 * M, 3L, "view", 350L),
        (7L, 3 * M, 4L, "purchase", 999L))
      q.processAllAvailable()
      src.addData((8L, 30 * M, 90L, "error", 0L))
      q.processAllAvailable()
      src.addData((8L, 31 * M, 91L, "error", 0L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("cep_sm").as[Cep.CepMeasured].collect()
        .sortBy(_.step)
        .map(m => (m.step, m.cnt, m.sum_value_c, m.first_event_id,
          m.last_event_id))
      assert(got.toSeq == Seq(
        (0, 1L, 100L, Some(1L), Some(1L)),
        (1, 2L, 575L, Some(2L), Some(3L)),
        (2, 1L, 999L, Some(4L), Some(4L))), s"${got.toSeq}")
    }
  }

  test("cepStreamSqlMulti: named clauses share one buffer; " +
      "cepStreamSqlMeasures strict-parses at submission") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Cep
    import graft.streaming.StreamingOps
    withRocks {
      def clause(pat: String, define: String) =
        s"""MATCH_RECOGNIZE (
           |  PARTITION BY user_id ORDER BY ts, event_id
           |  ONE ROW PER MATCH
           |  AFTER MATCH SKIP PAST LAST ROW
           |  PATTERN ($pat)
           |  WITHIN INTERVAL '10' MINUTE
           |  $define
           |)""".stripMargin
      val clauses = Seq(
        "funnel" -> clause("C V+ P",
          """DEFINE C AS C.event_type = 'click',
            |       V AS V.event_type = 'view',
            |       P AS P.event_type = 'purchase'""".stripMargin),
        "pair" -> clause("A B",
          """DEFINE A AS A.event_type = 'signup',
            |       B AS B.event_type = 'error'""".stripMargin))
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Long)]
      val q = StreamingOps.cepStreamSqlMulti(src.toDS(), clauses)
        .writeStream.format("memory").queryName("sql_multi")
        .outputMode("append").start()
      src.addData((7L, 0L, 1L, "click", 0L), (7L, 1 * M, 2L, "view", 0L),
        (7L, 2 * M, 3L, "purchase", 0L),
        (8L, 0L, 4L, "signup", 0L), (8L, 1 * M, 5L, "error", 0L))
      q.processAllAvailable()
      src.addData((9L, 30 * M, 90L, "view", 0L))
      q.processAllAvailable()
      src.addData((9L, 31 * M, 91L, "view", 0L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("sql_multi").as[(String, Cep.CepMatch)]
        .collect().map { case (n, m) => (n, m.user_id, m.start_event_id) }
        .toSet
      assert(got == Set(("funnel", 7L, 1L), ("pair", 8L, 4L)), s"$got")
      // duplicate names and a malformed measure reject at submission
      val dup = intercept[IllegalArgumentException](
        StreamingOps.cepStreamSqlMulti(src.toDS(),
          clauses :+ clauses.head))
      assert(dup.getMessage.contains("repeat"), dup.getMessage)
      val badMeasure = clauses.head._2.replace("ONE ROW PER MATCH",
        "MEASURES MEDIAN(V.value) AS m\n  ONE ROW PER MATCH")
      val e = intercept[IllegalArgumentException](
        StreamingOps.cepStreamSqlMeasures(src.toDS(), badMeasure))
      assert(e.getMessage.contains("unsupported MEASURES"), e.getMessage)
    }
  }

  test("measure-shape rejections: CLASSIFIER needs ALL ROWS, niladic " +
      "measures take no RUNNING/FINAL marker") {
    val events = funnelFrame()
    val classifierOneRow = subsetHeader.replace(
      "MATCH_NUMBER() AS mn", "CLASSIFIER() AS cls")
    val e1 = intercept[IllegalArgumentException](
      MatchRecognize.matchRecognizeMeasuresOf(events, classifierOneRow))
    assert(e1.getMessage.contains("ALL ROWS"), e1.getMessage)
    val markedNiladic = subsetHeader.replace(
      "MATCH_NUMBER() AS mn", "RUNNING MATCH_NUMBER() AS mn")
    val e2 = intercept[IllegalArgumentException](
      MatchRecognize.matchRecognizeMeasuresOf(events, markedNiladic))
    assert(e2.getMessage.contains("niladic"), e2.getMessage)
  }
}
