package graft

import graft.operators.{Dedup, Quality, RangeJoin, TextAnalysis}
import graft.queries.{Analytics, Relational, Windows}
import graft.streaming.StreamingOps
import graft.StreamingSpec.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-5 additions: CUMULATE windows (batch + streaming), the
  * interval-overlap banded join, edit-distance near-dup, the data-quality
  * gate, and Spearman correlation.
  */
class Round5Spec extends SparkSpecBase {

  private def ev(id: Long, t: String, v: Double = 1.0) =
    Ev(id, java.sql.Timestamp.valueOf(t), 1L, "click", v)

  // ---- CUMULATE ----

  test("cumulate (batch form on a golden frame): expanding slices per window") {
    import spark.implicits._
    // the streaming op on a bounded frame IS the batch semantics
    // (watermark is a no-op on batch); events at 0:10 and 2:30 of window
    // 00:00-00:04, one at 5:10 of window 00:04-00:08
    val df = Seq(
      ev(1, "2024-03-01 00:00:10"),
      ev(2, "2024-03-01 00:02:30"),
      ev(3, "2024-03-01 00:05:10")).toDF()
    val out = StreamingOps.cumulateCounts(df)
      .select($"w_start".cast("string"), $"w_end".cast("string"), $"cnt")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(
      ("2024-03-01 00:00:00", "2024-03-01 00:01:00", 1L),
      ("2024-03-01 00:00:00", "2024-03-01 00:02:00", 1L),
      ("2024-03-01 00:00:00", "2024-03-01 00:03:00", 2L),
      ("2024-03-01 00:00:00", "2024-03-01 00:04:00", 2L),
      ("2024-03-01 00:04:00", "2024-03-01 00:06:00", 1L),
      ("2024-03-01 00:04:00", "2024-03-01 00:07:00", 1L),
      ("2024-03-01 00:04:00", "2024-03-01 00:08:00", 1L)))
  }

  test("cumulate: batch query ≡ streaming expressions over the testdata") {
    val a = Windows.q30bCumulate(spark, sfDir)
      .select(col("w_start"), col("w_end"), col("cnt"), col("sum_value"))
    val b = StreamingOps.cumulateCounts(graft.Tables.t(spark, sfDir, "events"))
      .select(unix_micros(col("w_start")).as("w_start"),
        unix_micros(col("w_end")).as("w_end"), col("cnt"), col("sum_value"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("cumulate streaming: in-order events across micro-batches never drop") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.cumulateCounts(src.toDF())
      .writeStream.format("memory").queryName("cmlA").outputMode("append").start()
    // the watermark-sprint regression case: one window spanning batches,
    // all events strictly in order
    src.addData(ev(1, "2024-03-01 00:00:10"))
    q.processAllAvailable()
    src.addData(ev(2, "2024-03-01 00:02:30")) // in-order, same window
    q.processAllAvailable()
    src.addData(ev(3, "2024-03-01 00:10:00")) // advancer: flush window 1
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cmlA")
      .select($"w_end".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    assert(out("2024-03-01 00:01:00") == 1L)
    assert(out("2024-03-01 00:02:00") == 1L)
    assert(out("2024-03-01 00:03:00") == 2L) // ev2 counted — not dropped
    assert(out("2024-03-01 00:04:00") == 2L)
  }

  test("cumulate streaming: late event skips closed slices, lands in open ones") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.cumulateCounts(src.toDF())
      .writeStream.format("memory").queryName("cml").outputMode("append").start()
    // batch 1: ev1 fills :01-:04; the advancer's window ends 00:08, so
    // the event-time watermark lands at 00:08 − 4:05 = 00:03:55 and
    // slices :01-:03 finalize with cnt 1
    src.addData(ev(1, "2024-03-01 00:00:10"), ev(2, "2024-03-01 00:06:30"))
    q.processAllAvailable()
    // batch 2: ev3 is late past the emitted :01-:03 slices (those rows
    // drop) but its :04 slice is still open and counts; ev4 flushes it
    src.addData(ev(3, "2024-03-01 00:00:50"), ev(4, "2024-03-01 00:20:00"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cml")
      .select($"w_end".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    assert(out("2024-03-01 00:01:00") == 1L)
    assert(out("2024-03-01 00:02:00") == 1L)
    assert(out("2024-03-01 00:03:00") == 1L)
    assert(out("2024-03-01 00:04:00") == 2L) // ev1 + late ev3's open slice
  }

  test("dynamic-gap session streaming: a purchase holds the session open") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.dynamicSessionCounts(src.toDF())
      .writeStream.format("memory").queryName("dyns").outputMode("append").start()
    src.addData(
      Ev(1, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 7, "click", 1.0),
      // purchase's 60s gap holds the session to 00:01:25...
      Ev(2, java.sql.Timestamp.valueOf("2024-03-01 00:00:25"), 7, "purchase", 1.0),
      // ...so this event MERGES (a fixed 30s gap would have closed at 00:00:55)
      Ev(3, java.sql.Timestamp.valueOf("2024-03-01 00:01:20"), 7, "click", 1.0))
    q.processAllAvailable()
    src.addData(Ev(9, java.sql.Timestamp.valueOf("2024-03-01 01:00:00"), 8, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dyns")
      .select($"user_id", $"w_start".cast("string"), $"w_end".cast("string"), $"cnt")
      .as[(Long, String, String, Long)].collect().filter(_._1 == 7L).toSeq
    assert(out == Seq((7L, "2024-03-01 00:00:00", "2024-03-01 00:01:50", 3L)))
  }

  test("complete output mode re-emits the full aggregate state per batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    // complete mode: no watermark requirement; every batch rewrites the
    // whole result table — the mode the append-based suite never touches
    val q = src.toDF()
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select($"w.start".as("w_start"), $"cnt")
      .writeStream.format("memory").queryName("cmpl")
      .outputMode("complete").start()
    src.addData(ev(1, "2024-03-01 00:00:10"))
    q.processAllAvailable()
    val after1 = spark.table("cmpl").count()
    // a LATE row for the same window updates the already-emitted count —
    // complete mode keeps all state live (no finalization)
    src.addData(ev(2, "2024-03-01 00:05:00"), ev(3, "2024-03-01 00:00:20"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cmpl")
      .select($"w_start".cast("string"), $"cnt").as[(String, Long)]
      .collect().toMap
    assert(after1 == 1L)
    assert(out == Map("2024-03-01 00:00:00" -> 2L, "2024-03-01 00:05:00" -> 1L))
  }

  // ---- interval-overlap join ----

  test("overlapBanded ≡ naive theta join, exactly-once, across band widths") {
    import spark.implicits._
    // touching endpoints (no overlap, half-open), nesting, duplicates,
    // an interval spanning many bands, zero-adjacent starts
    val a = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 5L, 105L), (4L, 40L, 45L),
      (5L, 40L, 45L), (6L, 99L, 101L))
      .toDF("a_id", "a_s", "a_e")
    val b = Seq((11L, 9L, 11L), (12L, 20L, 30L), (13L, 0L, 200L), (14L, 44L, 46L),
      (15L, 100L, 110L))
      .toDF("b_id", "b_s", "b_e")
    val naive = a.crossJoin(b)
      .filter($"a_s" < $"b_e" && $"b_s" < $"a_e")
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    for (band <- Seq(3L, 10L, 64L, 1000L)) {
      val got = RangeJoin.overlapBanded(a, "a_s", "a_e", b, "b_s", "b_e", band)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"band=$band") // equality of sorted seqs ⇒ no dup
    }
  }

  test("tsOverlap plans as a partitioned equi-join — no nested loop") {
    val f = RangeJoin.tsOverlap(spark, sfDir).queryExecution.executedPlan.toString
    assert(!f.contains("BroadcastNestedLoopJoin") && !f.contains("CartesianProduct"))
  }

  test("cumulate batch plans as generate + keyed agg — no window function") {
    val plan = Windows.q30bCumulate(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("Generate") && plan.contains("HashAggregate"))
    assert(!plan.contains("Window"), "cumulate must not fall back to a window")
  }

  test("edit-distance plan: band equi-join, no cartesian, one hist source") {
    val q = Dedup.levenshteinPairs(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    // the checkpointed histogram projection appears as scan-from-RDD on
    // both join sides — the eight regexes never re-enter the plan
    assert(!plan.contains("regexp_replace"),
      "hist regexes must stay behind the checkpoint barrier")
  }

  // ---- edit-distance near-dup ----

  test("editDistancePairs ≡ brute force, including cross-band pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),        // len 19
      (2L, "the quick brown fox"),        // exact dup → lev 0
      (3L, "the quick brown foxx"),       // len 20 (band boundary), lev 1
      (4L, "the quicker brown fox"),      // lev 3 vs 1
      (5L, "a completely different doc"),
      (6L, "the quick brown foxes!!!"),   // lev 5 vs 1 → excluded at 4
      (7L, "short"), (8L, "shorts"), (9L, "shor"))
      .toDF("doc_id", "text")
    val naive = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("lev", levenshtein(col("a.text"), col("b.text")))
      .filter(col("lev") <= 4)
      .select(col("a.doc_id"), col("b.doc_id"), col("lev").cast("long"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val got = Dedup.editDistancePairs(docs, 4)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == naive && got.nonEmpty)
    assert(got.contains((1L, 2L, 0L)) && got.contains((1L, 3L, 1L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 6L))
  }

  // ---- data-quality gate ----

  test("dqOrders: six checks, one row each, date check fires on testdata") {
    import spark.implicits._
    val out = Quality.dqOrders(spark, sfDir)
      .select($"check_name", $"violations", $"total", $"pass")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.length == 6 && out.map(_._1).distinct.length == 6)
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("key_not_null")._2 == 0L && byName("key_not_null")._4)
    assert(byName("key_unique")._2 == 0L)
    assert(byName("fk_custkey_exists")._2 == 0L)
    assert(byName("date_in_range")._2 > 0L && !byName("date_in_range")._4)
    assert(out.forall(_._3 == out.head._3)) // one shared total
  }

  test("Quality.report: null predicate counts as violation; tiers compose") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None: Option[Double]),
      (3L, Some(2.0))).toDF("k", "v")
    val out = Quality.report(df,
      rowChecks = Seq("v_positive" -> ($"v" > 0.0)),
      aggChecks = Seq("k_unique" -> (count($"k") - countDistinct($"k"))),
      extra = Seq("external" -> df.limit(1).agg(lit(7L).as("v"))))
      .select($"check_name", $"violations", $"pass")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("v_positive") == ((2L, false))) // -1 AND the NULL both fail
    assert(out("k_unique") == ((1L, false)))   // duplicated k=3
    assert(out("external") == ((7L, false)))
  }

  test("dqOrders is one fact scan plus the FK anti-join") {
    val plan = Quality.dqOrders(spark, sfDir).queryExecution.executedPlan.toString
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 2, s"expected 2 orders scans (checks + FK), got $ordersScans")
  }

  // ---- Spearman ----

  test("q10jSpearman: coefficients bounded, groups complete") {
    import spark.implicits._
    val out = Relational.q10jSpearman(spark, sfDir)
      .select($"l_returnflag", $"cnt", $"spearman")
      .as[(String, Long, Double)].collect()
    assert(out.length == 3)
    assert(out.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
    assert(out.map(_._2).sum ==
      graft.Tables.t(spark, sfDir, "lineitem").count())
  }

  // ---- reconciliation ----

  test("tableDiff: added/removed/changed/unchanged, null-safe compare") {
    import spark.implicits._
    val a = Seq((1L, Some(10.0), "x"), (2L, Some(20.0), "y"),
      (3L, None: Option[Double], "z"), (4L, Some(40.0), "w"))
      .toDF("k", "price", "tag")
    val b = Seq((1L, Some(10.0), "x"),   // unchanged → absent from diff
      (2L, Some(25.0), "y"),             // changed (value)
      (3L, None: Option[Double], "z"),   // unchanged with NULL (null-safe)
      (5L, Some(50.0), "v"))             // added; 4 removed
      .toDF("k", "price", "tag")
    val out = graft.operators.Reconcile
      .tableDiff(a, b, "k", Seq("price", "tag"))
      .select($"k", $"change").as[(Long, String)].collect().sorted.toSeq
    assert(out == Seq((2L, "changed"), (4L, "removed"), (5L, "added")))
  }

  // ---- bitmap distinct ----

  test("bitmap two-level distinct ≡ countDistinct") {
    import spark.implicits._
    val got = Relational.q11cBitmapDistinct(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val want = graft.Tables.t(spark, sfDir, "orders")
      .groupBy("o_orderstatus").agg(countDistinct("o_custkey"))
      .as[(String, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }

  // ---- co-purchase ----

  test("copurchasePairs: triangle order, bounded size, positive counts") {
    import spark.implicits._
    val out = Analytics.copurchasePairs(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 20)
    assert(out.forall(r => r._1 < r._2 && r._3 >= 1))
    assert(out.map(_._3).sliding(2).forall(p => p.head >= p.last))
  }

  // ---- MAD ----

  test("q10kMad golden: known median, MAD, and outlier count") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "value").withColumn("event_type", lit("t"))
      // Tables.t("events") narrows a raw-nanos ts column; provide one
      .withColumn("ts", lit(1700000000000000000L))
    val tmp = java.nio.file.Files.createTempDirectory("mad").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Relational.q10kMad(spark, tmp)
      .select($"med", $"mad", $"n_outliers", $"n_rows")
      .as[(Double, Double, Long, Long)].collect().toSeq
    // med 3.5; adevs (2.5,1.5,0.5,0.5,1.5,96.5) → mad 1.5; fence 4.5 → 1
    assert(out == Seq((3.5, 1.5, 1L, 6L)))
  }

  // ---- sliding distinct / corr matrix / hints / trending ----

  test("slidingDistinct golden: trailing-7-day membership on a temp table") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // user 1 active day 0 and day 10, user 2 active days 0 and 1
    val df = Seq((1L, 0L), (1L, 10L), (2L, 0L), (2L, 1L)).zipWithIndex
      .map { case ((u, d), i) => (i.toLong, u, d * dayNs + 1000L) }
      .toDF("event_id", "user_id", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("sliding").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Windows.q30cSlidingDistinct(spark, tmp)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 2L, 1L -> 2L, 10L -> 1L))
  }

  test("slidingDistinct ≡ naive per-day COUNT DISTINCT over the range") {
    import spark.implicits._
    val got = Windows.q30cSlidingDistinct(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val ud = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", (unix_micros($"ts") / 86400000000L).cast("long").as("day"))
      .distinct().as[(Long, Long)].collect()
    val days = ud.map(_._2).distinct
    val naive = days.map(d =>
      d -> ud.filter(r => r._2 >= d - 6 && r._2 <= d).map(_._1).distinct.length.toLong).toMap
    assert(got == naive && got.nonEmpty)
  }

  test("corr matrix: 6 unique ordered pairs, all within [-1, 1]") {
    import spark.implicits._
    val out = Relational.q10lCorrMatrix(spark, sfDir)
      .as[(String, String, Double)].collect()
    assert(out.length == 6)
    assert(out.map(r => (r._1, r._2)).distinct.length == 6)
    assert(out.forall(r => r._1 != r._2 && math.abs(r._3) <= 1.0))
  }

  test("join hints force the hinted physical strategy") {
    val shuffle = Relational.q04dJoinHints(spark, sfDir)
    shuffle.collect()
    val p1 = shuffle.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p1.contains("ShuffledHashJoin"), p1)
    val merge = graft.Tables.t(spark, sfDir, "orders")
      .join(graft.Tables.t(spark, sfDir, "customer").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    merge.collect()
    val p2 = merge.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p2.contains("SortMergeJoin"), p2)
  }

  test("overlapBanded ≡ naive on 200 seeded random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def mk(n: Int, tag: Long) = Seq.tabulate(n) { i =>
      val s = rnd.nextInt(1000).toLong
      (tag * 1000 + i, s, s + 1 + rnd.nextInt(80))
    }
    val a = mk(200, 1L).toDF("a_id", "a_s", "a_e")
    val b = mk(200, 2L).toDF("b_id", "b_s", "b_e")
    val naive = a.crossJoin(b).filter($"a_s" < $"b_e" && $"b_s" < $"a_e")
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val got = RangeJoin.overlapBanded(a, "a_s", "a_e", b, "b_s", "b_e", 50L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive && got.nonEmpty)
  }

  test("anti-join argmax ≡ groupBy max (every kept row is its group max)") {
    import spark.implicits._
    val got = Relational.q24dAntiArgmax(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val maxes = graft.Tables.t(spark, sfDir, "orders")
      .groupBy("o_custkey").agg(max("o_totalprice"))
      .as[(Long, Double)].collect().toMap
    assert(got.nonEmpty && got.forall { case (c, _, p) => maxes(c) == p })
    assert(got.map(_._1).distinct.length == maxes.size) // every customer kept
  }

  test("weighted median golden: half the units sit at or below it") {
    import spark.implicits._
    // values 10,20,30 with weights 1,2,7 → cum 1,3,10; 2*cum>=10 first at 30
    val df = Seq((10.0, 1.0), (20.0, 2.0), (30.0, 7.0)).zipWithIndex
      .map { case ((v, q), i) => (i.toLong, 1L, v, q) }
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .withColumn("l_returnflag", lit("A"))
    val tmp = java.nio.file.Files.createTempDirectory("wmed").toString
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.q10mWeightedMedian(spark, tmp)
      .select($"weighted_median", $"total_units").as[(Double, Long)].collect()
    assert(out.toSeq == Seq((30.0, 10L)))
  }

  // ---- PPS systematic sampling ----

  test("ppsSample: hit totals, heavy-doc guarantee, shard invariance") {
    import spark.implicits._
    val base = graft.operators.Mixing.ppsSample(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val d = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", length($"text").cast("long")).as[(Long, Long)].collect()
    val tot = d.map(_._2).sum; val step = tot / 50
    assert(base.map(_._4).sum == tot / step) // every multiple of step hits
    // any doc at least one full step wide must be selected
    val heavy = d.filter(_._2 >= step).map(_._1).toSet
    assert(heavy.subsetOf(base.map(_._1).toSet))
    // selection is ∝ weight by construction and shard-count-invariant
    for (shards <- Seq(1, 5, 32)) {
      val alt = graft.operators.Mixing.ppsSample(spark, sfDir, nShards = shards)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(alt == base, s"nShards=$shards")
    }
  }

  test("sliding sketch estimates track the exact sliding distinct within 5%") {
    import spark.implicits._
    val exact = Windows.q30cSlidingDistinct(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val approx = graft.operators.SketchRollup.slidingUserSketches(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(approx.keySet == exact.keySet && exact.nonEmpty)
    exact.foreach { case (d, n) =>
      assert(math.abs(approx(d) - n) <= math.max(1L, (0.05 * n).toLong),
        s"day $d: exact $n approx ${approx(d)}")
    }
  }

  // ---- native as-of join (custom SparkPlan) ----

  test("native as-of ≡ compositional as-of on the testdata") {
    val a = graft.operators.AsOfJoin.clickToSignup(spark, sfDir)
    val b = graft.operators.AsOfJoin.clickToSignupNative(spark, sfDir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == b.count() && a.count() > 0)
  }

  test("native as-of plans AsOfJoinExec: no window, one exchange per side") {
    val q = graft.operators.AsOfJoin.clickToSignupNative(spark, sfDir)
    q.collect() // finalize AQE
    // AQE prints Final + Initial sections; assert on the final plan only
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin ")) // AsOfJoinExec renders sans suffix
    assert(!plan.contains("Window"), "native form must not fall back to window")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges\n$plan")
  }

  test("native as-of golden: ties, tiebreak, unmatched, right-only keys") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 30L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 5L), (1L, 10L, 6L), (1L, 15L, 7L),
      (1L, 25L, 9L), (3L, 1L, 8L))
      .toDF("k", "t", "rid")
    val out = graft.plans.NativeAsOfJoin
      .asOf(left, right, key = "k", ts = "t", tiebreak = "rid",
        rightPayload = Seq("rid" -> "matched_rid"))
      .select($"tag", $"matched_rid".cast("string"))
      .as[(String, String)].collect().toMap
    assert(out("l1") == "6")  // same-ts rows visible; larger tiebreak wins
    assert(out("l2") == "7")  // 15 <= 20 < 25
    assert(out("l3") == null) // key 2 has no right rows; key 3 ignored
  }

  // ---- graph ----

  test("triangleStats ≡ brute force on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 30
    val edges = (for {
      u <- 1 to n; v <- (u + 1) to n if rnd.nextDouble() < 0.25
    } yield (u.toLong, v.toLong)).toSeq
    val eset = edges.toSet
    val brute = (for {
      a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
      if eset((a.toLong, b.toLong)) && eset((b.toLong, c.toLong)) &&
        eset((a.toLong, c.toLong))
    } yield 1).size.toLong
    val got = graft.operators.Graph.triangleStats(edges.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().head
    assert(got._2 == edges.size.toLong && got._3 == brute && brute > 0)
  }

  test("triangleStats golden: K4 + pendant, and a triangle-free star") {
    import spark.implicits._
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)) :+ (1L, 5L)
    val out1 = graft.operators.Graph.triangleStats(k4.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().head
    assert(out1 == ((5L, 7L, 4L))) // K4 has 4 triangles; pendant adds none
    val star = (2L to 6L).map(i => (1L, i))
    val out2 = graft.operators.Graph.triangleStats(star.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().head
    assert(out2 == ((6L, 5L, 0L)))
  }

  test("pageRank golden: 4-cycle is uniform, star centre dominates") {
    import spark.implicits._
    // 4-cycle: perfectly symmetric -> every rank stays exactly 1.0
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val out1 = graft.operators.Graph.pageRank(cyc.toDF("u", "v"))
      .as[(Long, Double)].collect().toMap
    assert(out1.size == 4 && out1.values.forall(r => math.abs(r - 1.0) < 1e-9))
    // star K1,4: the centre receives all four leaves' full rank each
    // round; leaves split the centre's. Centre must dominate and the
    // leaves must be identical by symmetry.
    val star = (2L to 5L).map(i => (1L, i))
    val out2 = graft.operators.Graph.pageRank(star.toDF("u", "v"))
      .as[(Long, Double)].collect().toMap
    val leaves = (2L to 5L).map(out2)
    assert(leaves.distinct.size == 1 && out2(1L) > 2 * leaves.head)
    // total rank is conserved up to the damping leak: n*(1-d) + d*sum
    assert(math.abs(out2.values.sum - 5.0) < 1e-6)
  }

  test("pageRank ≡ driver-side power iteration on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 25
    val edges = (for {
      u <- 1 to n; v <- (u + 1) to n if rnd.nextDouble() < 0.2
    } yield (u.toLong, v.toLong)).toSeq
    // reference: same quantized arithmetic, plain Scala
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size).toMap
    var r = adj.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, BigDecimal]
      for ((u, vs) <- adj; v <- vs)
        contrib(v) = contrib.getOrElse(v, BigDecimal(0)) +
          BigDecimal(r(u) / deg(u)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      r = adj.keys.map(k => k -> BigDecimal(
        0.15 + 0.85 * contrib.getOrElse(k, BigDecimal(0)).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    }
    val got = graft.operators.Graph.pageRank(edges.toDF("u", "v"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == r.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - r(k)) < 1e-8, s"node $k") }
  }

  test("groupSample: exactly k per stratum, deterministic, subset of corpus") {
    import spark.implicits._
    val out = graft.operators.Mixing.groupSample(spark, sfDir, k = 7)
      .as[(String, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    val sizes = graft.Tables.t(spark, sfDir, "documents")
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    // every stratum with >= 7 docs yields exactly 7; smaller ones all
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(7L, sizes(lang)),
        s"$lang: ${rows.length}")
      assert(rows.map(_._2).distinct.length == rows.length)
    }
    assert(byLang.keySet == sizes.keySet.filter(sizes(_) > 0))
    // rerun identical (no RNG state anywhere)
    val again = graft.operators.Mixing.groupSample(spark, sfDir, k = 7)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("kmeans: clusters separate, counts partition the corpus, inertia sane") {
    import spark.implicits._
    val out = graft.operators.KMeans.kmeansClusters(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet.subsetOf((0L until 4L).toSet))
    val total = graft.Tables.t(spark, sfDir, "embeddings").count()
    assert(out.map(_._2).sum == total) // every vector assigned exactly once
    assert(out.forall(_._3 >= 0.0))
  }

  test("tsOhlc golden: open/close respect the (ts, event_id) tiebreak") {
    import spark.implicits._
    // same-timestamp open: ids 1,2 at 00:00 -> open is id 1's value;
    // close at the last ts regardless of value ordering
    val rows = Seq(
      Ev(2, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 1L, "click", 9.0),
      Ev(1, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 1L, "click", 3.0),
      Ev(3, java.sql.Timestamp.valueOf("2024-03-01 07:00:00"), 1L, "click", 1.0),
      Ev(4, java.sql.Timestamp.valueOf("2024-03-01 09:00:00"), 1L, "click", 5.0),
      Ev(5, java.sql.Timestamp.valueOf("2024-03-02 01:00:00"), 1L, "click", 7.0))
      .toDF()
    rows.createOrReplaceTempView("__ohlc_in")
    val out = rows.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))
      .orderBy(col("day"))
      .select("open", "high", "low", "close", "volume")
      .as[(Double, Double, Double, Double, Long)].collect()
    assert(out(0) == ((3.0, 9.0, 1.0, 5.0, 4L))) // open=id1, close=id4
    assert(out(1) == ((7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("labelBalance: shares sum to 1, entropy bounded by ln(k)") {
    import spark.implicits._
    val out = graft.operators.Similarity.labelBalance(spark, sfDir)
      .as[(Long, Long, Double, Double, Double)].collect()
    val k = out.length
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    val ent = out.head._4
    assert(out.forall(_._4 == ent) && ent > 0 && ent <= math.log(k) + 1e-9)
    assert(out.forall(_._5 >= 1.0))
  }

  test("containment ≡ brute force, including an exactly-on-threshold pair") {
    import spark.implicits._
    // doc 1: 12 tokens -> 10 distinct 3-shingles; doc 2 drops the last
    // token -> shares exactly 9 of them: containment 9/10 = 0.9, ON the
    // τ = 9/10 boundary (the case double-threshold arithmetic loses)
    val w = (1 to 12).map(i => s"w$i")
    val docs = Seq(
      (1L, w.mkString(" ")),
      (2L, w.dropRight(1).mkString(" ")),
      (3L, "totally different content with no overlap at all here"),
      (4L, w.mkString(" ") + " plus trailing extras appended")) // superset of 1
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentOf(docs, 9, 10)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // brute force on distinct shingle sets
    def shingles(t: String): Set[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val m = Seq(1L, 2L, 3L, 4L)
      .map(i => i -> shingles(docs.filter(col("doc_id") === i)
        .head.getString(1))).toMap
    val want = (for {
      i <- m.keys; j <- m.keys if i != j && m(i).nonEmpty
      common = (m(i) & m(j)).size
      if common * 10 >= 9 * m(i).size
    } yield (i, j)).toSet
    assert(got == want)
    assert(got.contains((2L, 1L)), "exact-boundary 0.9 pair must survive")
    assert(got.contains((1L, 4L)), "doc contained in its superset")
    assert(!got.contains((4L, 1L)), "containment is asymmetric")
  }

  test("applyChanges ∘ tableDiff reproduces the target snapshot exactly") {
    import spark.implicits._
    val a = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d"))
      .toDF("k", "x", "y")
    val b = Seq((1L, 10L, "a"), (2L, 99L, "b"), (4L, 40L, "D4"), (5L, 50L, "e"))
      .toDF("k", "x", "y") // 3 removed, 2+4 changed, 5 added, 1 untouched
    val diff = graft.operators.Reconcile.tableDiff(a, b, "k", Seq("x", "y"))
    val changes = diff.select(col("k"),
      when(col("change") === "added", "I")
        .when(col("change") === "removed", "D").otherwise("U").as("op"),
      col("val_b.x").as("x"), col("val_b.y").as("y"))
    val merged = graft.operators.Reconcile
      .applyChanges(a, changes, "k", Seq("x", "y"))
      .as[(Long, Long, String)].collect().toSet
    assert(merged == b.as[(Long, Long, String)].collect().toSet)
  }

  test("fingerprint: identical tables match, one changed row flips one bucket") {
    import spark.implicits._
    val base = (1L to 300L).map(i => (i, i % 7, s"S${i % 3}"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val fp = graft.operators.Reconcile
      .fingerprint(base, "o_orderkey", Seq("o_custkey", "o_orderstatus"))
      .as[(Long, Long, Long)].collect().toSeq
    val fp2 = graft.operators.Reconcile
      .fingerprint(base.orderBy(rand(42)), // layout-independence
        "o_orderkey", Seq("o_custkey", "o_orderstatus"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(fp == fp2)
    val mutated = base.withColumn("o_custkey",
      when(col("o_orderkey") === 123L, lit(999L)).otherwise(col("o_custkey")))
    val fp3 = graft.operators.Reconcile
      .fingerprint(mutated, "o_orderkey", Seq("o_custkey", "o_orderstatus"))
      .as[(Long, Long, Long)].collect().toSeq
    val diff = fp.toSet.diff(fp3.toSet)
    assert(diff.size == 1, s"expected exactly one flipped bucket, got $diff")
    // counts unchanged — only the content hash moves
    assert(fp.map(r => (r._1, r._2)) == fp3.map(r => (r._1, r._2)))
  }

  // ---- feature hashing / bigram LM ----

  test("featureHash: buckets in range, counts conserve token totals") {
    import spark.implicits._
    val out = TextAnalysis.featureHash(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(r => r._2 >= 0 && r._2 < 32))
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().filter(_._2 > 0).toMap
    assert(perDoc == want)
  }

  test("bigramLogprob golden: hand-computed conditional NLL") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bigram").toString
    Seq((1L, "a b a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.bigramLogprob(spark, tmp)
      .select($"avg_nll", $"n_bigrams").as[(Double, Long)].collect().toSeq
    // P(b|a)=1/2, P(a|b)=1, P(c|a)=1/2 → (0.693147+0+0.693147)/3
    assert(out == Seq((0.462098, 3L)))
  }

  test("mid-rank Spearman matches the textbook value on a tied golden set") {
    import spark.implicits._
    // x = (1,2,2,4), y = (10,20,20,40): perfectly concordant with ties in
    // the same places on both sides → spearman exactly 1
    val df = Seq((1L, 1L, 1.0, 10.0), (2L, 1L, 2.0, 20.0),
      (3L, 1L, 2.0, 20.0), (4L, 1L, 4.0, 40.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .withColumn("l_returnflag", lit("A"))
    val tmp = java.nio.file.Files.createTempDirectory("spearman").toString
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.q10jSpearman(spark, tmp)
      .select($"spearman").as[Double].collect()
    assert(out.toSeq == Seq(1.0))
  }

  // ---- mergeable sketch cube: KLL quantiles + Theta set algebra ----

  test("KLL quantile rollup: merged day sketches track exact weekly p50/p95") {
    import spark.implicits._
    val events = Tables.t(spark, sfDir, "events")
    val merged = graft.operators.SketchRollup.quantileRollup(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    // exact DISCRETE percentile (smallest value with cum rank ≥ p — the
    // convention KLL's inclusive getQuantile implements; interpolated
    // percentile() would differ by construction, not by sketch error)
    val grouped = events
      .select(unix_micros(date_trunc("week", $"ts")).as("week_us"),
        $"event_type", $"value")
      .as[(Long, String, Double)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, rows) => k -> rows.map(_._3).sorted }
    def disc(vs: Array[Double], p: Double): Double =
      vs(math.ceil(p * vs.length).toInt - 1)
    assert(merged.keySet == grouped.keySet)
    merged.foreach { case (k, (p50, p95)) =>
      val vs = grouped(k)
      // weekly groups at this sf stay below k retained values → the
      // sketch is in exact mode and must return the data value itself
      assert(math.abs(p50 - disc(vs, 0.5)) <= 1e-6,
        s"$k: p50 $p50 vs exact-disc ${disc(vs, 0.5)} (n=${vs.length})")
      assert(math.abs(p95 - disc(vs, 0.95)) <= 1e-6,
        s"$k: p95 $p95 vs exact-disc ${disc(vs, 0.95)} (n=${vs.length})")
    }
    // mergeability contract: day-sketch merge ≡ sketching the week
    // directly (same stream, same k → same compaction decisions here)
    val direct = events
      .groupBy(date_trunc("week", $"ts").as("week"), $"event_type")
      .agg(round(kll_sketch_get_quantile_double(
        kll_sketch_agg_double($"value"), lit(0.5)), 6).as("p50"))
      .select(unix_micros($"week"), $"event_type", $"p50")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    merged.foreach { case (k, (p50, _)) =>
      val d = direct(k)
      assert(math.abs(p50 - d) <= 1e-6,
        s"$k: daily-merge p50 $p50 diverges from direct sketch $d")
    }
  }

  test("theta audience: exact-mode sketch matches definitional set algebra") {
    import spark.implicits._
    val events = Tables.t(spark, sfDir, "events")
    val Array(row) = graft.operators.SketchRollup.thetaAudience(spark, sfDir)
      .collect()
    val a = events.filter($"event_type" === "purchase" && $"value" > 200.0)
      .select($"user_id").distinct().as[Long].collect().toSet
    val b = events.filter($"event_type" === "error" && $"value" > 200.0)
      .select($"user_id").distinct().as[Long].collect().toSet
    // distinct users at this sf (15) ≪ the sketch's 2^12 nominal
    // entries → exact mode: the estimates ARE the set cardinalities
    // (the sf0.01 gate has 150, the sf0.1 bench 1500 — all exact-mode)
    assert(row.getLong(0) == a.size, "big_purchase_users")
    assert(row.getLong(1) == b.size, "big_error_users")
    assert(row.getLong(2) == (a & b).size, "both_users")
    assert(row.getLong(3) == (a -- b).size, "only_purchase_users")
    assert(row.getLong(4) == (a | b).size, "either_users")
    // the segments must be non-trivial or the algebra is vacuous
    assert(a.nonEmpty && b.nonEmpty && (a & b) != a)
  }

  // ---- per-key ordered EWMA / anomaly scan ----

  test("ewma scan: golden recurrence, seed semantics, key reset, anomaly flag") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    // user 1: steady 10s then a spike; user 2 single point (seed only)
    val rows = Seq(
      (1L, ts(0), 10L, "click", 10.0), (1L, ts(1), 11L, "click", 10.0),
      (1L, ts(2), 12L, "click", 12.0), (1L, ts(3), 13L, "click", 10.0),
      (1L, ts(4), 14L, "click", 500.0), // spike ≫ 3σ of prior state
      (2L, ts(5), 20L, "click", 7.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = graft.operators.TimeSeries.ewmaScanOf(rows)
      .collect().sortBy(p => (p.user_id, p.ts_us)).toSeq
    // hand fold (α=0.2): seed 10 → 10 → 10.4 → 10.32 → spike
    val e = out.map(_.ewma)
    assert(math.abs(e(0) - 10.0) < 1e-12 && math.abs(e(1) - 10.0) < 1e-12)
    assert(math.abs(e(2) - 10.4) < 1e-12, s"got ${e(2)}")
    assert(math.abs(e(3) - 10.32) < 1e-12, s"got ${e(3)}")
    assert(out.map(_.is_anomaly) ==
      Seq(false, false, false, false, true, false),
      "only the spike may flag; seeds and the fresh key must not")
    // user 2's seed must not inherit user 1's state
    assert(out.last.ewma == 7.0 && out.last.forecast_dev == 0.0)
  }

  test("ewma scan: result invariant to input partitioning") {
    val events = Tables.t(spark, sfDir, "events")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.ewmaScanOf(df)
        .collect().map(p => (p.user_id, p.event_id) -> (p.ewma, p.is_anomaly))
        .toMap
    val base = run(events)
    val shuffled = run(events.repartition(32,
      org.apache.spark.sql.functions.col("event_id")))
    val single = run(events.coalesce(1))
    assert(base == shuffled && base == single,
      "per-key scan must not depend on the incoming layout")
  }
}
