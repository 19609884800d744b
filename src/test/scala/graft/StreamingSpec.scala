package graft

import graft.queries.Analytics
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming window/state semantics (SURVEY.md §2.3 Q30–Q32) against
  * deterministic MemoryStream replays — the golden tier that replaces the
  * reference's sleep-based harness (SURVEY.md §5.2/§7.4).
  */
class StreamingSpec extends SparkSpecBase {
  import StreamingSpec.Ev

  private def ev(id: Long, t: String, user: Long = 1, typ: String = "click",
      v: Double = 1.0) =
    Ev(id, java.sql.Timestamp.valueOf(t), user, typ, v)

  test("Q30: tumbling window counts, watermark drops late data") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(src.toDF())
      .writeStream.format("memory").queryName("q30s").outputMode("append").start()

    // batch 1: two events in the 00:00 window, one in 00:02 (watermark → 00:01:55)
    src.addData(
      ev(1, "2024-03-01 00:00:10"), ev(2, "2024-03-01 00:00:20"),
      ev(3, "2024-03-01 00:02:10"))
    q.processAllAvailable()
    // batch 2: a late event for the already-finalized 00:00 window (dropped)
    // plus an advancer that pushes the watermark past 00:03
    src.addData(ev(4, "2024-03-01 00:00:30"), ev(5, "2024-03-01 00:04:00"))
    q.processAllAvailable()
    // batch 3: advance far enough to flush the 00:02 window
    src.addData(ev(6, "2024-03-01 00:09:00"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("q30s")
      .select($"w_start".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    assert(out("2024-03-01 00:00:00") == 2L) // late event 4 NOT counted
    assert(out("2024-03-01 00:02:00") == 1L)
    // LATE-DATA OBSERVABILITY (r13): the drop is not silent — Spark's
    // per-stateful-operator watermark-drop metric surfaces it through
    // StreamingQueryProgress, summed by lateDropsOf (event 4, exactly)
    assert(StreamingOps.lateDropsOf(q) == 1L,
      s"late-drop counter: ${StreamingOps.lateDropsOf(q)}")
  }

  test("Q31: session windows merge events within the 30s gap") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.sessionCounts(src.toDF())
      .writeStream.format("memory").queryName("q31s").outputMode("append").start()
    src.addData(
      ev(1, "2024-03-01 00:00:00", user = 7),
      ev(2, "2024-03-01 00:00:20", user = 7),  // merges (gap 20s < 30s)
      ev(3, "2024-03-01 00:01:30", user = 7))  // new session (gap 70s)
    q.processAllAvailable()
    src.addData(ev(9, "2024-03-01 01:00:00", user = 8)) // watermark flush
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("q31s")
      .select($"user_id", $"w_start".cast("string"), $"w_end".cast("string"), $"cnt")
      .as[(Long, String, String, Long)].collect().filter(_._1 == 7L).sortBy(_._2)
    assert(sessions.toSeq == Seq(
      (7L, "2024-03-01 00:00:00", "2024-03-01 00:00:50", 2L),
      (7L, "2024-03-01 00:01:30", "2024-03-01 00:02:00", 1L)))
  }

  test("Q32: stateful dedup keeps first occurrence per event_id") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.dedupStream(src.toDF())
      .writeStream.format("memory").queryName("q32s").outputMode("append").start()
    src.addData(
      ev(1, "2024-03-01 00:00:01", v = 1.0),
      ev(1, "2024-03-01 00:00:02", v = 99.0), // same id, same batch → dropped
      ev(2, "2024-03-01 00:00:03", v = 2.0))
    q.processAllAvailable()
    src.addData(ev(1, "2024-03-01 00:00:04", v = 98.0)) // dup across batches
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("q32s").as[Ev].collect().sortBy(_.event_id)
    assert(rows.map(_.event_id).toSeq == Seq(1L, 2L))
    assert(rows.head.value == 1.0) // first occurrence won
  }

  test("stream-stream interval join matches clicks to purchases within 30s") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingOps.intervalJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    clicks.addData(
      ev(1, "2024-03-01 00:00:00", user = 1),
      ev(2, "2024-03-01 00:01:00", user = 2))
    purchases.addData(
      ev(10, "2024-03-01 00:00:20", user = 1),  // 20s after click 1 → match
      ev(11, "2024-03-01 00:02:00", user = 2),  // 60s after click 2 → no match
      ev(12, "2024-03-01 00:00:10", user = 3))  // no click → no match
    q.processAllAvailable()
    // advance both watermarks so state is flushed
    clicks.addData(ev(99, "2024-03-01 01:00:00", user = 90))
    purchases.addData(ev(98, "2024-03-01 01:00:00", user = 91))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssj").select($"click_id", $"purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("window join matches same-window pairs and misses across the boundary") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingOps.windowJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("wjoin")
      .outputMode("append").start()
    clicks.addData(
      ev(1, "2024-03-01 00:00:10", user = 1),
      ev(2, "2024-03-01 00:00:59", user = 2))
    purchases.addData(
      ev(10, "2024-03-01 00:00:50", user = 1), // same minute window → match
      // 2s after click 2 but the NEXT window — the boundary semantics
      // that distinguish window joins from interval joins
      ev(11, "2024-03-01 00:01:01", user = 2),
      ev(12, "2024-03-01 00:00:30", user = 3)) // no click → no match
    q.processAllAvailable()
    clicks.addData(ev(99, "2024-03-01 01:00:00", user = 90))
    purchases.addData(ev(98, "2024-03-01 01:00:00", user = 91))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wjoin").select($"click_id", $"purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)),
      "only the same-window pair may join; the cross-boundary 2s pair must miss")
  }

  test("window dedup stream: in-order replay equals the batch window winner") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.windowDedupStream(src.toDF(), "1 minute")
      .writeStream.format("memory").queryName("wdedup")
      .outputMode("append").start()
    src.addData(
      ev(1, "2024-03-01 00:00:10", user = 1),  // first in (u1, w0) → kept
      ev(2, "2024-03-01 00:00:40", user = 1))  // same window → dropped
    q.processAllAvailable()
    src.addData(
      ev(3, "2024-03-01 00:00:50", user = 1),  // (u1, w0) marker held across seam
      ev(4, "2024-03-01 00:01:10", user = 1),  // next window → kept
      ev(5, "2024-03-01 00:00:30", user = 2))  // other key, w0 → kept
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wdedup")
      .select($"user_id", $"first_event_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (1L, 4L), (2L, 5L)),
      s"got $got — one winner per (key, window), marker survives the seam")
    // batch twin on the same (in-order) input picks identical winners
    val batch = Seq(
      (1L, "2024-03-01 00:00:10"), (1L, "2024-03-01 00:00:40"),
      (1L, "2024-03-01 00:00:50"), (1L, "2024-03-01 00:01:10"),
      (2L, "2024-03-01 00:00:30"))
      .zipWithIndex.map { case ((u, t), i) =>
        ((i + 1).toLong, java.sql.Timestamp.valueOf(t), u, "click", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    batch.createOrReplaceTempView("wd_batch_in")
    import org.apache.spark.sql.functions.{min, struct, unix_micros, window => fwindow}
    val batchWinners = batch
      .groupBy(fwindow($"ts", "1 minute"), $"user_id")
      .agg(min(struct(unix_micros($"ts"), $"event_id")).as("f"))
      .select($"user_id", $"f.event_id".as("first_event_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == batchWinners,
      "in-order streaming winners must equal the batch min-struct winners")
  }

  test("left-outer interval join emits null-padded rows at watermark expiry") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingOps.intervalJoinLeftOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    clicks.addData(
      ev(1, "2024-03-01 00:00:00", user = 1),
      ev(2, "2024-03-01 00:01:00", user = 2))
    purchases.addData(
      ev(10, "2024-03-01 00:00:20", user = 1),  // 20s after click 1 → match
      ev(11, "2024-03-01 00:02:00", user = 2))  // 60s after click 2 → outside window
    q.processAllAvailable()
    // advance both watermarks past every click's interval end so the
    // engine can prove click 2 is unmatched and emit its null row
    clicks.addData(ev(99, "2024-03-01 01:00:00", user = 90))
    purchases.addData(ev(98, "2024-03-01 01:00:00", user = 91))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssjo").select($"click_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toSet
    // click 1 matched; click 2 emitted with null purchase (outer semantics)
    assert(out.contains((1L, Some(10L))) && out.contains((2L, None)))
    assert(!out.exists { case (c, p) => c == 2L && p.isDefined })
  }

  test("upsert sink: tombstones delete, block late stale rows, allow resurrection") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert-ts").toString + "/state"
    val src = MemoryStream[Ev]
    val withFlag = src.toDF()
      .withColumn("deleted",
        org.apache.spark.sql.functions.col("event_type") === "del")
    val q = StreamingOps.upsertSink(withFlag, dir, key = "user_id",
      tsCol = "ts", tombstoneCol = Some("deleted"))
    src.addData(
      ev(1, "2024-03-01 00:00:01", user = 1, v = 10.0),
      ev(2, "2024-03-01 00:00:01", user = 2, v = 20.0),
      ev(3, "2024-03-01 00:00:01", user = 3, v = 30.0))
    q.processAllAvailable()
    src.addData(
      ev(4, "2024-03-01 00:00:05", user = 1, typ = "del"),  // delete user 1
      ev(5, "2024-03-01 00:00:00", user = 2, typ = "del"),  // older than state → loses
      ev(6, "2024-03-01 00:00:05", user = 3, typ = "del"))  // delete user 3
    q.processAllAvailable()
    src.addData(
      ev(7, "2024-03-01 00:00:09", user = 1, v = 12.0), // newer insert resurrects
      ev(8, "2024-03-01 00:00:03", user = 3, v = 99.0)) // LATE pre-delete row: must NOT resurrect
    q.processAllAvailable()
    q.stop()
    val live = StreamingOps.upsertLiveView(spark, dir, Some("deleted"))
      .select($"user_id", $"event_id", $"value").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // user 1 deleted then resurrected by the newer row; user 2's stale
    // tombstone lost the ts race; user 3 stays deleted because the
    // retained tombstone (ts=5) outranks the late update (ts=3)
    assert(live == Map(1L -> (7L, 12.0), 2L -> (2L, 20.0)))
    // the retained marker itself is still in raw state for user 3
    val raw = spark.read.parquet(dir).filter($"user_id" === 3L)
      .select($"event_id", $"deleted").as[(Long, Boolean)].collect().toSeq
    assert(raw == Seq((6L, true)))
  }

  test("incremental dedup over a replay equals the batch minhash pairs") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val stateDir = base + "/state"; val outDir = base + "/pairs"
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val src = MemoryStream[(Long, String)]
    val q = graft.operators.IncrementalDedup.stream(
      src.toDF().toDF("doc_id", "text"), stateDir, outDir)
    // three micro-batches over disjoint id ranges
    docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
      src.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val incremental = graft.operators.IncrementalDedup
      .emittedPairs(spark, outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.Dedup
      .minhashLshPairs(graft.Tables.t(spark, sfDir, "documents"), 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incremental == batch)
    assert(batch.nonEmpty) // corpus has planted near-dups
  }

  test("temporal enrichment joins each event to the dim version at its event time") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // versioned dimension: user 1 upgrades bronze → gold at 00:05
    val dim = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 100L, "bronze"),
      (1L, java.sql.Timestamp.valueOf("2024-03-01 00:05:00"), 101L, "gold"))
      .toDF("user_id", "ts", "ver", "tier")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[String])]
    val src = MemoryStream[Ev]
    val q = StreamingOps.temporalEnrich(src.toDF(), () => dim,
      key = "user_id", tsCol = "ts", payload = Seq("tier"), tiebreak = "ver") { b =>
      b.select($"event_id", $"tier").as[(Long, Option[String])].collect()
        .foreach(out.add)
    }
    src.addData(ev(1, "2024-03-01 00:03:00", user = 1))  // before upgrade
    q.processAllAvailable()
    src.addData(
      ev(2, "2024-03-01 00:07:00", user = 1),            // after upgrade
      ev(3, "2024-03-01 00:03:30", user = 1),            // late event → still bronze
      ev(4, "2024-03-01 00:01:00", user = 9))            // unknown user → null
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(out.asScala.toMap == Map(
      1L -> Some("bronze"), 2L -> Some("gold"),
      3L -> Some("bronze"), 4L -> None))
  }

  test("incremental dedup batch retry is idempotent (same output, no self-pairs)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-incdedup-retry").toString
    val stateDir = base + "/state"; val outDir = base + "/pairs"
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").limit(200).cache()
    def emitted() = graft.operators.IncrementalDedup.emittedPairs(spark, outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    graft.operators.IncrementalDedup.processBatch(docs, 0L, stateDir, outDir)
    val first = emitted()
    // simulate a foreachBatch retry: same batch id, state already written
    graft.operators.IncrementalDedup.processBatch(docs, 0L, stateDir, outDir)
    val second = emitted()
    assert(second == first, "retry changed the emitted pair set")
    assert(!second.exists(p => p._1 == p._2), "self-pair leaked on retry")
    docs.unpersist()
  }

  test("transformWithState: ValueState accumulates per-user spend across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // transformWithState needs column families → RocksDB provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[(Long, Double)]
      val q = StreamingOps.runningUserSpend(src.toDS())
        .writeStream.format("memory").queryName("tws").outputMode("update").start()
      src.addData((1L, 10.0), (1L, 5.0), (2L, 7.0))
      q.processAllAvailable()
      src.addData((1L, 1.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws").as[StreamingOps.UserSpend].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n) }
      assert(last(1L).total == 16.0 && last(1L).n == 3)
      assert(last(2L).total == 7.0 && last(2L).n == 1)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-static enrichment join broadcasts the dimension") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val src = MemoryStream[Ev]
    val q = StreamingOps.enrich(src.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    src.addData(ev(1, "2024-03-01 00:00:01", user = 1),
      ev(2, "2024-03-01 00:00:02", user = 3)) // no dim row → null tier
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enr").select($"event_id", $"tier")
      .as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("gold"), 2L -> None))
  }

  test("upsert sink maintains latest-row-per-key across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/state"
    val src = MemoryStream[Ev]
    val q = StreamingOps.upsertSink(src.toDF(), dir, key = "user_id", tsCol = "ts")
    src.addData(
      ev(1, "2024-03-01 00:00:01", user = 1, v = 10.0),
      ev(2, "2024-03-01 00:00:02", user = 2, v = 20.0))
    q.processAllAvailable()
    src.addData(
      ev(3, "2024-03-01 00:00:05", user = 1, v = 11.0), // newer → replaces
      ev(4, "2024-03-01 00:00:01", user = 2, v = 99.0)) // older than state → ignored
    q.processAllAvailable()
    q.stop()
    val state = spark.read.parquet(dir).as[Ev].collect()
      .map(e => e.user_id -> (e.event_id, e.value)).toMap
    assert(state == Map(1L -> (3L, 11.0), 2L -> (2L, 20.0)))
  }

  test("foreachBatch: batchId-partitioned parquet sink is replay-idempotent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-fes").toString
    val src = MemoryStream[Ev]
    // exactly-once-by-idempotence: each micro-batch overwrites its own
    // batch_id partition, so a replayed batch rewrites identical data
    // instead of duplicating it
    def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(dir)
    val q = src.toDF().writeStream.foreachBatch(write _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-fes-ck").toString)
      .start()
    src.addData(ev(1, "2024-03-01 00:00:01"), ev(2, "2024-03-01 00:00:02"))
    q.processAllAvailable()
    src.addData(ev(3, "2024-03-01 00:00:03"))
    q.processAllAvailable()
    q.stop()
    val once = spark.read.parquet(dir)
    assert(once.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // simulate a batch replay (same batchId, same data) → no duplicates
    write(Seq(ev(3, "2024-03-01 00:00:03")).toDF(), batchId = 1L)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("mapGroupsWithState: running per-user counts accumulate across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[(Long, Long)]
    val q = StreamingOps.runningUserCounts(src.toDS())
      .writeStream.format("memory").queryName("mgs").outputMode("update").start()
    src.addData((1L, 1L), (1L, 2L), (2L, 1L))
    q.processAllAvailable()
    src.addData((1L, 3L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("mgs").as[StreamingOps.UserCount].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.map(_.n).max }
    assert(last == Map(1L -> 3L, 2L -> 1L))
  }

  test("timerSessions: sessions close exactly once when the watermark passes") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[Ev]
      val q = StreamingOps.timerSessions(src.toDF())
        .writeStream.format("memory").queryName("tsn").outputMode("append").start()
      // user 1: two events 10 s apart (one session); user 2: one event
      src.addData(ev(1, "2024-03-01 00:00:00", user = 1),
        ev(2, "2024-03-01 00:00:10", user = 1),
        ev(3, "2024-03-01 00:00:05", user = 2))
      q.processAllAvailable()
      // nothing closed yet: watermark hasn't passed end + gap
      assert(spark.table("tsn").count() == 0)
      // advance the watermark far past both sessions' close
      src.addData(ev(9, "2024-03-01 00:05:00", user = 3))
      q.processAllAvailable()
      src.addData(ev(10, "2024-03-01 00:10:00", user = 3))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("tsn").as[StreamingOps.ClosedSession].collect()
        .filter(s => s.user_id == 1 || s.user_id == 2)
      def ms(t: String) = java.sql.Timestamp.valueOf(t).getTime
      assert(out.count(_.user_id == 1) == 1, s"user 1 closed once: ${out.toSeq}")
      val s1 = out.find(_.user_id == 1).get
      assert(s1.start_ms == ms("2024-03-01 00:00:00") &&
        s1.end_ms == ms("2024-03-01 00:00:10") && s1.n_events == 2)
      val s2 = out.find(_.user_id == 2).get
      assert(s2.start_ms == s2.end_ms && s2.n_events == 1)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("heavyHitterStream: live MG state bounded at k, supersets true heavies") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // skewed corpus: "whale" dominates, "big" heavy, long noise tail
      val batch1 = Seq.fill(40)("whale") ++ Seq.fill(15)("big") ++
        (1 to 25).map(i => s"noise$i")
      val batch2 = Seq.fill(30)("whale") ++ Seq.fill(10)("big") ++
        (26 to 45).map(i => s"noise$i")
      val k = 8; val shards = 4
      val src = MemoryStream[String]
      val q = StreamingOps.heavyHitterStream(src.toDS(), k, shards)
        .writeStream.format("memory").queryName("hhs").outputMode("update").start()
      src.addData(batch1: _*)
      q.processAllAvailable()
      src.addData(batch2: _*)
      q.processAllAvailable()
      q.stop()
      val all = spark.table("hhs")
        .as[StreamingOps.ShardCandidates].collect()
      // latest emission per (shard, token): sticky Update-mode history
      // also contains batch-1 snapshots; state size bound applies to the
      // FINAL state, which the last emission per shard reflects
      val n = (batch1 ++ batch2).size.toLong
      val tokens = all.map(_.token).toSet
      // MG superset guarantee applied to the whole stream: any token with
      // global freq > n/(k+1) must survive in its shard's candidate set
      val freqs = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size.toLong)
      freqs.filter(_._2 > n / (k + 1)).keys.foreach { t =>
        assert(tokens.contains(t), s"true heavy hitter $t missing")
      }
      // per-shard final candidate sets stay bounded at k
      val finalPerShard = all.groupBy(_.shard)
      finalPerShard.foreach { case (_, rows) =>
        val lastTokens = rows.map(_.token).distinct
        assert(lastTokens.size <= 2 * k, "candidate churn exceeded 2k distinct")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("ewma stream: flags across a batch split are bit-identical to the batch scan") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // user 1: steady then spike (the spike lands in batch 2, so its
      // flag depends entirely on state carried across the batch seam);
      // user 2 seeds in batch 2
      val series = Seq(
        (1L, 1000L, 10L, 10.0), (1L, 2000L, 11L, 10.0),
        (1L, 3000L, 12L, 12.0), (1L, 4000L, 13L, 10.0),
        (1L, 5000L, 14L, 500.0), (2L, 6000L, 20L, 7.0))
      val src = MemoryStream[(Long, Long, Long, Double)]
      val lateDrops = spark.sparkContext.longAccumulator("ewma_late")
      val q = StreamingOps.ewmaStream(src.toDS(),
          lateCounter = Some(lateDrops))
        .writeStream.format("memory").queryName("ewmas")
        .outputMode("update").start()
      src.addData(series.take(3): _*)
      q.processAllAvailable()
      // the late row (ts below batch 1's folded prefix) must be DROPPED,
      // not folded out of order into the carried state
      src.addData(series.drop(3) :+ (1L, 1500L, 99L, 1000.0): _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("ewmas").as[StreamingOps.EwmaFlag].collect()
        .map(f => (f.user_id, f.event_id) -> (f.ewma, f.is_anomaly)).toMap
      assert(!streamed.contains((1L, 99L)),
        "out-of-order row must not be emitted")
      assert(lateDrops.value == 1L,
        s"late-drop counter must see the folded-prefix drop: " +
          s"${lateDrops.value}")
      // batch twin over the concatenated series
      val batchDf = series
        .map { case (u, ts, id, v) =>
          (u, new java.sql.Timestamp(ts), id, "click", v) }
        .toDF("user_id", "ts", "event_id", "event_type", "value")
      val batch = graft.operators.TimeSeries.ewmaScanOf(batchDf).collect()
        .map(p => (p.user_id, p.event_id) -> (p.ewma, p.is_anomaly)).toMap
      assert(streamed == batch,
        "live flags must equal the batch scan on the same prefix")
      assert(streamed((1L, 14L))._2, "the spike must flag mid-stream")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("cusum stream: alarms across a batch split are bit-identical to the batch scan") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    // drift accumulates in batch 1, CROSSES in batch 1 (alarm+reset),
    // re-accumulates across the seam; the below-target side seeds in
    // batch 2; a late row must be dropped, not folded
    val series = Seq(
      (1L, 1000L, 10L, 90.0), (1L, 2000L, 11L, 90.0), // sp 30, 60 > 50 → alarm
      (1L, 3000L, 12L, 90.0),                         // sp 30 (restarted test)
      (2L, 4000L, 20L, 10.0))                         // sn 30
    val src = MemoryStream[(Long, Long, Long, Double)]
    val q = StreamingOps.cusumStream(src.toDS(), mu = 50.0, kappa = 10.0,
        h = 50.0)
      .writeStream.format("memory").queryName("cusums")
      .outputMode("update").start()
    src.addData(series.take(2): _*)
    q.processAllAvailable()
    src.addData(series.drop(2) :+ (1L, 1500L, 99L, 1000.0): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cusums").as[StreamingOps.CusumFlag].collect()
      .map(f => (f.user_id, f.event_id) -> (f.sp_raw, f.sn_raw, f.alarmed))
      .toMap
    assert(!streamed.contains((1L, 99L)), "out-of-order row must not emit")
    val batchDf = series
      .map { case (u, ts, id, v) =>
        (u, new java.sql.Timestamp(ts), id, "click", v) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val batch = graft.operators.TimeSeries
      .cusumScanOf(batchDf, mu = 50.0, kappa = 10.0, h = 50.0).collect()
      .map(p => (p.user_id, p.event_id) -> (p.sp_raw, p.sn_raw, p.alarmed))
      .toMap
    assert(streamed == batch,
      "live flags must equal the batch scan on the same prefix")
    assert(streamed((1L, 11L))._3, "the crossing must alarm mid-stream")
    assert(streamed((1L, 12L))._1 == 30.0,
      "post-alarm restart must carry the RESET state across the seam")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("window top-N stream: top-2 emitted once at window close; late rows dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val inOrder = Seq(
        ev(1, "2024-03-01 00:01:00"), ev(2, "2024-03-01 00:02:00"),
        ev(3, "2024-03-01 00:03:00"), // 3 clicks
        ev(4, "2024-03-01 00:04:00", typ = "view"),
        ev(5, "2024-03-01 00:05:00", typ = "view"), // 2 views
        ev(6, "2024-03-01 00:06:00", typ = "purchase"))
      val advancer = ev(7, "2024-03-01 00:20:00")
      val src = MemoryStream[Ev]
      val lateDrops = spark.sparkContext.longAccumulator("wtopn_late")
      val q = StreamingOps.windowTopNStream(src.toDF(),
          lateCounter = Some(lateDrops))
        .writeStream.format("memory").queryName("wtopn")
        .outputMode("append").start()
      src.addData(inOrder: _*)
      q.processAllAvailable()
      // Flink Window Top-N semantics: nothing before the window closes
      assert(spark.table("wtopn").count() == 0,
        "emitted before the watermark closed the window")
      // watermark past 00:10 → the 00:00 window emits its ranked top-2
      src.addData(advancer)
      q.processAllAvailable()
      val afterClose = spark.table("wtopn")
        .as[StreamingOps.WindowTopN].collect().toSet
      assert(afterClose.nonEmpty, "window close emitted nothing")
      // a late row for the closed window: dropped — no re-emission, no
      // state revival, ranks unchanged
      src.addData(ev(8, "2024-03-01 00:07:00", typ = "view"))
      q.processAllAvailable()
      q.stop()
      val fin = spark.table("wtopn").as[StreamingOps.WindowTopN].collect()
      assert(fin.length == afterClose.size && fin.toSet == afterClose,
        "late row changed an already-emitted window")
      // and the drop is OBSERVABLE: exactly the one late row counted
      assert(lateDrops.value == 1L,
        s"late-drop counter must see the dropped row: ${lateDrops.value}")
      // batch twin on the in-order rows: same per-window ranking
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("w_start_us"))
        .orderBy(col("cnt").desc, col("event_type"))
      val expected = (inOrder :+ advancer).toDF()
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("event_type"), col("cnt"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
      val closedW = afterClose.map(_.w_start_us).min
      val expClosed = expected.filter(col("w_start_us") === closedW)
        .select(col("w_start_us"), col("rk").cast("long"), col("event_type"),
          col("cnt"))
        .as[(Long, Long, String, Long)].collect()
        .map(r => StreamingOps.WindowTopN(r._1, r._2, r._3, r._4)).toSet
      assert(afterClose == expClosed,
        s"streamed $afterClose != batch twin $expClosed")
      // the closed window really ranked click(3) over view(2)
      assert(afterClose.toSeq.sortBy(_.rk).map(t => (t.event_type, t.cnt))
        == Seq(("click", 3L), ("view", 2L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("topN stream: latest version per group equals the batch top-N; no-change batches are silent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // (group, id, value); batch 2 reshuffles group 1's podium and
      // leaves group 2 unchanged (its rows are strictly worse)
      val b1 = Seq((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 7.0),
        (2L, 20L, 3.0), (2L, 23L, 2.0))
      val b2 = Seq((1L, 13L, 8.0), (2L, 21L, 1.0), (2L, 22L, 0.5))
      val src = MemoryStream[(Long, Long, Double)]
      val q = StreamingOps.topNStream(src.toDS(), n = 2)
        .writeStream.format("memory").queryName("topn")
        .outputMode("update").start()
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val all = spark.table("topn").as[StreamingOps.RankedEntry].collect()
      // group 2's batch-2 rows never entered its top-2: no new version
      assert(all.filter(_.group == 2L).map(_.ver).max == 1L,
        "an unchanged ranking must emit nothing")
      // latest version per group == batch top-N over the full replay
      val latest = all.groupBy(_.group).map { case (g, rows) =>
        val v = rows.map(_.ver).max
        g -> rows.filter(_.ver == v).sortBy(_.rk).map(r => (r.id, r.value)).toSeq
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_1")).orderBy(col("_3").desc, col("_2"))
      val expected = (b1 ++ b2).toDF()
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
        .select(col("_1"), col("_2"), col("_3"), col("rk"))
        .as[(Long, Long, Double, Int)].collect()
        .groupBy(_._1).map { case (g, rows) =>
          g -> rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq }
      assert(latest == expected, s"live $latest != batch $expected")
      // the podium reshuffle really versioned: 13 displaced 12
      assert(latest(1L) == Seq((11L, 9.0), (13L, 8.0)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("over-window stream: per-event RANGE aggregates equal the batch frame, ties included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val M = 60000000L // one minute in micros
      // (user, ts_us, id, value): a same-timestamp TIE at 5m — each of
      // the tied rows must see the OTHER in its aggregate (the batch
      // RANGE-frame peer semantics only decidable at watermark passage)
      val series = Seq(
        (7L, 0 * M, 1L, 10.0), (7L, 5 * M, 2L, 20.0), (7L, 5 * M, 3L, 5.0),
        (7L, 12 * M, 4L, 1.0))
      val src = MemoryStream[(Long, Long, Long, Double)]
      val q = StreamingOps.overWindowStream(src.toDS(), windowUs = 10 * M)
        .writeStream.format("memory").queryName("overw")
        .outputMode("append").start()
      src.addData(series: _*)
      q.processAllAvailable()
      src.addData((8L, 30 * M, 90L, 0.0)) // watermark advancer
      q.processAllAvailable()
      src.addData((8L, 31 * M, 91L, 0.0)) // flush the 12m instant
      q.processAllAvailable()
      val afterFlush = spark.table("overw").as[StreamingOps.OverAgg]
        .collect().filter(_.user_id == 7L)
        .map(o => o.event_id -> (o.sum_w, o.cnt_w)).toMap
      // a late row below the watermark: dropped, nothing re-emits
      src.addData((7L, 1 * M, 9L, 99.0))
      q.processAllAvailable()
      q.stop()
      val fin = spark.table("overw").as[StreamingOps.OverAgg]
        .collect().filter(_.user_id == 7L)
      assert(fin.length == afterFlush.size && !fin.exists(_.event_id == 9L),
        "late row must not emit or mutate history")
      // batch twin: the RANGE frame over the same in-order rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_1")).orderBy(col("_2"))
        .rangeBetween(-10 * M, 0)
      val expected = series.toDF()
        .withColumn("sum_w", sum(col("_4")).over(w))
        .withColumn("cnt_w", count(lit(1)).over(w))
        .select(col("_3"), col("sum_w"), col("cnt_w"))
        .as[(Long, Double, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(afterFlush == expected,
        s"streamed $afterFlush != batch frame $expected")
      // the tie really aggregated both peers, and the 12m window really
      // slid past the 0m row
      assert(afterFlush(2L) == ((35.0, 3L)) && afterFlush(3L) == ((35.0, 3L)))
      assert(afterFlush(4L) == ((26.0, 3L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("attribution stream: credits across a batch seam match the batch last-touch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val M = 60000000L // one minute in micros
      // user 1: click, purchase (credit click), then the CARRIED click
      // credits a second purchase in batch 2; user 2 purchases with no
      // touch (no live emission; batch reports null credit)
      val series = Seq(
        (1L, 1 * M, 10L, "click"), (1L, 2 * M, 11L, "purchase"),
        (2L, 3 * M, 20L, "purchase"),
        (1L, 4 * M, 12L, "purchase"), (1L, 5 * M, 13L, "view"),
        (1L, 6 * M, 14L, "purchase"))
      val src = MemoryStream[(Long, Long, Long, String)]
      val q = StreamingOps.attributionStream(src.toDS())
        .writeStream.format("memory").queryName("credits")
        .outputMode("update").start()
      src.addData(series.take(3): _*)
      q.processAllAvailable()
      src.addData(series.drop(3): _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("credits").as[StreamingOps.TouchCredit]
        .collect()
        .map(c => c.purchase_id ->
          (c.last_touch_id, c.last_touch_type, c.last_touch_latency_us))
        .toMap
      // batch twin: last-touch columns of the attribution operator
      val batchDf = series.map { case (u, ts, id, tpe) =>
        (u, new java.sql.Timestamp(ts / 1000), id, tpe) }
        .toDF("user_id", "ts", "event_id", "event_type")
      val batch = Analytics
        .touchAttributionOf(batchDf, windowUs = 7L * 24 * 3600 * 1000000L)
        .collect()
        .filter(!_.isNullAt(5))
        .map(r => r.getLong(1) -> (r.getLong(5), r.getString(6), r.getLong(7)))
        .toMap
      assert(streamed == batch,
        s"live credits $streamed must equal batch last-touch $batch")
      assert(!streamed.contains(20L), "touchless purchase emits nothing live")
      assert(streamed(12L)._1 == 10L,
        "the touch must carry across the batch seam")
      assert(streamed(14L)._1 == 13L, "a newer touch must replace it")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("over-window stream: idle-key row between frontier and watermark drops") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val M = 60000000L
      val src = MemoryStream[(Long, Long, Long, Double)]
      val lateDrops = spark.sparkContext.longAccumulator("over_late")
      val q = StreamingOps.overWindowStream(src.toDS(), windowUs = 10 * M,
          lateCounter = Some(lateDrops))
        .writeStream.format("memory").queryName("overidle")
        .outputMode("append").start()
      // key 7 emits at 0m and 5m, then sits IDLE while key 8 drives the
      // watermark far ahead
      src.addData((7L, 0 * M, 1L, 10.0), (7L, 5 * M, 2L, 20.0))
      q.processAllAvailable()
      src.addData((8L, 40 * M, 90L, 0.0))
      q.processAllAvailable()
      src.addData((8L, 41 * M, 91L, 0.0)) // flush 40m; wm ≈ 41m − 5s
      q.processAllAvailable()
      // key 7's drained frontier is 5m but the WATERMARK is ~41m: a row
      // at 20m is between them. Its in-range state (nothing above 10m)
      // is already evicted — the pre-fix processor accepted it and later
      // emitted an undercounted aggregate; the contract says drop.
      src.addData((7L, 20 * M, 50L, 123.0))
      q.processAllAvailable()
      src.addData((8L, 60 * M, 92L, 0.0)) // would flush 20m if buffered
      q.processAllAvailable()
      src.addData((8L, 61 * M, 93L, 0.0))
      q.processAllAvailable()
      q.stop()
      val k7 = spark.table("overidle").as[StreamingOps.OverAgg]
        .collect().filter(_.user_id == 7L).map(_.event_id).toSet
      assert(k7 == Set(1L, 2L),
        s"row below the watermark on an idle key must drop, got $k7")
      assert(lateDrops.value == 1L,
        s"late-drop counter must see the idle-key drop: ${lateDrops.value}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("topN stream: append contract — re-arriving id and duplicate rows are separate records") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[(Long, Long, Double)]
      val q = StreamingOps.topNStream(src.toDS(), n = 3)
        .writeStream.format("memory").queryName("topnappend")
        .outputMode("update").start()
      // group 1: id 10 arrives twice with different values (two records,
      // Flink append semantics: BOTH rank); group 2: the identical row
      // twice in one batch (two records too — no set-collapse)
      src.addData((1L, 10L, 5.0), (2L, 20L, 3.0), (2L, 20L, 3.0))
      q.processAllAvailable()
      src.addData((1L, 10L, 7.0))
      q.processAllAvailable()
      q.stop()
      val all = spark.table("topnappend").as[StreamingOps.RankedEntry]
        .collect()
      val latest1 = {
        val v = all.filter(_.group == 1L).map(_.ver).max
        all.filter(r => r.group == 1L && r.ver == v).sortBy(_.rk)
          .map(r => (r.id, r.value)).toSeq
      }
      assert(latest1 == Seq((10L, 7.0), (10L, 5.0)),
        s"re-arriving id must occupy two ranks (append stream): $latest1")
      val latest2 = {
        val v = all.filter(_.group == 2L).map(_.ver).max
        all.filter(r => r.group == 2L && r.ver == v).sortBy(_.rk)
          .map(r => (r.id, r.value)).toSeq
      }
      assert(latest2 == Seq((20L, 3.0), (20L, 3.0)),
        s"duplicate rows are distinct records (append stream): $latest2")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("changelog source: I/U/D replay keeps the aggregate correct under retraction") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingOps.ChangeOp
      // group 10: insert two ids, then UPDATE one (value replaced, count
      // unchanged) and DELETE the other (value retracted, count down),
      // plus a fresh insert; group 11: everything deleted → (0, 0);
      // a D for an id never seen is an idempotent no-op
      val b1 = Seq(
        ChangeOp("I", 1L, 10L, 1L, 500L), ChangeOp("I", 2L, 10L, 2L, 700L),
        ChangeOp("I", 3L, 11L, 9L, 300L))
      val b2 = Seq(
        ChangeOp("U", 4L, 10L, 1L, 600L), ChangeOp("D", 5L, 10L, 2L, 0L),
        ChangeOp("I", 6L, 10L, 3L, 200L),
        ChangeOp("D", 7L, 11L, 9L, 0L), ChangeOp("D", 8L, 11L, 42L, 0L))
      val src = MemoryStream[ChangeOp]
      val q = StreamingOps.changelogAggStream(src.toDS())
        .writeStream.format("memory").queryName("chlog")
        .outputMode("update").start()
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val all = spark.table("chlog").as[StreamingOps.GroupSnapshot].collect()
      val latest = all.groupBy(_.group).map { case (g, rows) =>
        val r = rows.maxBy(_.ver); g -> (r.sum_c, r.cnt)
      }
      // net state by hand: 10 → {1:600 (updated), 3:200}; 11 → {} (all
      // deleted; the unknown-id D was a no-op)
      assert(latest == Map(10L -> ((600L + 200L, 2L)), 11L -> ((0L, 0L))),
        s"retraction broke the aggregate: $latest")
      // the delete really retracted a COUNTED row, not just its value
      assert(latest(10L)._2 == 2L && latest(11L)._2 == 0L)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("retractable topN: deletes promote, updates re-rank, emptied group emits the sentinel") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingOps.ChangeOp
      // group 1: four ids; batch 2 DELETES the leader (id 11, 90) — id
      // 13 (40), previously OUTSIDE the top-3 podium, must be promoted
      // (the full-state path bounded top-n state cannot take) — and
      // UPDATES id 12 above id 10; group 2: both ids deleted → sentinel
      val b1 = Seq(
        ChangeOp("I", 1L, 1L, 10L, 70L), ChangeOp("I", 2L, 1L, 11L, 90L),
        ChangeOp("I", 3L, 1L, 12L, 50L), ChangeOp("I", 4L, 1L, 13L, 40L),
        ChangeOp("I", 5L, 2L, 20L, 10L), ChangeOp("I", 6L, 2L, 21L, 20L))
      val b2 = Seq(
        ChangeOp("D", 7L, 1L, 11L, 0L), ChangeOp("U", 8L, 1L, 12L, 80L),
        ChangeOp("D", 9L, 2L, 20L, 0L), ChangeOp("D", 10L, 2L, 21L, 0L),
        ChangeOp("D", 11L, 2L, 99L, 0L)) // unknown id: idempotent no-op
      val src = MemoryStream[ChangeOp]
      val q = StreamingOps.retractTopNStream(src.toDS(), n = 3)
        .writeStream.format("memory").queryName("rtopn")
        .outputMode("update").start()
      src.addData(b1: _*)
      q.processAllAvailable()
      val mid = spark.table("rtopn").as[StreamingOps.RankedSnap].collect()
      // batch-1 podium: group 1 = 11(90), 10(70), 12(50); 13 missed it
      val mid1 = mid.filter(_.group == 1L).sortBy(_.rk)
        .map(r => (r.id, r.value_c)).toSeq
      assert(mid1 == Seq((11L, 90L), (10L, 70L), (12L, 50L)), s"$mid1")
      src.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val all = spark.table("rtopn").as[StreamingOps.RankedSnap].collect()
      def latest(g: Long) = {
        val v = all.filter(_.group == g).map(_.ver).max
        all.filter(r => r.group == g && r.ver == v).sortBy(_.rk)
      }
      // the delete PROMOTED 13 from outside the podium; the update
      // re-ranked 12 above 10
      assert(latest(1L).map(r => (r.rk, r.id, r.value_c)).toSeq ==
        Seq((1L, 12L, 80L), (2L, 10L, 70L), (3L, 13L, 40L)),
        s"retraction must promote from full state: ${latest(1L).toSeq}")
      // group 2 emptied: exactly the rk=0 sentinel at the latest version
      assert(latest(2L).map(r => (r.rk, r.id)).toSeq == Seq((0L, -1L)),
        s"emptied group must emit the sentinel: ${latest(2L).toSeq}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("retractable topN gate equals the in-Spark net-state rank twin at sf0.001") {
    import org.apache.spark.sql.functions._
    val got = StreamingOps.retractTopNGate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ops = StreamingOps.changelogFromEvents(
      Tables.t(spark, sfDir, "events"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group"), col("id")).orderBy(col("seq").desc)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("value_c").desc, col("id"))
    val expected = ops.withColumn("rn", row_number().over(wl))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .withColumn("rk", row_number().over(wr).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("group"), col("rk"), col("id"), col("value_c"))
      .orderBy(col("group"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sameElements(expected),
      s"gate ${got.take(8).toSeq}... != twin ${expected.take(8).toSeq}...")
    assert(got.nonEmpty)
  }

  test("changelog normalize + retract agg two-stage split equals the fused aggregate") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingOps.{ChangeOp, ChangeRow}
      val b1 = Seq(
        ChangeOp("I", 1L, 10L, 1L, 500L), ChangeOp("I", 2L, 10L, 2L, 700L),
        ChangeOp("I", 3L, 11L, 9L, 300L))
      val b2 = Seq(
        ChangeOp("U", 4L, 10L, 1L, 600L), ChangeOp("D", 5L, 10L, 2L, 0L),
        ChangeOp("I", 6L, 10L, 3L, 200L),
        ChangeOp("D", 7L, 11L, 9L, 0L), ChangeOp("D", 8L, 11L, 42L, 0L))
      // stage 1: upsert ops → full retract rows (keyed by (group, id));
      // the stage boundary is a CHANNEL (a topic in production — the
      // exchange Flink pays between ChangelogNormalize and the
      // aggregate), so the replay runs it as its own query
      val src1 = MemoryStream[ChangeOp]
      val q1 = StreamingOps.changelogNormalizeStream(src1.toDS())
        .writeStream.format("memory").queryName("norm")
        .outputMode("update").start()
      src1.addData(b1: _*)
      q1.processAllAvailable()
      src1.addData(b2: _*)
      q1.processAllAvailable()
      q1.stop()
      val rows = spark.table("norm").as[ChangeRow].collect()
        .sortBy(r => (r.seq, r.sub))
      // the update carried its retraction; the delete its old row
      assert(rows.filter(r => r.seq == 4L).map(r => (r.kind, r.value_c))
        .toSeq == Seq(("-U", 500L), ("+U", 600L)),
        s"update must emit its retract pair: ${rows.toSeq}")
      assert(rows.filter(_.seq == 5L).map(r => (r.kind, r.value_c))
        .toSeq == Seq(("-D", 700L)))
      assert(!rows.exists(_.seq == 8L), "unknown-id delete emits nothing")
      // stage 2: retract rows → accumulator-only per-group aggregate,
      // replayed over the channel in the same batch split
      val src2 = MemoryStream[ChangeRow]
      val q2 = StreamingOps.retractAggStream(src2.toDS())
        .writeStream.format("memory").queryName("ragg")
        .outputMode("update").start()
      val (r1, r2) = rows.partition(_.seq <= 3L)
      src2.addData(r1.toSeq: _*)
      q2.processAllAvailable()
      src2.addData(r2.toSeq: _*)
      q2.processAllAvailable()
      q2.stop()
      val twoStage = spark.table("ragg").as[StreamingOps.GroupSnapshot]
        .collect().groupBy(_.group).map { case (g, rs) =>
          val r = rs.maxBy(_.ver); g -> (r.sum_c, r.cnt)
        }
      // ≡ the fused single-operator aggregate on the same ops
      assert(twoStage == Map(10L -> ((800L, 2L)), 11L -> ((0L, 0L))),
        s"two-stage split diverged from the fused form: $twoStage")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("cep stream: pattern spanning a batch seam matches the batch fold; late rows drop") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import graft.operators.Cep
      val M = 60000000L
      val pattern = Seq(Cep.Step("click", plus = false),
        Cep.Step("view", plus = true), Cep.Step("purchase", plus = false))
      // user 7's match STRADDLES the seam: click+view in batch 1,
      // view+purchase in batch 2 — the carried automaton must finish it
      val b1 = Seq((7L, 0 * M, 1L, "click"), (7L, 1 * M, 2L, "view"))
      val b2 = Seq((7L, 2 * M, 3L, "view"), (7L, 3 * M, 4L, "purchase"))
      val src = MemoryStream[(Long, Long, Long, String)]
      val q = StreamingOps.cepStream(src.toDS(), pattern, windowUs = 10 * M)
        .writeStream.format("memory").queryName("cep")
        .outputMode("append").start()
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
      // advance the watermark so the purchase instant drains
      src.addData((8L, 30 * M, 90L, "error"))
      q.processAllAvailable()
      src.addData((8L, 31 * M, 91L, "error"))
      q.processAllAvailable()
      // a late click below the watermark: dropped, opens nothing
      src.addData((7L, 5 * M, 5L, "click"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("cep").as[Cep.CepMatch].collect()
        .map(m => (m.user_id, m.start_event_id, m.end_event_id, m.n_rows))
        .toSet
      assert(got == Set((7L, 1L, 4L, 4L)),
        s"seam-straddling match must complete exactly once: $got")
      // batch twin on the same in-order rows
      val batch = Cep.cepMatchOf(
        (b1 ++ b2).map { case (u, ts, id, t) =>
          (u, new java.sql.Timestamp(ts / 1000), id, t) }
          .toDF("user_id", "ts", "event_id", "event_type"),
        pattern, windowUs = 10 * M)
        .collect().map(m =>
          (m.user_id, m.start_event_id, m.end_event_id, m.n_rows)).toSet
      assert(got == batch, s"stream $got != batch fold $batch")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("cep stream widened class: window-killed fallback state carries across the seam") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import graft.operators.Cep
      val M = 60000000L
      // non-adjacent repeat — the class the shared-buffer rebuild added;
      // the buffer (not a counts tuple) is what ValueState must carry
      val pattern = Seq(Cep.Step("view", plus = false),
        Cep.Step("click", plus = false), Cep.Step("view", plus = false))
      // batch 1 ends with a PARTIAL [v c] whose completion in batch 2
      // violates the 10-min window; the machine must fall back to the
      // trailing view (id 3) and finish the accepted match from it
      val b1 = Seq((9L, 0 * M, 1L, "view"), (9L, 1 * M, 2L, "click"))
      val b2 = Seq((9L, 19 * M, 3L, "view"), (9L, 20 * M, 4L, "click"),
        (9L, 21 * M, 5L, "view"))
      val src = MemoryStream[(Long, Long, Long, String)]
      val q = StreamingOps.cepStream(src.toDS(), pattern, windowUs = 10 * M)
        .writeStream.format("memory").queryName("cepwide")
        .outputMode("append").start()
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
      // drive the watermark past the last row so it drains
      src.addData((8L, 40 * M, 90L, "error"))
      q.processAllAvailable()
      src.addData((8L, 41 * M, 91L, "error"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("cepwide").as[Cep.CepMatch].collect()
        .map(m => (m.user_id, m.start_event_id, m.end_event_id, m.n_rows))
        .toSet
      assert(got == Set((9L, 3L, 5L, 3L)),
        s"fallback-start match must complete exactly once: $got")
      // batch twin on the same in-order rows
      val batch = Cep.cepMatchOf(
        (b1 ++ b2).map { case (u, ts, id, t) =>
          (u, new java.sql.Timestamp(ts / 1000), id, t) }
          .toDF("user_id", "ts", "event_id", "event_type"),
        pattern, windowUs = 10 * M)
        .collect().map(m =>
          (m.user_id, m.start_event_id, m.end_event_id, m.n_rows)).toSet
      assert(got == batch, s"stream $got != batch fold $batch")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("cep stream: seeded random corpora and seam splits equal the batch fold") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import graft.operators.Cep
      // randomized end-to-end audit of the streaming drain: random
      // per-user event sequences (repeat-bearing pattern), random
      // MICRO-BATCH SEAMS, in-order arrival (the watermark contract) —
      // the carried buffer state must make the stream's match set equal
      // the batch fold exactly, wherever the seams land
      val rng = new scala.util.Random(1117)
      val pattern = Seq(Cep.Step("a", plus = false),
        Cep.Step("b", plus = true), Cep.Step("a", plus = false))
      val M = 60000000L
      for (trial <- 1 to 4) {
        val rows = (1 to 120).map { i =>
          (rng.nextInt(3).toLong + 1L, i * M,
            i.toLong, Seq("a", "b", "c")(rng.nextInt(3)))
        }
        val splits = (1 to 3).map(_ => rng.nextInt(rows.length)).sorted
        val batches = (0 +: splits :+ rows.length).distinct.sorted
          .sliding(2).map { case Seq(x, y) => rows.slice(x, y) }
          .filter(_.nonEmpty).toSeq
        val src = MemoryStream[(Long, Long, Long, String)]
        val q = StreamingOps.cepStream(src.toDS(), pattern,
            windowUs = 30 * M)
          .writeStream.format("memory").queryName(s"cepfuzz$trial")
          .outputMode("append").start()
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        // drain the tail past the watermark
        src.addData((9L, 1000 * M, 9001L, "c"))
        q.processAllAvailable()
        src.addData((9L, 1001 * M, 9002L, "c"))
        q.processAllAvailable()
        q.stop()
        val got = spark.table(s"cepfuzz$trial").as[Cep.CepMatch].collect()
          .map(m => (m.user_id, m.start_event_id, m.end_event_id, m.n_rows))
          .toSet
        val batch = Cep.cepMatchOf(
          rows.map { case (u, ts, id, t) =>
            (u, new java.sql.Timestamp(ts / 1000), id, t) }
            .toDF("user_id", "ts", "event_id", "event_type"),
          pattern, windowUs = 30 * M)
          .collect().map(m =>
            (m.user_id, m.start_event_id, m.end_event_id, m.n_rows)).toSet
        assert(got == batch,
          s"trial $trial (seams at $splits): stream $got != batch $batch")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("retractable topN: seeded random op storms equal the net-state rank (dirty-check audit)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingOps.ChangeOp
      // deterministic random storms over a SMALL id space (forced
      // update/delete collisions, podium churn in both directions) —
      // the end-to-end audit of the dirty-check: a missed recompute
      // serves a stale podium, and the net-state rank would expose it
      val rng = new scala.util.Random(42)
      val ops = (1 to 240).map { seq =>
        val op = rng.nextInt(10) match {
          case 0 | 1 | 2 => "D"
          case 3 | 4 | 5 | 6 => "U"
          case _ => "I"
        }
        ChangeOp(op, seq.toLong, rng.nextInt(3).toLong,
          rng.nextInt(9).toLong, rng.nextInt(1000).toLong)
      }
      val src = MemoryStream[ChangeOp]
      val q = StreamingOps.retractTopNStream(src.toDS(), n = 3)
        .writeStream.format("memory").queryName("rtopnstorm")
        .outputMode("update").start()
      ops.grouped(40).foreach { b => src.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val all = spark.table("rtopnstorm").as[StreamingOps.RankedSnap].collect()
      val latest = all.groupBy(_.group).map { case (g, rs) =>
        val v = rs.map(_.ver).max
        g -> rs.filter(r => r.ver == v && r.rk > 0).sortBy(_.rk)
          .map(r => (r.id, r.value_c)).toList
      }
      // net state replayed in memory: last op per (group, id) by seq
      val net = ops.groupBy(o => (o.group, o.id)).flatMap { case ((g, id), os) =>
        val lastOp = os.maxBy(_.seq)
        if (lastOp.op == "D") None else Some((g, id, lastOp.value_c))
      }
      val expected = net.groupBy(_._1).map { case (g, rows) =>
        g -> rows.toList.map(r => (r._3, r._2))
          .sortBy { case (v, id) => (-v, id) }.take(3)
          .map { case (v, id) => (id, v) }
      }
      // every group that ever saw an op has a latest snapshot
      val groups = ops.map(_.group).distinct
      groups.foreach { g =>
        assert(latest.getOrElse(g, Nil) == expected.getOrElse(g, Nil),
          s"group $g: live ${latest.get(g)} != net-state ${expected.get(g)}")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("changelog join: deltas track retraction — delete, update re-pair, idempotent U, unknown D") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingOps.{JoinDelta, SideOp}
      val src = MemoryStream[SideOp]
      val q = StreamingOps.changelogJoinStream(src.toDS())
        .writeStream.format("memory").queryName("cjoin")
        .outputMode("append").start()
      def deltas(): Seq[(String, Long, Long, Long, Long, Long)] =
        spark.table("cjoin").as[JoinDelta].collect()
          .map(j => (j.op, j.group, j.l_id, j.r_id, j.l_val, j.r_val)).toSeq
      // batch 1: L(id 1, v 10), R(id 5, v 100) -> one joined row
      src.addData(SideOp("L", "I", 1, 0, 1, 10), SideOp("R", "I", 2, 0, 5, 100))
      q.processAllAvailable()
      assert(deltas().toSet == Set(("I", 0L, 1L, 5L, 10L, 100L)))
      // batch 2: a second right row joins the live left; an IDEMPOTENT
      // left update (same value) emits nothing
      src.addData(SideOp("R", "I", 3, 0, 6, 200), SideOp("L", "U", 4, 0, 1, 10))
      q.processAllAvailable()
      assert(deltas().toSet == Set(
        ("I", 0L, 1L, 5L, 10L, 100L), ("I", 0L, 1L, 6L, 10L, 200L)))
      // batch 3: left update to v 11 retracts BOTH joined rows and
      // re-emits them at the new value (an update is its own retraction)
      src.addData(SideOp("L", "U", 5, 0, 1, 11))
      q.processAllAvailable()
      val afterUpdate = deltas()
      assert(afterUpdate.toSet.contains(("D", 0L, 1L, 5L, 10L, 100L)) &&
        afterUpdate.toSet.contains(("I", 0L, 1L, 5L, 11L, 100L)) &&
        afterUpdate.toSet.contains(("D", 0L, 1L, 6L, 10L, 200L)) &&
        afterUpdate.toSet.contains(("I", 0L, 1L, 6L, 11L, 200L)))
      // batch 4: deleting right id 5 retracts its joined row; deleting
      // an UNKNOWN id is silent
      src.addData(SideOp("R", "D", 6, 0, 5, 0), SideOp("R", "D", 7, 0, 99, 0))
      q.processAllAvailable()
      val all = deltas()
      q.stop()
      assert(all.count(_ == ("D", 0L, 1L, 5L, 11L, 100L)) == 1)
      // the signed-count fold = the net join: L(1,11) x R(6,200) only
      val net = all.groupBy(d => (d._2, d._3, d._4, d._5, d._6))
        .map { case (k, ds) =>
          k -> ds.map(d => if (d._1 == "I") 1 else -1).sum
        }.filter(_._2 != 0)
      assert(net == Map((0L, 1L, 6L, 11L, 200L) -> 1),
        s"net fold wrong: $net")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("changelog left join: padding retracts on first right match and returns on last delete") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingOps.{OuterJoinDelta, SideOp}
      val src = MemoryStream[SideOp]
      val q = StreamingOps.changelogLeftJoinStream(src.toDS())
        .writeStream.format("memory").queryName("cljoin")
        .outputMode("append").start()
      def deltas() = spark.table("cljoin").as[OuterJoinDelta].collect()
        .map(j => (j.op, j.group, j.l_id, j.r_id, j.l_val, j.r_val)).toSeq
      // two left rows, empty right: both visible null-padded
      src.addData(SideOp("L", "I", 1, 0, 1, 10), SideOp("L", "I", 2, 0, 2, 20))
      q.processAllAvailable()
      assert(deltas().toSet == Set(
        ("I", 0L, 1L, None, 10L, None), ("I", 0L, 2L, None, 20L, None)))
      // first right row: BOTH paddings retract, pairs appear (0 -> 1)
      src.addData(SideOp("R", "I", 3, 0, 7, 100))
      q.processAllAvailable()
      val afterFirst = deltas()
      assert(afterFirst.toSet.contains(("D", 0L, 1L, None, 10L, None)) &&
        afterFirst.toSet.contains(("D", 0L, 2L, None, 20L, None)) &&
        afterFirst.toSet.contains(("I", 0L, 1L, Some(7L), 10L, Some(100L))) &&
        afterFirst.toSet.contains(("I", 0L, 2L, Some(7L), 20L, Some(100L))))
      // deleting the only right row: pairs retract, padding returns (1 -> 0)
      src.addData(SideOp("R", "D", 4, 0, 7, 0))
      q.processAllAvailable()
      val all = deltas()
      q.stop()
      assert(all.toSet.contains(("D", 0L, 1L, Some(7L), 10L, Some(100L))) &&
        all.count(_ == ("I", 0L, 1L, None, 10L, None)) == 2 &&
        all.count(_ == ("I", 0L, 2L, None, 20L, None)) == 2)
      // fold = the net LEFT JOIN: both lefts back to null-padded
      val net = all.groupBy(d => (d._2, d._3, d._4, d._5, d._6))
        .map { case (k, ds) =>
          k -> ds.map(d => if (d._1 == "I") 1 else -1).sum
        }.filter(_._2 != 0)
      assert(net == Map(
        (0L, 1L, None, 10L, None) -> 1, (0L, 2L, None, 20L, None) -> 1),
        s"net fold wrong: $net")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("changelog full join: both sides pad and the paddings swap on either side's transitions") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingOps.{FullJoinDelta, SideOp}
      val src = MemoryStream[SideOp]
      val q = StreamingOps.changelogFullJoinStream(src.toDS())
        .writeStream.format("memory").queryName("cfjoin")
        .outputMode("append").start()
      def deltas() = spark.table("cfjoin").as[FullJoinDelta].collect()
        .map(j => (j.op, j.group, j.l_id, j.r_id, j.l_val, j.r_val)).toSeq
      // RIGHT rows first: they pad (null, r) — the direction the left
      // join never emits
      src.addData(SideOp("R", "I", 1, 0, 7, 100), SideOp("R", "I", 2, 0, 8, 200))
      q.processAllAvailable()
      assert(deltas().toSet == Set(
        ("I", 0L, None, Some(7L), None, Some(100L)),
        ("I", 0L, None, Some(8L), None, Some(200L))))
      // first LEFT insert: both right paddings retract, pairs appear
      src.addData(SideOp("L", "I", 3, 0, 1, 10))
      q.processAllAvailable()
      val afterLeft = deltas()
      assert(afterLeft.toSet.contains(("D", 0L, None, Some(7L), None, Some(100L))) &&
        afterLeft.toSet.contains(("D", 0L, None, Some(8L), None, Some(200L))) &&
        afterLeft.toSet.contains(("I", 0L, Some(1L), Some(7L), Some(10L), Some(100L))) &&
        afterLeft.toSet.contains(("I", 0L, Some(1L), Some(8L), Some(10L), Some(200L))))
      // deleting the only left row: pairs retract, right paddings return
      src.addData(SideOp("L", "D", 4, 0, 1, 0))
      q.processAllAvailable()
      val all = deltas()
      q.stop()
      val net = all.groupBy(d => (d._2, d._3, d._4, d._5, d._6))
        .map { case (k, ds) =>
          k -> ds.map(d => if (d._1 == "I") 1 else -1).sum
        }.filter(_._2 != 0)
      assert(net == Map(
        (0L, None, Some(7L), None, Some(100L)) -> 1,
        (0L, None, Some(8L), None, Some(200L)) -> 1),
        s"net fold wrong: $net")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("changelog join gate equals the in-Spark net-state twin at sf0.001") {
    import org.apache.spark.sql.functions._
    val got = StreamingOps.changelogJoinGate(spark, sfDir).collect()
    // net-state twin computed relationally in Spark on the same fixture
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select(
        when(col("event_type") === "purchase", lit("D"))
          .when(col("event_type") === "click", lit("U"))
          .otherwise(lit("I")).as("op"),
        col("event_id").as("seq"),
        pmod(col("user_id"), lit(4)).cast("long").as("grp"),
        col("event_id").cast("long").as("eid"),
        round(col("value") * 100).cast("long").as("value_c"))
      .select(col("op"), col("seq"), col("grp"),
        when(pmod(col("eid"), lit(2)) === 0, lit("L")).otherwise(lit("R"))
          .as("side"),
        when(pmod(col("eid"), lit(2)) === 0, pmod(col("eid"), lit(13)))
          .otherwise(pmod(col("eid"), lit(11))).cast("long").as("id"),
        col("value_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("side"), col("grp"), col("id"))
      .orderBy(col("seq").desc)
    val net = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
    val twin = net.filter(col("side") === "L")
      .select(col("grp"), col("id").as("l_id"), col("value_c").as("l_val"))
      .join(net.filter(col("side") === "R")
        .select(col("grp"), col("id").as("r_id"), col("value_c").as("r_val")),
        "grp")
      .select(col("grp"), col("l_id"), col("r_id"), col("l_val"), col("r_val"))
      .orderBy(col("grp"), col("l_id"), col("r_id"))
      .collect()
    assert(got.toSeq == twin.toSeq,
      s"gate (${got.length} rows) != twin (${twin.length} rows)")
    assert(got.nonEmpty)
  }

  test("changelog gate equals the in-Spark net-state twin at sf0.001") {
    import org.apache.spark.sql.functions._
    val got = StreamingOps.changelogAggGate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the same derivation + net-state rule, straight batch SQL
    val ops = StreamingOps.changelogFromEvents(
      Tables.t(spark, sfDir, "events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group"), col("id")).orderBy(col("seq").desc)
    val net = ops.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .groupBy(col("group"))
      .agg(sum(col("value_c")).as("s"), count(lit(1)).as("c"))
    val groups = ops.select(col("group")).distinct()
    val expected = groups.join(net, Seq("group"), "left")
      .select(col("group"), coalesce(col("s"), lit(0L)),
        coalesce(col("c"), lit(0L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected,
      s"gate ${got.toSeq.sortBy(_._1)} != twin ${expected.toSeq.sortBy(_._1)}")
    assert(got.nonEmpty)
  }

  test("full-outer interval join: both sides pad at watermark expiry; matches emit once") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val l = MemoryStream[Ev]; val r = MemoryStream[Ev]
    val q = StreamingOps.intervalJoinFullOuter(l.toDF(), r.toDF())
      .writeStream.format("memory").queryName("fojoin")
      .outputMode("append").start()
    // user 1: matched pair; user 2: click with no purchase (right pad);
    // user 3: purchase with no click in the 30s before it (left pad)
    l.addData(ev(1, "2024-03-01 00:00:00", user = 1, typ = "click"),
      ev(2, "2024-03-01 00:00:05", user = 2, typ = "click"))
    r.addData(ev(3, "2024-03-01 00:00:10", user = 1, typ = "purchase"),
      ev(4, "2024-03-01 00:00:20", user = 3, typ = "purchase"))
    q.processAllAvailable()
    val early = spark.table("fojoin").count()
    assert(early == 1L, s"only the matched pair may emit early, got $early")
    // advance both watermarks past every interval end → padding emits
    l.addData(ev(8, "2024-03-01 01:00:00", user = 9, typ = "click"))
    r.addData(ev(9, "2024-03-01 01:00:00", user = 9, typ = "purchase"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fojoin")
      .select($"click_id", $"purchase_id", $"user_id")
      .collect().map(x => (Option(x.get(0)), Option(x.get(1)), x.getLong(2)))
      .toSet
    assert(rows.contains((Some(1L), Some(3L), 1L)))  // matched
    assert(rows.contains((Some(2L), None, 2L)))      // right-padded click
    assert(rows.contains((None, Some(4L), 3L)))      // left-padded purchase
    assert(rows.filterNot(t => t._3 == 9L).size == 3)
  }

  test("dedup stream: cross-batch exactly-once inside the horizon; " +
      "eviction past the horizon re-admits the key") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.dedupStream(src.toDF(), horizon = "1 minute",
        keys = Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup32")
      .outputMode("append").start()
    src.addData(ev(1, "2024-03-01 00:00:00", user = 7),
      ev(2, "2024-03-01 00:00:10", user = 7)) // same key, same batch
    q.processAllAvailable()
    // same key next batch, still inside the horizon → suppressed
    src.addData(ev(3, "2024-03-01 00:00:30", user = 7))
    q.processAllAvailable()
    assert(spark.table("dedup32").count() == 1L)
    // advance the watermark far past key 7's state, then recur: the
    // state was evicted, so the key re-emits — the TTL contract
    src.addData(ev(4, "2024-03-01 00:30:00", user = 8))
    q.processAllAvailable()
    src.addData(ev(5, "2024-03-01 00:29:30", user = 7))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup32").select($"event_id")
      .as[Long].collect().toSet
    assert(ids.contains(5L), s"evicted key must re-admit, got $ids")
    assert(spark.table("dedup32").count() == 3L) // 1, 4, 5
  }

  test("drift psi stream: drifted window scores high, matched low, " +
      "out-of-domain excluded, late rows dropped; equals the batch twin") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val baseline = Seq(10L, 20L, 10L, 0L) // 4 buckets, width 50 → [0, 200)
    val src = MemoryStream[Ev]
    val q = StreamingOps.windowedPsiStream(src.toDF(), baseline, width = 50)
      .writeStream.format("memory").queryName("psis")
      .outputMode("append").start()
    // window 00:00 tracks the baseline mix; 999/-5 are out-of-domain
    // (they open no bucket and stay out of n_in_domain)
    val w1 = Seq(
      ev(1, "2024-03-01 00:10:00", v = 25), ev(2, "2024-03-01 00:20:00", v = 75),
      ev(3, "2024-03-01 00:30:00", v = 80), ev(4, "2024-03-01 00:40:00", v = 125),
      ev(5, "2024-03-01 00:41:00", v = 999), ev(6, "2024-03-01 00:42:00", v = -5))
    // window 01:00 concentrates in the baseline-empty bucket 3
    val w2 = Seq(
      ev(7, "2024-03-01 01:10:00", v = 160), ev(8, "2024-03-01 01:20:00", v = 170),
      ev(9, "2024-03-01 01:30:00", v = 180), ev(10, "2024-03-01 01:40:00", v = 190))
    src.addData(w1); q.processAllAvailable()
    src.addData(w2); q.processAllAvailable()
    // flush past 02:00 + lateness, then a late window-00:00 row: its
    // window already emitted and its state is evicted — it must vanish
    src.addData(ev(11, "2024-03-01 02:30:00", v = 10)); q.processAllAvailable()
    src.addData(ev(12, "2024-03-01 00:15:00", v = 25)); q.processAllAvailable()
    q.stop()
    val got = spark.table("psis").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // withWatermark is a no-op on a batch plan, so the SAME builder over
    // the on-time rows is the definitional twin (late ev(12) excluded)
    val batch = StreamingOps.windowedPsiStream(
      (w1 ++ w2).toDF(), baseline, width = 50).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == batch, s"stream $got != batch $batch")
    assert(got.size == 2) // late row resurrected no third window
    val Seq(psiMatched, psiDrifted) =
      got.toSeq.sortBy(_._1).map(_._2._2)
    assert(got.toSeq.sortBy(_._1).map(_._2._1) == Seq(4L, 4L)) // in-domain
    assert(psiDrifted > 1.0, s"drifted window psi $psiDrifted")
    assert(psiMatched < 0.2, s"matched window psi $psiMatched")
    assert(psiDrifted > psiMatched * 5)
  }
}

object StreamingSpec {
  /** Top-level so Spark can synthesize an encoder (inner classes need the
    * enclosing instance's scope).
    */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
}
