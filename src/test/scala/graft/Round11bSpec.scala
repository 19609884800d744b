package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{TemporalOp, TemporalJoined}
import org.apache.spark.sql.functions._

/** Round 11 session 2: event-time temporal join (FOR SYSTEM_TIME AS OF
  * rowtime) — golden replays across micro-batch seams, the late-row
  * contract on both sides, same-instant version tie-breaks, and a
  * seeded-random stream-vs-batch equivalence audit.
  */
class Round11bSpec extends SparkSpecBase {

  private def sec(s: Long): Long = s * 1000000L

  private def fact(ts: Long, key: Long, id: Long, v: Long) =
    TemporalOp("L", "I", 0L, sec(ts), key, id, v)
  private def ver(op: String, ts: Long, key: Long, v: Long, seq: Long) =
    TemporalOp("R", op, seq, sec(ts), key, 0L, v)
  private def flush(ts: Long) =
    TemporalOp("F", "I", Long.MaxValue, sec(ts), 0L, -1L, 0L)

  /** Replay batches through temporalJoinStream under the RocksDB
    * provider; returns the emitted rows.
    */
  private def replay(batches: Seq[Seq[TemporalOp]], leftOuter: Boolean):
      Seq[TemporalJoined] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pkey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pkey)
    spark.conf.set(pkey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[TemporalOp]
      val name = s"tj_${if (leftOuter) "l" else "i"}_${batches.map(_.size).sum}"
      val q = StreamingOps.temporalJoinStream(src.toDS(), leftOuter)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[TemporalJoined].collect().toSeq
        .sortBy(r => (r.key, r.id))
    } finally prev match {
      case Some(v) => spark.conf.set(pkey, v)
      case None => spark.conf.unset(pkey)
    }
  }

  test("temporal join: golden replay — version history, D-closed gap, " +
      "tie at validity start, version arriving after its fact") {
    // key 1 versions: v=100 from t10, v=200 from t30, closed at t50,
    // v=300 from t70. Facts: t5 (no version yet), t15 (→100), t30
    // (tie → 200), t55 (closed → none), t80 (→300).
    val batches = Seq(
      // f3@30 arrives BEFORE its version I@30 (next batch) — it must
      // buffer against the watermark and still join 200
      Seq(fact(5, 1, 1, 10), fact(15, 1, 2, 20), fact(30, 1, 3, 30),
        ver("I", 10, 1, 100, 1)),
      Seq(ver("I", 30, 1, 200, 3), ver("D", 50, 1, 0, 5), fact(55, 1, 4, 40)),
      Seq(ver("I", 70, 1, 300, 7), fact(80, 1, 5, 50), flush(300)))

    val inner = replay(batches, leftOuter = false)
    assert(inner == Seq(
      TemporalJoined(1, 2, sec(15), 20, Some(100)),
      TemporalJoined(1, 3, sec(30), 30, Some(200)),
      TemporalJoined(1, 5, sec(80), 50, Some(300))))

    val left = replay(batches, leftOuter = true)
    assert(left == Seq(
      TemporalJoined(1, 1, sec(5), 10, None), // before any version
      TemporalJoined(1, 2, sec(15), 20, Some(100)),
      TemporalJoined(1, 3, sec(30), 30, Some(200)),
      TemporalJoined(1, 4, sec(55), 40, None), // D-closed interval
      TemporalJoined(1, 5, sec(80), 50, Some(300))))
  }

  test("temporal join: same-instant version ops collapse to highest seq; " +
      "late versions and late facts are dropped") {
    val batches = Seq(
      // two versions at the same validity instant: seq 9 wins
      Seq(ver("I", 10, 2, 1, 1), ver("I", 10, 2, 2, 9), fact(20, 2, 1, 5),
        // watermark driver: push wm to 55s so t≤55 is final after b1
        fact(60, 2, 2, 6)),
      // all three rows are LATE (≤ wm 55s): the version must not rewrite
      // history, the fact must not emit, the D must not close anything
      Seq(ver("I", 15, 2, 999, 99), fact(12, 2, 3, 7), ver("D", 40, 2, 0, 98),
        // a fresh fact above the watermark still resolves against the
        // PRUNED history (latest version ≤ wm survived pruning)
        fact(90, 2, 4, 8), flush(300)))
    val out = replay(batches, leftOuter = true)
    assert(out == Seq(
      TemporalJoined(2, 1, sec(20), 5, Some(2)), // seq-9 version won
      TemporalJoined(2, 2, sec(60), 6, Some(2)),
      TemporalJoined(2, 4, sec(90), 8, Some(2)))) // late D didn't close
  }

  test("temporal join: idle key keeps its latest version across a long " +
      "watermark advance on other keys") {
    val batches = Seq(
      Seq(ver("I", 10, 3, 7, 1), fact(15, 3, 1, 1),
        ver("I", 10, 4, 1, 2)),
      // only key 4 traffic; watermark sails past key 3's history
      Seq(fact(500, 4, 2, 2)),
      // key 3 wakes: its pruned history must still serve the join
      Seq(fact(600, 3, 3, 3), flush(1200)))
    val out = replay(batches, leftOuter = false)
    assert(out == Seq(
      TemporalJoined(3, 1, sec(15), 1, Some(7)),
      TemporalJoined(3, 3, sec(600), 3, Some(7)),
      TemporalJoined(4, 2, sec(500), 2, Some(1))))
  }

  test("temporal join: seeded random replay ≡ batch definitional as-of " +
      "(inner and left)") {
    import spark.implicits._
    val rnd = new scala.util.Random(421100)
    // 300 ops over 6 keys: ~1/3 facts, versions I/D with distinct-ish
    // timestamps; ts spread over 1000s so batches carry real seams
    val ops = (1 to 300).map { i =>
      val key = rnd.nextInt(6).toLong
      val ts = rnd.nextInt(1000).toLong + 1
      if (rnd.nextInt(3) == 0) fact(ts, key, i.toLong, rnd.nextInt(100).toLong)
      else ver(if (rnd.nextInt(4) == 0) "D" else "I", ts, key,
        rnd.nextInt(1000).toLong, i.toLong)
    }.sortBy(_.ts_us)
    val batches = ops.grouped(100).toSeq :+ Seq(flush(5000))

    // batch twin: per fact, latest (vts, seq) version at or before its
    // ts; D → None
    val facts = ops.filter(_.side == "L")
    val vers0 = ops.filter(_.side == "R")
    // same-instant collapse (highest seq at a (key, vts) wins)
    val vers = vers0.groupBy(v => (v.key, v.ts_us))
      .map(_._2.maxBy(_.seq)).toSeq
    val expectLeft = facts.map { f =>
      val pick = vers.filter(v => v.key == f.key && v.ts_us <= f.ts_us)
        .sortBy(v => (v.ts_us, v.seq)).lastOption
      TemporalJoined(f.key, f.id, f.ts_us, f.value_c,
        pick.flatMap(v => if (v.op == "D") None else Some(v.value_c)))
    }.sortBy(r => (r.key, r.id))

    assert(replay(batches, leftOuter = true) == expectLeft)
    assert(replay(batches, leftOuter = false) ==
      expectLeft.filter(_.r_val.isDefined))
  }

  test("temporal join: version history, fact buffer and timers survive " +
      "a query restart on the same checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pkey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pkey)
    spark.conf.set(pkey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-tj-restart").toString
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[TemporalOp]
      def start(outDir: String) =
        StreamingOps.temporalJoinStream(src.toDS(), leftOuter = false)
          .toDF().writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(outDir); ()
          }
          .outputMode("append")
          .option("checkpointLocation", ckpt).start()
      // run 1: two versions, two ripe facts, one fact left buffered
      // (ts 100 > watermark 95) — then KILL the query
      val out1 = java.nio.file.Files
        .createTempDirectory("graft-tj-out1").toString
      src.addData(ver("I", 10, 6, 100, 1), ver("I", 30, 6, 200, 3),
        fact(15, 6, 1, 11), fact(40, 6, 2, 12), fact(100, 6, 3, 13))
      val q1 = start(out1)
      q1.processAllAvailable(); q1.stop()
      val got1 = spark.read.parquet(out1).as[TemporalJoined]
        .collect().sortBy(_.id).toSeq
      assert(got1 == Seq(
        TemporalJoined(6, 1, sec(15), 11, Some(100)),
        TemporalJoined(6, 2, sec(40), 12, Some(200))),
        s"pre-restart drains wrong: $got1")
      // run 2, same checkpoint: only a flush — the buffered fact must
      // emit against the version LEARNED BEFORE the restart (so the
      // recovery restored the pruned history, the fact buffer AND the
      // registered timer), not against empty state
      val out2 = java.nio.file.Files
        .createTempDirectory("graft-tj-out2").toString
      src.addData(flush(500))
      val q2 = start(out2)
      q2.processAllAvailable(); q2.stop()
      val got2 = spark.read.parquet(out2).as[TemporalJoined]
        .collect().toSeq
      assert(got2 == Seq(TemporalJoined(6, 3, sec(100), 13, Some(200))),
        s"restart lost buffered fact, history or timer: $got2")
    } finally prev match {
      case Some(v) => spark.conf.set(pkey, v)
      case None => spark.conf.unset(pkey)
    }
  }

  private def replayRows(batches: Seq[Seq[(Long, Long, Long, Long)]],
      n: Int, name: String): Seq[StreamingOps.RowsAgg] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pkey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pkey)
    spark.conf.set(pkey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, Long)]
      val q = StreamingOps.rowsOverStream(src.toDS(), n)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[StreamingOps.RowsAgg].collect().toSeq
        .sortBy(r => (r.key, r.ts_us, r.id))
    } finally prev match {
      case Some(v) => spark.conf.set(pkey, v)
      case None => spark.conf.unset(pkey)
    }
  }

  test("rows-over stream: ROWS frame is asymmetric under ties, deque " +
      "carries across the batch seam, late rows drop") {
    // key 5, n = 2 (frame = 2 preceding + current): rows at 10s, then a
    // TIE at 20s (ids 3 < 4 — id 3 must NOT see id 4; id 4 sees id 3),
    // then a seam, then 40s reaching back across it
    val out = replayRows(Seq(
      Seq((5L, sec(10), 1L, 100L), (5L, sec(20), 4L, 400L),
        (5L, sec(20), 3L, 300L), (5L, sec(30), 9L, 900L)),
      Seq((5L, sec(40), 5L, 500L), (5L, sec(200), 99L, 0L)),
      // late: 15s is far below the drained watermark — must not emit
      // or shift any already-correct frame
      Seq((5L, sec(15), 7L, 777L), (5L, sec(300), 98L, 0L))),
      n = 2, name = "rows_golden")
    assert(out.filter(r => r.id != 98L && r.id != 99L) == Seq(
      StreamingOps.RowsAgg(5, sec(10), 1, 100, 100, 1),
      StreamingOps.RowsAgg(5, sec(20), 3, 300, 400, 2), // 100+300, NOT 400
      StreamingOps.RowsAgg(5, sec(20), 4, 400, 800, 3), // 100+300+400
      StreamingOps.RowsAgg(5, sec(30), 9, 900, 1600, 3), // frame slid
      StreamingOps.RowsAgg(5, sec(40), 5, 500, 1800, 3))) // across the seam
    assert(!out.exists(_.id == 7L), "late row must not emit")
  }

  test("rows-over stream: seeded random replay ≡ batch rowsBetween frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(112211)
    val rows = (1 to 240).map { i =>
      (rnd.nextInt(5).toLong, this.sec(rnd.nextInt(800).toLong + 1),
        i.toLong, rnd.nextInt(1000).toLong)
    }.sortBy(r => (r._2, r._3))
    val streamed = replayRows(
      rows.grouped(80).toSeq :+ Seq((0L, this.sec(5000), -1L, 0L)),
      n = 3, name = "rows_rand")
      .filter(_.id != -1L)
      .map(r => (r.key, r.ts_us, r.id, r.value_c, r.sum_w, r.cnt_w))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_1")).orderBy(col("_2"), col("_3"))
      .rowsBetween(-3, 0)
    val expected = rows.toDF()
      .withColumn("sum_w", sum(col("_4")).over(w))
      .withColumn("cnt_w", count(lit(1)).over(w))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2, r._3))
    assert(streamed == expected)
  }
}
