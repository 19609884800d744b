package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SideOp, JoinDelta, OuterJoinDelta, FullJoinDelta}

/** Round 11 session 3: seeded-random stream-vs-batch equivalence audit
  * for the changelog join family (inner / left outer / full outer).
  * The directed specs in StreamingSpec pin each transition rule one at
  * a time; this audit drives all three processors through the SAME
  * random I/U/D interleaving — idempotent updates, unknown deletes,
  * empty↔non-empty side transitions and padding swaps arise by chance
  * in bulk — across random micro-batch seams, and folds the emitted
  * delta stream by signed count against the definitional net-state
  * join computed directly from the op list.
  */
class Round11cSpec extends SparkSpecBase {

  private def withRocksDb[A](body: => A): A = {
    val pkey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pkey)
    spark.conf.set(pkey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(pkey, v)
      case None => spark.conf.unset(pkey)
    }
  }

  /** Replay `batches` through one join variant and fold the emitted
    * deltas by signed count per distinct row; asserts every fold lands
    * in {0, 1} (anything else is a lost or duplicated retraction) and
    * returns the live rows.
    */
  private def foldReplay[D](batches: Seq[Seq[SideOp]], name: String,
      stream: org.apache.spark.sql.Dataset[SideOp] =>
        org.apache.spark.sql.Dataset[D]): Set[Seq[Any]] = withRocksDb {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SideOp]
    val q = stream(src.toDS()).toDF().writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    batches.foreach { b => src.addData(b); q.processAllAvailable() }
    q.stop()
    // fold on the generic Row to stay variant-agnostic: first field is
    // op, the rest identify the joined row
    val counts = scala.collection.mutable.Map.empty[Seq[Any], Long]
    spark.table(name).collect().foreach { r =>
      val key = (1 until r.length).map(r.get).toVector
      val sign = if (r.getString(0) == "I") 1L else -1L
      counts(key) = counts.getOrElse(key, 0L) + sign
    }
    val bad = counts.filter { case (_, m) => m != 0L && m != 1L }
    assert(bad.isEmpty,
      s"$name: fold multiplicity outside {0,1}: ${bad.take(5)}")
    counts.collect { case (k, m) if m == 1L => k }.toSet
  }

  private def rowKey(vals: Any*): Seq[Any] = vals.toVector

  test("changelog joins: seeded random replay ≡ net-state join " +
      "(inner, left outer, full outer)") {
    val rnd = new scala.util.Random(11031977L)
    // 600 ops, 3 groups, 5 id slots per side, 6 value slots: dense
    // enough that updates re-pair, deletes empty a side mid-stream and
    // paddings swap repeatedly; ~30% D (some on unknown ids), ~30% U
    // (some idempotent re-sends of the live value)
    val ops = (1 to 600).map { i =>
      val side = if (rnd.nextBoolean()) "L" else "R"
      val op = rnd.nextInt(10) match {
        case 0 | 1 | 2 => "D"
        case 3 | 4 | 5 => "U"
        case _ => "I"
      }
      SideOp(side, op, i.toLong, rnd.nextInt(3).toLong,
        rnd.nextInt(5).toLong, 1L + rnd.nextInt(6).toLong)
    } ++
      // directed tail: empty group 0's right side and group 1's left
      // side, so the FINAL state (not just transitions mid-stream)
      // carries left-padding and right-padding rows
      (0 until 5).map(i => SideOp("R", "D", 601L + i, 0L, i.toLong, 0L)) ++
      (0 until 5).map(i => SideOp("L", "D", 606L + i, 1L, i.toLong, 0L))
    // random seams: up to 5 batches of random sizes (slice clamps, the
    // trailing drop catches the remainder, empties filter away)
    val cutPoints = Seq.fill(4)(rnd.nextInt(200) + 30).scanLeft(0)(_ + _)
    val batches = (cutPoints.sliding(2).map { w =>
      ops.slice(w.head, w.last)
    }.toSeq :+ ops.drop(cutPoints.last)).filter(_.nonEmpty)
    assert(batches.map(_.length).sum == ops.length)

    // definitional net state per side: last I/U value per (group, id)
    // unless a later D removed it
    def net(side: String): Map[(Long, Long), Long] = {
      val m = scala.collection.mutable.Map.empty[(Long, Long), Long]
      ops.filter(_.side == side).sortBy(_.seq).foreach { o =>
        o.op match {
          case "D" => m.remove((o.group, o.id)); ()
          case _ => m((o.group, o.id)) = o.value_c
        }
      }
      m.toMap
    }
    val l = net("L")
    val r = net("R")
    val groups = (l.keys ++ r.keys).map(_._1).toSet

    val expInner: Set[Seq[Any]] = (for {
      ((lg, li), lv) <- l.toSeq
      ((rg, ri), rv) <- r.toSeq
      if lg == rg
    } yield rowKey(lg, li, ri, lv, rv)).toSet

    // left outer: pairs where the group has right rows, padding rows
    // (null r_id/r_val) where it doesn't
    val expLeft: Set[Seq[Any]] = l.toSeq.flatMap { case ((g, li), lv) =>
      val rs = r.toSeq.collect { case ((`g`, ri), rv) => (ri, rv) }
      if (rs.isEmpty) Seq(rowKey(g, li, null, lv, null))
      else rs.map { case (ri, rv) => rowKey(g, li, ri, lv, rv) }
    }.toSet

    // full outer: both paddings
    val expFull: Set[Seq[Any]] = groups.toSeq.flatMap { g =>
      val ls = l.toSeq.collect { case ((`g`, li), lv) => (li, lv) }
      val rs = r.toSeq.collect { case ((`g`, ri), rv) => (ri, rv) }
      if (ls.isEmpty) rs.map { case (ri, rv) =>
        rowKey(g, null, ri, null, rv) }
      else if (rs.isEmpty) ls.map { case (li, lv) =>
        rowKey(g, li, null, lv, null) }
      else for { (li, lv) <- ls; (ri, rv) <- rs }
        yield rowKey(g, li, ri, lv, rv)
    }.toSet

    // coverage guards: the corpus must actually exercise every case the
    // audit claims to prove — pairs, left padding AND right padding in
    // the FINAL state (not only in transitions) — else the equivalence
    // below is vacuous for that case
    assert(expInner.nonEmpty, "corpus left no joined pairs")
    assert(expLeft.exists(_(2) == null),
      "corpus left no final-state left-padding row")
    assert(expFull.exists(_(1) == null),
      "corpus left no final-state right-padding row")

    val gotInner = foldReplay[JoinDelta](batches, "rnd_chlog_inner",
      StreamingOps.changelogJoinStream)
    assert(gotInner == expInner,
      s"inner: extra=${(gotInner -- expInner).take(3)} " +
        s"missing=${(expInner -- gotInner).take(3)}")

    val gotLeft = foldReplay[OuterJoinDelta](batches, "rnd_chlog_left",
      StreamingOps.changelogLeftJoinStream)
    assert(gotLeft == expLeft,
      s"left: extra=${(gotLeft -- expLeft).take(3)} " +
        s"missing=${(expLeft -- gotLeft).take(3)}")

    val gotFull = foldReplay[FullJoinDelta](batches, "rnd_chlog_full",
      StreamingOps.changelogFullJoinStream)
    assert(gotFull == expFull,
      s"full: extra=${(gotFull -- expFull).take(3)} " +
        s"missing=${(expFull -- gotFull).take(3)}")
  }
}
