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

  test("quality classifier: plugged weights match an independent " +
      "hand-rolled scorer; zero-token doc scores sigmoid(bias)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.DecimalType
    val dim = 4
    val bias = -0.1
    val docs = Seq((1L, "aa bb aa cc"), (2L, ""), (3L, "zz"),
      (4L, "bb bb bb bb bb")).toDF("doc_id", "text")
    val wmap = Map(0L -> BigDecimal("0.5"), 1L -> BigDecimal("-0.25"),
      2L -> BigDecimal("1.0"), 3L -> BigDecimal("-0.75"))
    val weights = wmap.toSeq.toDF("bucket", "w")
      .select(col("bucket"), col("w").cast(DecimalType(20, 12)).as("w"))

    // independent scorer: own MD5, own arithmetic (same rounding
    // contract: HALF_UP at 9dp on the mean, 6dp on the sigmoid)
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (BigInt(hex.take(15), 16) % dim).toLong
    }
    def expected(text: String): (Long, Double, Boolean) = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val mean =
        if (toks.isEmpty) 0.0
        else BigDecimal((toks.map(t => wmap(bucket(t))).sum.toDouble /
            toks.length).toString)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = BigDecimal((1.0 / (1.0 + math.exp(-(bias + mean)))).toString)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (toks.length.toLong, s, s >= 0.5)
    }
    val exp = Seq(1L -> "aa bb aa cc", 2L -> "", 3L -> "zz",
      4L -> "bb bb bb bb bb").map { case (id, text) =>
      val (n, s, k) = expected(text); (id, n, s, k)
    }
    // the corpus must exercise both classes and the zero-token path
    assert(exp.exists(_._4) && exp.exists(!_._4), s"one-class corpus: $exp")
    assert(exp.exists(_._2 == 0L))

    val got = graft.operators.TextAnalysis
      .scoreLinearOf(docs, weights, dim, bias)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == exp, s"got=$got exp=$exp")
  }

  test("DSIR selection ≡ independent importance-resampling replay; " +
      "target-like docs outscore mismatched ones; <2-token doc rides " +
      "its Gumbel key") {
    import spark.implicits._
    val dim = 8
    val k = 6
    // target vocab {alpha beta gamma}, off-domain vocab {delta epsilon
    // zeta}; doc 20 mirrors the target distribution without being in
    // the target slice, doc 21 is pure off-domain, doc 30 has 1 token
    val docs = Seq(
      (1L, "alpha beta alpha gamma beta alpha", true),
      (2L, "beta alpha beta gamma alpha beta", true),
      (3L, "gamma alpha beta alpha gamma", true),
      (10L, "delta epsilon zeta delta epsilon", false),
      (11L, "epsilon delta zeta epsilon zeta delta", false),
      (20L, "alpha beta alpha gamma beta", false),
      (21L, "delta epsilon delta zeta", false),
      (30L, "solo", false)
    ).toDF("doc_id", "text", "tgt")

    // independent replay: own MD5, own counting/arithmetic (shared
    // rounding contract: 6dp HALF_UP quantization, exact decimal sums)
    def h15(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x")
        .mkString.take(15), 16).toLong
    }
    def r6(d: Double): BigDecimal =
      BigDecimal(d.toString).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val corpus = Seq(
      1L -> ("alpha beta alpha gamma beta alpha", true),
      2L -> ("beta alpha beta gamma alpha beta", true),
      3L -> ("gamma alpha beta alpha gamma", true),
      10L -> ("delta epsilon zeta delta epsilon", false),
      11L -> ("epsilon delta zeta epsilon zeta delta", false),
      20L -> ("alpha beta alpha gamma beta", false),
      21L -> ("delta epsilon delta zeta", false),
      30L -> ("solo", false))
    val bags = corpus.map { case (id, (text, tgt)) =>
      val t = text.split(" ").toSeq
      (id, tgt, t.zip(t.tail).map { case (a, b) => h15(s"$a $b") % dim })
    }
    val cq = bags.flatMap(_._3).groupBy(identity).view.mapValues(_.size)
    val cp = bags.filter(_._2).flatMap(_._3).groupBy(identity).view
      .mapValues(_.size)
    val (tp, tq) = (cp.values.sum, cq.values.sum)
    val lr: Map[Long, BigDecimal] = cq.keys.map { b =>
      b -> r6(math.log(((cp.getOrElse(b, 0) + 1).toDouble * (tq + dim)) /
        ((tp + dim).toDouble * (cq(b) + 1))))
    }.toMap
    val exp = bags.map { case (id, _, feats) =>
      val slr = feats.map(lr).sum
      val u = (h15(id.toString).toDouble + 0.5) / math.pow(16.0, 15)
      val g = r6(-math.log(-math.log(u)))
      (id, feats.size.toLong, slr, slr + g)
    }.sortBy { case (id, _, _, key) => (-key, id) }.take(k)
      .map { case (id, n, slr, key) =>
        (id, n, r6(slr.toDouble).toDouble, r6(key.toDouble).toDouble) }

    val got = graft.operators.TextAnalysis
      .dsirSelectOf(docs, $"tgt", dim, k)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == exp, s"got=$got exp=$exp")

    // signal: the target-mirroring off-slice doc outscores the pure
    // off-domain doc on importance weight alone
    val byId = graft.operators.TextAnalysis
      .dsirSelectOf(docs, $"tgt", dim, corpus.size)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(byId(20L)._3 > byId(21L)._3,
      s"mirror doc must outscore off-domain: ${byId(20L)} vs ${byId(21L)}")
    assert(byId(30L)._2 == 0L && byId(30L)._3 == 0.0,
      s"1-token doc must carry an empty bag: ${byId(30L)}")
  }
}
