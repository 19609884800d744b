package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.functions.FreqFunctions
import graft.operators.{HeavyHitters, TimeSeries}

/** Round-4 additions: Misra-Gries two-phase heavy hitters and the
  * time-weighted average.
  */
class Round4bSpec extends SparkSpecBase {
  import spark.implicits._

  // planted-skew stream: 10 heavy items (100x each) + 1000 singletons;
  // n = 2000, so with k = 30 the undercount bound n/(k+1) ~= 64.5 keeps
  // every heavy item (count 100) in the sketch
  private def plantedStream = {
    val heavy = (0L until 10L).flatMap(i => Seq.fill(100)(i))
    val tail = (1000L until 2000L)
    (heavy ++ tail).toDF("item")
  }

  test("misra-gries: candidates are a superset of heavy items under any partitioning") {
    FreqFunctions.register(spark)
    for (parts <- Seq(1, 3, 7, 32)) {
      val cands = plantedStream.repartition(parts)
        .agg(FreqFunctions.mgFreqCandidates($"item", 30).as("c"))
        .selectExpr("transform(c, e -> e.item) AS items")
        .head.getSeq[Long](0).toSet
      assert(cands.size <= 30, s"parts=$parts: sketch exceeded k")
      assert((0L until 10L).toSet.subsetOf(cands),
        s"parts=$parts: lost a guaranteed-heavy item; got $cands")
    }
  }

  test("misra-gries: k >= distinct keys makes the sketch exact") {
    FreqFunctions.register(spark)
    val out = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("item").repartition(3)
      .agg(FreqFunctions.mgFreqCandidates($"item", 10).as("c"))
      .selectExpr("explode(c) AS e").select($"e.item", $"e.cnt")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((3L, 3L), (1L, 2L), (2L, 1L)))
  }

  test("heavy hitters: two-phase result equals the plain GROUP BY answer") {
    val fact = Tables.t(spark, sfDir, "lineitem")
    val key = when($"l_partkey" % 10 < 3, $"l_partkey" % 10)
      .otherwise($"l_partkey")
    val got = HeavyHitters.freqHeavyHitters(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val n = fact.count()
    val thr = math.ceil(n * 0.01).toLong
    val want = fact.select(key.cast("long").as("item"))
      .groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= thr)
      .orderBy($"cnt".desc, $"item")
      .as[(Long, Long)].collect().toSeq
    assert(want.nonEmpty, "degenerate fixture: no heavy hitters")
    assert(got == want)
    // and the guarantee precondition is enforced
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(fact, $"l_partkey", frac = 0.001, k = 128)
    }
  }

  test("heavy hitters: recount phase broadcasts the candidate list") {
    val q = HeavyHitters.freqHeavyHitters(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate join should broadcast, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "recount must not shuffle the fact side for the join")
  }

  test("time-weighted avg: step-function golden case") {
    def ts(sec: Int) = new Timestamp(sec * 1000L)
    val events = Seq(
      // user 1: v=10 for 10s, then v=20 for 30s -> twa 17.5
      (1L, ts(0), 101L, 10.0),
      (1L, ts(10), 102L, 20.0),
      (1L, ts(40), 103L, 99.0), // open tail: excluded
      // user 2: single event -> no closed interval -> absent
      (2L, ts(5), 201L, 7.0),
      // user 3: duplicate timestamp -> zero-length interval carries no
      // weight; event_id breaks the tie deterministically
      (3L, ts(0), 301L, 1.0),
      (3L, ts(0), 302L, 5.0),
      (3L, ts(8), 303L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.timeWeightedAvgOf(events)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 40000000L, 17.5),
      (3L, 2L, 8000000L, 5.0))) // (1*0 + 5*8s) / 8s
  }

  test("importance sample: weight-1 docs always kept, lower cutoff keeps a superset") {
    val all = Tables.t(spark, sfDir, "documents")
    val kept400 = graft.operators.Mixing.importanceSample(spark, sfDir, 400)
    val kept200 = graft.operators.Mixing.importanceSample(spark, sfDir, 200)
    val ids400 = kept400.select($"doc_id").as[Long].collect().toSet
    val ids200 = kept200.select($"doc_id").as[Long].collect().toSet
    val certain = all.filter($"n_chars" >= 400).select($"doc_id")
      .as[Long].collect().toSet
    assert(certain.subsetOf(ids400), "weight-1 docs must always be kept")
    assert(ids400.subsetOf(ids200),
      "halving the full-weight cutoff must only add docs")
    assert(ids400.size < all.count(), "some short doc should be dropped")
    // the coin is the doc_id hash: rerunning is bit-identical
    assert(kept400.collect().toSeq ==
      graft.operators.Mixing.importanceSample(spark, sfDir, 400).collect().toSeq)
  }

  test("psi: zero for identical periods, positive for shifted ones, counts add up") {
    def ts(day: Int, sec: Int) = new Timestamp(day * 86400000L + sec * 1000L)
    // same 100 values on day 0 (p=0) and day 1 (p=1) -> PSI exactly 0
    val same = (0 until 100).flatMap(i =>
      Seq(("a", ts(0, i), i * 4.9), ("a", ts(1, i), i * 4.9)))
      .toDF("event_type", "ts", "value")
    val z = graft.operators.Drift.psiOf(same).as[(String, Long, Long, Double)]
      .collect()
    assert(z.toSeq == Seq(("a", 100L, 100L, 0.0)))
    // day-1 values pushed up a bucket -> strictly positive drift
    val shifted = (0 until 100).flatMap(i =>
      Seq(("a", ts(0, i), i % 5 * 50.0 + 1), ("a", ts(1, i), i % 5 * 50.0 + 51)))
      .toDF("event_type", "ts", "value")
    val p = graft.operators.Drift.psiOf(shifted)
      .as[(String, Long, Long, Double)].head()
    assert(p._4 > 0.0, s"shifted distribution should drift, got $p")
    // real data: psi finite and >= 0 per type, totals partition the rows
    val real = graft.operators.Drift.psiByType(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    assert(real.nonEmpty)
    real.foreach { case (t, na, nb, psi) =>
      assert(psi >= 0.0 && !psi.isNaN && !psi.isInfinite, s"$t: bad psi $psi")
      assert(na > 0 && nb > 0)
    }
    val events = Tables.t(spark, sfDir, "events")
    assert(real.map(r => r._2 + r._3).sum == events.count())
  }

  test("profile: invariants per column and ONE scan for the whole report") {
    val df = Tables.t(spark, sfDir, "lineitem")
    val q = graft.operators.Profile.profileColumns(df)
    val rows = q.collect()
    assert(rows.map(_.getString(0)).toSet == df.schema.fieldNames.toSet)
    val n = df.count()
    rows.foreach { r =>
      val (name, nn, nd) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nn <= n && nd <= nn && nd > 0, s"$name: bad counts $nn/$nd")
      if (!r.isNullAt(3)) assert(r.getDouble(3) <= r.getDouble(4),
        s"$name: min > max")
    }
    assert(rows.filter(_.isNullAt(3)).map(_.getString(0)).toSet ==
      Set("l_returnflag", "l_linestatus"))
    // r17 shape pin: the union form plans one SINGLE-COLUMN pruned scan
    // per column and NO Expand — the wide multi-distinct plan dragged
    // every count/min/max partial through an (N+1)-way Expand keyed by
    // all N columns (12x row volume through a 12-column-key aggregate)
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == df.schema.size,
      s"expected one pruned scan per column, found $scans")
    assert(!plan.contains("Expand"),
      "the per-column union must not plan an Expand")
  }

  test("concurrency: sharded prefix-sum equals the naive global window, any shard count") {
    import org.apache.spark.sql.expressions.Window
    val events = Tables.t(spark, sfDir, "events")
    // naive reference: one global ordered window (the form the operator
    // exists to avoid)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val iv = events.select($"user_id", $"ts", $"event_id")
      .withColumn("g", lead($"ts", 1).over(w)).filter($"g".isNotNull)
      .select(unix_micros($"ts").as("f"), unix_micros($"g").as("g"))
    val naive = iv.select($"f".as("t"), lit(1L).as("d"))
      .unionAll(iv.select($"g".as("t"), lit(-1L).as("d")))
      .groupBy($"t").agg(sum($"d").as("nd"))
      .withColumn("concurrency", sum($"nd").over(Window.orderBy($"t")))
      .select($"t".as("t_us"), $"concurrency")
      .orderBy($"t_us")
      .as[(Long, Long)].collect().toSeq
    for (shards <- Seq(1, 5, 32)) {
      val got = graft.operators.TimeSeries.concurrencyOf(events, shards)
        .as[(Long, Long)].collect().toSeq
      assert(got == naive, s"shards=$shards diverged from the global window")
    }
    assert(naive.last._2 == 0, "sweep must close every interval")
    assert(naive.map(_._2).max >= 1 && naive.map(_._2).min >= 0)
    // the data-sized cumsum must be keyed by shard, not globally ordered
    val q = graft.operators.TimeSeries.concurrencyOf(events, 32)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val bigWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("sum(nd#")).toSeq
    assert(bigWindows.nonEmpty && bigWindows.forall(_.contains("pid")),
      s"delta cumsum must partition by shard id:\n$plan")
  }

  test("bigram merges: golden pair counts, punctuation is its own token") {
    val docs = Seq("a b a b c", "x", "", "a,b").toDF("text")
    val out = graft.operators.TextAnalysis.bigramMergesOf(docs, 10)
      .as[(String, Long)].collect().toSeq
    // "a b a b c": pairs (a b)x2, (b a), (b c); "a,b": (a ,), (, b)
    assert(out == Seq(("a b", 2L), (", b", 1L), ("a ,", 1L),
      ("b a", 1L), ("b c", 1L)))
  }

  test("time-weighted avg: window and groupBy share one exchange") {
    val q = TimeSeries.timeWeightedAvg(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly one hashpartitioning exchange on user_id: the aggregation
    // reuses the window's partitioning (the output sort adds a range one)
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
