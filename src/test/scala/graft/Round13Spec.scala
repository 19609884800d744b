package graft

import org.apache.spark.sql.functions._

/** Round-13 goldens: CEP negative patterns (notFollowedBy / notNext),
  * looping relaxed states (followedBy + quantifiers), DEFINE
  * aggregates (running-sum cap) and PREV(k) offsets, and the
  * streaming time-advance machinery behind absence emission.
  */
class Round13Spec extends SparkSpecBase {

  test("cep notFollowedBy: kill, horizon-expiry emit, and the " +
      "one-row-late negated event") {
    import spark.implicits._
    import graft.operators.Cep
    // clicks c1(0s) c2(20s); purchase at 8s kills c1 (inside c1's 10s
    // horizon); the purchase at 31s lands ONE ROW AFTER c2's horizon
    // closes (30s) — outside the assertion's scope, so c2 EMITS (the
    // round-13 brief's golden: a late negated event must not kill)
    val rows = Seq(
      (1L, 0L, 1L, "click"), (1L, 8000000L, 2L, "purchase"),
      (1L, 20000000L, 3L, "click"), (1L, 31000000L, 4L, "purchase"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Cep.cepFollowedByOf(rows,
      Seq(Cep.Step("click"), Cep.Step("purchase", neg = true)),
      windowUs = 10000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq.sorted
    assert(got == Seq((3L, 3L, 1L)), s"$got")
  }

  test("cep notFollowedBy middle: a gap event kills the start") {
    import spark.implicits._
    import graft.operators.Cep
    // c1 -> error -> purchase: killed (error in the watched gap);
    // c2 -> purchase: emits. The error AFTER c2's purchase is outside
    // the gap and irrelevant.
    val rows = Seq(
      (1L, 0L, 1L, "click"), (1L, 1000000L, 2L, "error"),
      (1L, 2000000L, 3L, "purchase"), (1L, 3000000L, 4L, "click"),
      (1L, 4000000L, 5L, "purchase"), (1L, 5000000L, 6L, "error"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Cep.cepFollowedByOf(rows,
      Seq(Cep.Step("click"), Cep.Step("error", neg = true),
        Cep.Step("purchase")),
      windowUs = 10000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id)).toSeq.sorted
    assert(got == Seq((4L, 5L)), s"$got")
  }

  test("cep notNext: kill, horizon-expired pass, end-of-data pass") {
    import spark.implicits._
    import graft.operators.Cep
    // pair (c1,p2) followed immediately by an in-horizon error → KILL;
    // pair (c4,p5) followed by an error past c4's 10s horizon → PASS;
    // pair (c7,p8) at end-of-data (no next row) → PASS at the flush
    val rows = Seq(
      (1L, 0L, 1L, "click"), (1L, 1000000L, 2L, "purchase"),
      (1L, 2000000L, 3L, "error"),
      (1L, 20000000L, 4L, "click"), (1L, 21000000L, 5L, "purchase"),
      (1L, 31000000L, 6L, "error"),
      (1L, 50000000L, 7L, "click"), (1L, 51000000L, 8L, "purchase"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Cep.cepMatchOf(rows,
      Seq(Cep.Step("click"), Cep.Step("purchase"),
        Cep.Step("error", neg = true)),
      windowUs = 10000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq.sorted
    assert(got == Seq((4L, 5L, 2L), (7L, 8L, 2L)), s"$got")
  }

  test("cep relaxed greedy oneOrMore: maximal take commits at window " +
      "close, skipping interleaved rows") {
    import spark.implicits._
    import graft.operators.Cep
    // click, then views v2 v4 with a purchase p3 BETWEEN them and a
    // purchase p5 after: greedy view+ takes BOTH views (skipping p3 —
    // relaxed contiguity) and completes on p5, but only once the 12s
    // window closes over the click (the later row r6 at 15s) — a
    // premature machine would emit (1, 3) with one view at p3's feed
    val rows = Seq(
      (1L, 0L, 1L, "click"), (1L, 2000000L, 2L, "view"),
      (1L, 4000000L, 3L, "purchase"), (1L, 6000000L, 4L, "view"),
      (1L, 8000000L, 5L, "purchase"), (1L, 15000000L, 6L, "signup"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val pat = Seq(Cep.Step("click"), Cep.Step("view", plus = true),
      Cep.Step("purchase"))
    val got = Cep.cepFollowedByOf(rows, pat, windowUs = 12000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(got == Seq((1L, 5L, 4L)), s"$got")
    // without the closing row the take is still pending mid-stream —
    // but batch input is finite: the end-of-input flush commits it
    val got2 = Cep.cepFollowedByOf(rows.filter(col("event_id") =!= 6L),
      pat, windowUs = 12000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(got2 == Seq((1L, 5L, 4L)), s"$got2")
  }

  test("cep define aggregate: the running-sum cap bounds the run " +
      "per-row") {
    import spark.implicits._
    import graft.operators.Cep
    // purchases 60, 70, 80 after a click, cap 150: the run takes 60+70
    // = 130 and the 80 row FAILS ITS OWN predicate (130+80 > 150) —
    // bounding the run (no pending: the violating row closes greed),
    // match = click + 2 purchases
    val rows = Seq(
      (1L, 0L, 1L, "click", 0.0), (1L, 1000000L, 2L, "purchase", 0.60),
      (1L, 2000000L, 3L, "purchase", 0.70),
      (1L, 3000000L, 4L, "purchase", 0.80))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Cep.cepMatchOf(rows,
      Seq(Cep.Step("click"),
        Cep.Step("purchase", plus = true, sumCap = Some(150L))),
      windowUs = 100000000L)
      .collect().map(m => (m.start_event_id, m.end_event_id, m.n_rows))
      .toSeq
    assert(got == Seq((1L, 3L, 3L)), s"$got")
  }

  test("cep PREV(k): offset predicate navigates k physical rows back") {
    import spark.implicits._
    import graft.operators.Cep
    // click(5) view(3) then views 6, 4, 7: 6 > PREV(·,2)=5 ok,
    // 4 > PREV(·,2)=3... 4 > 3 ok, 7 > 6 ok — whole run; then a
    // second user where the run bounds at the first violating row
    val rows = Seq(
      (1L, 1L, "click", 0.05), (1L, 2L, "view", 0.03),
      (1L, 3L, "view", 0.06), (1L, 4L, "view", 0.04),
      (1L, 5L, "view", 0.07),
      (2L, 11L, "click", 0.05), (2L, 12L, "view", 0.09),
      (2L, 13L, "view", 0.04), (2L, 14L, "view", 0.10))
      .map { case (u, id, t, v) => (u, id * 1000000L, id, t, v) }
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Cep.cepMatchOf(rows,
      Seq(Cep.Step("click"), Cep.Step("view"),
        Cep.Step("view", plus = true, cmp = Some(Cep.PrevGt), cmpOff = 2)),
      windowUs = 100000000L)
      .collect().map(m => (m.user_id, m.start_event_id, m.end_event_id,
        m.n_rows)).toSeq.sorted
    // user 2: view 13 (value 4) vs PREV(·,2) = click (5) → 4 > 5
    // fails, run = just view 13? No — 13 fails, so the run takes zero
    // rows at 13... lo=1 needs >= 1: the run must start at 13 and 13
    // fails → no match from click 11. The machine then retries later
    // starts (none — no later click).
    assert(got == Seq((1L, 1L, 5L, 5L)), s"$got")
  }

  test("cep machine: absence emits on time-advance with no further " +
      "rows (the streaming timer path)") {
    import graft.operators.Cep
    val m = new Cep.Machine(
      IndexedSeq(Cep.Step("click"), Cep.Step("purchase", neg = true)),
      10000000L, Cep.SkipPastLast, contiguous = false)
    assert(m.feedM(0L, 1L, "click", 0L).isEmpty)
    assert(m.pendingHorizonUs.contains(10000000L))
    // watermark below the horizon: still pending
    assert(m.advance(9000000L).isEmpty)
    // watermark past the horizon: the absence is confirmed BY TIME —
    // no row needed (this is what the processor's event-time timer
    // delivers)
    val got = m.advance(10000001L).map(_._1.start_event_id)
    assert(got == List(1L), s"$got")
    assert(m.pendingHorizonUs.isEmpty)
  }

  test("cep negation validation bounds") {
    import graft.operators.Cep
    // leading negation — rejected (both modes)
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a", neg = true), Cep.Step("b")), 100L))
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a", neg = true), Cep.Step("b")), 100L,
      Cep.SkipPastLast, contiguous = false))
    // adjacent negations — rejected
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a"), Cep.Step("b", neg = true),
        Cep.Step("c", neg = true)), 100L))
    // quantified negation — rejected
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a"), Cep.Step("b", neg = true, plus = true)),
      100L))
    // relaxed negation before an OPTIONAL step — rejected
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a"), Cep.Step("b", neg = true),
        Cep.Step("c", opt = true), Cep.Step("d")), 100L,
      Cep.SkipPastLast, contiguous = false))
    // ...but fine in CONTIGUOUS mode (zero-width assertion on a row
    // the optional step may then consume)
    new Cep.Machine(
      IndexedSeq(Cep.Step("a"), Cep.Step("b", neg = true),
        Cep.Step("c", opt = true), Cep.Step("d")), 100L)
    // sum cap under relaxed contiguity — rejected
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a", plus = true, sumCap = Some(10L))), 100L,
      Cep.SkipPastLast, contiguous = false))
    // PREV offset below 1 — rejected
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a"),
        Cep.Step("b", cmp = Some(Cep.PrevLt), cmpOff = 0)), 100L))
    // AFTER MATCH targeting a negation — rejected
    intercept[IllegalArgumentException](new Cep.Machine(
      IndexedSeq(Cep.Step("a"), Cep.Step("b", neg = true),
        Cep.Step("c")), 100L, Cep.SkipToFirst(1)))
  }
}
