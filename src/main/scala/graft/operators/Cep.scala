package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Contiguous sequential pattern matching over keyed event series —
  * the MATCH_RECOGNIZE capability class (Flink SQL's CEP surface;
  * reference stack: the Table API walkthrough's own engine exposes it
  * as `MATCH_RECOGNIZE` — flink-kafka-table-api uses the same planner).
  * A pattern is a sequence of steps over the event-type alphabet, each
  * `One` or `OneOrMore` (greedy), matched over CONTIGUOUS rows per key
  * in (ts, event_id) order — an intervening non-matching row breaks the
  * partial match, exactly MATCH_RECOGNIZE row semantics (no row
  * skipping inside a match). After-match behavior is SKIP PAST LAST ROW
  * (matches never overlap); the optional window bounds last-row ts −
  * first-row ts, checked at completion.
  *
  * SUPPORTED PATTERN CLASS, enforced by `require`: ADJACENT step
  * symbols are distinct (so greedy consumption is deterministic — a
  * row can never extend the current step AND open the next one) and
  * the last step is `One` (a trailing OneOrMore has no greedy
  * completion point). Non-adjacent repeats (A B A) are fully
  * supported: the automaton is a shared-buffer matcher — it holds the
  * current partial's rows and, on a mismatch or a window-killed
  * completion, falls back to the next candidate start INSIDE the
  * buffer (the leftmost-start preference MATCH_RECOGNIZE defines),
  * which is exactly the partial-match buffering Flink's CEP NFA
  * carries. Exactness is pinned by CepMachineProps against an
  * independent try-every-start brute-force reference over random
  * patterns (repeats included), corpora, and windows.
  *
  * Scale shape: the SEGMENTED SEQUENTIAL SCAN family (see
  * [[TimeSeries.ewmaScanOf]]) — ONE key shuffle, per-partition
  * (key, ts, id) sort, then a streaming fold whose state is the
  * current PARTIAL's rows. The window prunes the buffer (a start
  * older than end − w can never complete, and rows before the first
  * viable start can never join any future match), so state per key is
  * bounded by the window span, never the series. Pattern matching's
  * order-dependence is non-associative, so no window/agg expresses
  * it; mapPartitions here is the documented last-resort tier.
  */
object Cep {

  /** One pattern step: match rows whose event_type equals `symbol` or
    * any member of `alt` (ALTERNATION — `(a|b)` is
    * `Step("a", …, alt = Set("b"))`). Quantifier flags: `plus` =
    * greedy OneOrMore; `opt` = the step may match ZERO rows (ZeroOrOne,
    * or with `plus` ZeroOrMore) — greedy: a matching row is always
    * consumed.
    */
  final case class Step(symbol: String, plus: Boolean,
      opt: Boolean = false, alt: Set[String] = Set.empty,
      rep: Option[(Int, Int)] = None) {
    /** The step's full symbol set. */
    def syms: Set[String] = alt + symbol
    /** Row-match test (set membership). */
    def matches(tpe: String): Boolean = tpe == symbol || alt.contains(tpe)
    /** Repetition bounds [lo, hi]: BOUNDED REPEAT `rep = Some((m, n))`
      * (greedy A{m,n}; overrides the flags, which must be unset), else
      * derived — One (1,1), OneOrMore (1,∞), ZeroOrOne (0,1),
      * ZeroOrMore (0,∞).
      */
    def bounds: (Int, Int) = rep.getOrElse(
      (if (opt) 0 else 1, if (plus) Int.MaxValue else 1))
  }

  /** One completed match: the key, first/last matched row, total rows
    * consumed (n_rows − the One steps = rows taken by the plus steps).
    */
  final case class CepMatch(user_id: Long, start_event_id: Long,
    start_ts_us: Long, end_event_id: Long, end_ts_us: Long, n_rows: Long)

  private[graft] def validate(pattern: Seq[Step]): Unit = {
    require(pattern.nonEmpty, "cep: empty pattern")
    // COLLAPSE-CLOSURE distinctness: any two steps separated only by
    // OPTIONAL steps must have distinct symbols (with zero steps
    // between, this is the plain adjacent-distinct rule). Optional
    // steps can vanish, so such step pairs can become adjacent in a
    // parse; if they shared a symbol, a row could extend/open either
    // one and greedy consumption would need backtracking. Under the
    // rule, consuming a matching row is always the unique viable
    // choice: a parse that instead skips the current optional step
    // must match the row at a later step reachable by skipping only
    // optionals — whose symbol would equal the current step's,
    // contradicting the rule. (The rule also stops a OneOrMore from
    // overshooting into a same-symbol step behind a vanishing
    // optional — e.g. A+ B? A is rejected, A B A stays supported.)
    val pat = pattern.toIndexedSeq
    for (i <- pat.indices) {
      var j = i + 1
      var chain = true
      while (chain && j < pat.length) {
        require((pat(i).syms intersect pat(j).syms).isEmpty,
          "cep: steps separated only by optional steps must have " +
            "DISJOINT symbol sets (greedy consumption is otherwise " +
            "ambiguous — fold A A into A+ or A)")
        chain = pat(j).bounds._1 == 0
        j += 1
      }
    }
    pat.foreach { st =>
      st.rep.foreach { case (lo, hi) =>
        require(!st.plus && !st.opt,
          "cep: rep bounds override the quantifier flags — leave plus/" +
            "opt unset on a bounded-repeat step")
        require(0 <= lo && lo <= hi && hi >= 1,
          s"cep: rep bounds must satisfy 0 <= lo <= hi, hi >= 1 " +
            s"(got ($lo, $hi))")
      }
    }
    require(pat.head.bounds._1 >= 1,
      "cep: first step must be required (candidate starts and window " +
        "pruning key on the first step's symbol)")
    require(pat.last.bounds == ((1, 1)),
      "cep: last step must be One (a trailing repeat or optional has " +
        "no greedy completion point)")
  }

  /** The exact automaton both the batch fold and the streaming
    * processor run: a SHARED-BUFFER matcher. State is the current
    * partial match's rows; each fed row appends and the buffer is
    * greedily re-walked against the pattern:
    *
    *   - PARTIAL (all rows consumed, pattern unfinished) → wait;
    *   - COMPLETE → window check from the buffer head; if the window
    *     kills it, fall back to the next candidate start inside the
    *     buffer and re-walk (leftmost-start preference — every
    *     pattern[0]-symbol row is a candidate, tried left to right);
    *   - MISMATCH → same fallback.
    *
    * The walk is deterministic because adjacent step symbols are
    * distinct (validate): a row can never both extend a OneOrMore step
    * and open the next step, so greed never needs backtracking WITHIN
    * a start — all backtracking is the start fallback, and each
    * fallback strictly shrinks the buffer, so feed() terminates in
    * O(|buffer|²) worst case per row (Flink's NFA pays the same shape
    * on its shared buffer). The window bounds the buffer: a head older
    * than ts − w can never start a completing match (completion ends
    * at ts or later), and rows before the first viable start can never
    * join a future match, so they prune eagerly.
    */
  /** Per-step MEASURES of one match: rows the step consumed, their
    * cents-value sum, and the step's first/last event ids (None when an
    * optional step matched zero rows) — COUNT/SUM/FIRST/LAST over a
    * pattern variable, MATCH_RECOGNIZE's measure primitives (AVG is
    * sum/cnt downstream).
    */
  final case class StepAgg(step: Int, symbol: String, cnt: Long,
    sum_value_c: Long, first_event_id: Option[Long],
    last_event_id: Option[Long])

  private[graft] final class Machine(pattern: IndexedSeq[Step],
      windowUs: Long, skipToNext: Boolean = false) extends Serializable {
    // (ts, id, tpe, value_c) — value_c rides along untouched by the
    // walk; MEASURES folds it per step span at completion
    private var buf = Vector.empty[(Long, Long, String, Long)]

    /** Checkpointable automaton state — the streaming processor carries
      * it in a ValueState across micro-batches.
      */
    def snapshot: List[(Long, Long, String, Long)] = buf.toList
    def restore(s: List[(Long, Long, String, Long)]): Unit = buf = s.toVector

    private final val Partial = 0
    private final val Complete = 1
    private final val Mismatch = 2

    // per-step (offset, take) in buf of the LAST walk — valid only
    // when that walk returned Complete (the MEASURES spans)
    private val spanOff = new Array[Int](pattern.length)
    private val spanLen = new Array[Int](pattern.length)

    /** Greedy deterministic walk of the whole buffer from its head.
      * Optional steps skip when the row does not match; when it does,
      * consuming is the unique viable choice (validate's
      * collapse-closure rule — see there for the argument).
      */
    private def walk(): Int = {
      var p = 0
      var s = 0
      while (s < pattern.length) {
        if (p >= buf.length) return Partial
        val st = pattern(s)
        val (lo, hi) = st.bounds
        var c = 0
        spanOff(s) = p
        while (p < buf.length && c < hi && st.matches(buf(p)._3)) {
          p += 1; c += 1
        }
        // buffer exhausted below the cap: the run may still extend (or
        // later steps need rows either way) — wait for more input
        if (p >= buf.length && c < hi) return Partial
        // here the run ended naturally (next row doesn't match) or hit
        // the cap; a leftover same-symbol row can never match the next
        // step (collapse-closure disjointness), so c is THE run take
        if (c >= lo) { spanLen(s) = c; s += 1 }
        else return Mismatch
      }
      // completion always lands on the last buffered row: the buffer
      // held a strict partial before this row arrived (or was trimmed
      // to a candidate-start suffix of one), so no rows can trail
      if (p == buf.length) Complete else Mismatch
    }

    /** Drop through the next candidate start (a pattern[0]-symbol row
      * after the current head); false when none remains (buffer
      * emptied).
      */
    private def dropToNextStart(): Boolean = {
      val i = buf.indexWhere(r => pattern(0).matches(r._3), 1)
      if (i < 0) { buf = Vector.empty; false }
      else { buf = buf.drop(i); true }
    }

    /** MEASURES fold over the just-completed walk's spans. */
    private def stepAggs(): List[StepAgg] =
      pattern.indices.map { s =>
        val off = spanOff(s)
        val len = spanLen(s)
        if (len == 0)
          StepAgg(s, pattern(s).symbol, 0L, 0L, None, None)
        else {
          var sum = 0L
          var i = off
          while (i < off + len) { sum += buf(i)._4; i += 1 }
          StepAgg(s, pattern(s).symbol, len.toLong, sum,
            Some(buf(off)._2), Some(buf(off + len - 1)._2))
        }
      }.toList

    /** Feed one row; emits every match this row closes, each with its
      * per-step MEASURES. SKIP PAST LAST ROW machines emit at most one
      * (acceptance clears the buffer); SKIP TO NEXT ROW machines
      * restart at the row after the accepted match's FIRST row, so one
      * fed row can close several overlapping matches (emitted in
      * start order — the leftmost-preference scan order).
      */
    def feedM(ts: Long, id: Long, tpe: String,
        valueC: Long): List[(CepMatch, List[StepAgg])] = {
      // window prune: heads that can no longer start a completing match
      while (buf.nonEmpty && ts - buf.head._1 > windowUs)
        if (!dropToNextStart()) ()
      buf = buf :+ ((ts, id, tpe, valueC))
      val out = scala.collection.mutable.ListBuffer
        .empty[(CepMatch, List[StepAgg])]
      var going = true
      while (going) {
        walk() match {
          case Partial => going = false
          case Complete =>
            val (sTs, sId, _, _) = buf.head
            if (ts - sTs <= windowUs) {
              out += ((CepMatch(-1L, sId, sTs, id, ts, buf.length.toLong),
                stepAggs()))
              if (skipToNext) {
                // resume at the row after the match's first row; the
                // retained suffix may close further matches at this
                // same fed row — keep walking
                buf = buf.drop(1)
                going = buf.nonEmpty
              } else {
                buf = Vector.empty // SKIP PAST LAST ROW
                going = false
              }
            } else if (!dropToNextStart()) going = false
          case _ =>
            if (!dropToNextStart()) going = false
        }
      }
      out.toList
    }

    /** Match-only convenience feed (value 0); at most one match under
      * SKIP PAST LAST ROW — the historical single-emit surface the
      * batch fold, streaming processor and property specs consume.
      */
    def feed(ts: Long, id: Long, tpe: String): Option[CepMatch] =
      feedM(ts, id, tpe, 0L).headOption.map(_._1)
  }

  /** Library form over any (user_id, ts, event_id, event_type) frame.
    * `skipToNext` selects the AFTER MATCH strategy: false = SKIP PAST
    * LAST ROW (matches never overlap — the default everywhere above);
    * true = SKIP TO NEXT ROW (resume at the row after the accepted
    * match's first row, so overlapping matches all emit — Flink's
    * second MATCH_RECOGNIZE strategy).
    */
  def cepMatchOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long, skipToNext: Boolean = false): Dataset[CepMatch] = {
    validate(pattern)
    val ss = events.sparkSession
    import ss.implicits._
    val pat = pattern.toIndexedSeq
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        var key = Long.MinValue
        var m: Machine = null
        it.flatMap { case (u, ts, id, tpe) =>
          if (m == null || u != key) {
            key = u; m = new Machine(pat, windowUs, skipToNext)
          }
          m.feedM(ts, id, tpe, 0L).map(_._1.copy(user_id = u))
        }
      }
  }

  /** One match × step row of [[cepMeasuresOf]]: the match identity
    * columns plus the step's MEASURES (COUNT, SUM of cents value,
    * FIRST/LAST event id — null when an optional step took no rows).
    */
  final case class CepMeasured(user_id: Long, start_event_id: Long,
    start_ts_us: Long, end_event_id: Long, end_ts_us: Long, n_rows: Long,
    step: Int, symbol: String, cnt: Long, sum_value_c: Long,
    first_event_id: Option[Long], last_event_id: Option[Long])

  /** MATCH_RECOGNIZE MEASURES — [[cepMatchOf]] with per-step
    * aggregates over the pattern variables: one output row per
    * (match, step), carrying COUNT/SUM/FIRST/LAST of the rows that
    * step consumed (AVG is sum/cnt downstream; value is the events
    * `value` in exact cents). The automaton already buffers the match
    * rows, so the measures are a driver-free fold over the completed
    * walk's step spans — same shuffle shape as the match-only form
    * (one key repartition, per-partition sort, segmented scan).
    */
  def cepMeasuresOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long, skipToNext: Boolean = false): Dataset[CepMeasured] = {
    validate(pattern)
    val ss = events.sparkSession
    import ss.implicits._
    val pat = pattern.toIndexedSeq
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"))
      .as[(Long, Long, Long, String, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        var key = Long.MinValue
        var m: Machine = null
        it.flatMap { case (u, ts, id, tpe, vc) =>
          if (m == null || u != key) {
            key = u; m = new Machine(pat, windowUs, skipToNext)
          }
          m.feedM(ts, id, tpe, vc).flatMap { case (c, aggs) =>
            aggs.map(a => CepMeasured(u, c.start_event_id, c.start_ts_us,
              c.end_event_id, c.end_ts_us, c.n_rows,
              a.step, a.symbol, a.cnt, a.sum_value_c,
              a.first_event_id, a.last_event_id))
          }
        }
      }
  }

  /** cep_funnel — the gate pattern: click → view+ → purchase over
    * contiguous per-user rows, completing within 7 days (the synthetic
    * corpus has uniform types with ~7 h median intra-user gaps, so a
    * session-scale window would be vacuously empty — 7 days yields a
    * non-trivial match set here, and the window-violation branch is
    * spec-pinned on a planted corpus where it bites). The DuckDB
    * oracle replays it definitionally as gaps-and-islands SQL: a match
    * is (last row of a click island, a whole view island, first row of
    * the adjacent purchase island) — provably the greedy automaton's
    * answer for this pattern class (restarting on a repeated `click`
    * makes the LAST click the match start; greed consumes the maximal
    * view island; SKIP PAST LAST ROW uses only the purchase island's
    * first row).
    */
  def cepFunnel(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click", plus = false), Step("view", plus = true),
        Step("purchase", plus = false)),
      windowUs = 7L * 24 * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_revisit — the WIDENED pattern class in the driver gate: a
    * NON-ADJACENT symbol repeat (view → click → view, all One steps),
    * the class the round-10 pairwise-distinct automaton `require`-
    * rejected and the shared-buffer rebuild supports (the trailing
    * `view` of a window-killed attempt is itself the next candidate
    * start — exactly the buffer-fallback path). The 24 h window binds
    * on the gate corpus (50 of 74 contiguous view-click-view triples
    * survive it at sf0.01), so the window-violation fallback is
    * exercised by the oracle, not just specs. For a One-only pattern,
    * greedy leftmost + SKIP PAST LAST ROW is definitionally "scan the
    * window-valid contiguous triples in row order, accept the first,
    * then the next with start_rn > accepted_rn + 2" — the DuckDB
    * oracle replays that selection with a recursive CTE over
    * precomputed next-candidate pointers.
    */
  def cepRevisit(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("view", plus = false), Step("click", plus = false),
        Step("view", plus = false)),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_optional — the OPTIONAL-step class in a driver gate:
    * click → error? → purchase within 12 h (both shapes bind at gate
    * SF: ~259 direct pairs and ~27 error-mediated triples survive the
    * window, which kills ~30% of each). Oracle simplification this
    * pattern affords: a candidate's interior rows are error/purchase
    * (never click), so no candidate can start inside another — SKIP
    * PAST LAST ROW excludes nothing, and greedy-leftmost selection is
    * definitionally ALL window-valid candidates (the machine still
    * runs its full fallback logic; the revisit gate covers the
    * overlapping-candidate chain).
    */
  def cepOptional(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click", plus = false),
        Step("error", plus = false, opt = true),
        Step("purchase", plus = false)),
      windowUs = 12L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_alternation — the ALTERNATION class in a driver gate:
    * click → (view|error)+ → purchase within 24 h (binds: 133 of 264
    * funnels survive at sf0.01). The oracle is the cep_funnel islands
    * CTE over the CLASS column (view/error collapse to one symbol
    * class — exactly what a set step is), window predicate included;
    * killed candidates don't interact (funnel-shape islands are
    * disjoint), the same argument the stream_cep gate already proves
    * under a binding window.
    */
  def cepAlternation(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click", plus = false),
        Step("view", plus = true, alt = Set("error")),
        Step("purchase", plus = false)),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_bounded — the BOUNDED-REPEAT class in a driver gate:
    * click → view{2,3} → purchase within 7 d. BOTH bounds bind at gate
    * SF (72 one-view funnels fall below lo, 3 of ≥4 views exceed hi;
    * 15 match): a view run longer than hi leaves a view the purchase
    * step can't match — by collapse-closure disjointness no parse
    * exists from that start at all, which is why the greedy capped
    * take stays exact. Oracle: the funnel islands CTE with the island
    * length BETWEEN the bounds.
    */
  def cepBounded(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click", plus = false),
        Step("view", plus = false, rep = Some((2, 3))),
        Step("purchase", plus = false)),
      windowUs = 7L * 24 * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_measures — the MEASURES clause over the gate funnel
    * (click → view+ → purchase, 7 d window): per match, each step's
    * COUNT / SUM(value_c) / FIRST / LAST. The funnel islands oracle
    * extends naturally: the click step is the click island's LAST row
    * (cnt 1), the view step the WHOLE view island (its count, value
    * sum and boundary ids), the purchase step the purchase island's
    * FIRST row — three rows per match, definitionally.
    */
  def cepMeasures(s: SparkSession, dir: String): DataFrame =
    cepMeasuresOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click", plus = false), Step("view", plus = true),
        Step("purchase", plus = false)),
      windowUs = 7L * 24 * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"),
        col("step"))

  /** cep_skip_next — AFTER MATCH SKIP TO NEXT ROW on the revisit
    * pattern (view → click → view, 24 h): acceptance resumes at the
    * row after the match's first row, so overlapping matches all emit
    * and the answer is definitionally ALL window-valid contiguous
    * triples — provably different from cep_revisit's SKIP PAST LAST
    * ROW subset (the strategies differ whenever consecutive valid
    * triples overlap, which the gate corpus has). The oracle is the
    * revisit candidate CTE with the recursive skip-selection removed.
    */
  def cepSkipNext(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("view", plus = false), Step("click", plus = false),
        Step("view", plus = false)),
      windowUs = 24L * 3600 * 1000000, skipToNext = true)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))
}
