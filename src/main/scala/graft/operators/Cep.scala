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
  * SUPPORTED PATTERN CLASS, enforced by `require`: step symbols are
  * pairwise DISTINCT and the last step is `One`. Distinct symbols make
  * the greedy automaton's failure function trivial — on a mismatch the
  * only row that can open a new partial is the current row itself
  * (no mid-partial suffix can re-form a prefix, since every partial row
  * carries a non-initial symbol) — so the single-pass fold below is
  * exact, with no backtracking and no KMP table. Funnel-shaped
  * analytics patterns (landing → engagement+ → conversion) live in
  * this class; patterns with repeated symbols need a failure-function
  * automaton and are out of scope (documented, not silently wrong).
  *
  * Scale shape: the SEGMENTED SEQUENTIAL SCAN family (see
  * [[TimeSeries.ewmaScanOf]]) — ONE key shuffle, per-partition
  * (key, ts, id) sort, then a streaming fold with O(pattern) state per
  * key. Pattern matching's order-dependence is non-associative, so no
  * window/agg expresses it; mapPartitions here is the documented
  * last-resort tier, and state never grows with the series.
  */
object Cep {

  /** One pattern step: match rows whose event_type equals `symbol`;
    * `plus` = greedy OneOrMore (else exactly one row).
    */
  final case class Step(symbol: String, plus: Boolean)

  /** One completed match: the key, first/last matched row, total rows
    * consumed (n_rows − the One steps = rows taken by the plus steps).
    */
  final case class CepMatch(user_id: Long, start_event_id: Long,
    start_ts_us: Long, end_event_id: Long, end_ts_us: Long, n_rows: Long)

  private[graft] def validate(pattern: Seq[Step]): Unit = {
    require(pattern.nonEmpty, "cep: empty pattern")
    require(pattern.map(_.symbol).distinct.length == pattern.length,
      "cep: step symbols must be pairwise distinct (the trivial-failure " +
        "automaton class); repeated symbols need a KMP-style automaton")
    require(!pattern.last.plus,
      "cep: last step must be One (a trailing OneOrMore has no greedy " +
        "completion point)")
  }

  /** The exact single-pass automaton both the batch fold and the
    * streaming processor run. State: step index of the LAST matched
    * step (-1 = idle), the OPENING-RUN candidate starts, rows consumed.
    *
    * The opening run matters because of the window under leftmost
    * semantics: when step 0 is OneOrMore, every row of its run is a
    * candidate start, and MATCH_RECOGNIZE tries starts left to right —
    * so if the window kills the match from the earliest start, the
    * match from the EARLIEST STILL-VIABLE run row (ts ≥ end_ts − w)
    * wins instead, with the earlier run rows released. A counts-only
    * automaton silently under-matches exactly there (the CepMachineProps
    * reference-divergence property caught this); the fix keeps the
    * opening run's (ts, id) rows — state O(opening run), the same
    * partial-match buffering Flink's NFA does, and a single (ts, id)
    * for One-quantified first steps.
    */
  private[graft] final class Machine(pattern: IndexedSeq[Step],
      windowUs: Long) extends Serializable {
    private var step = -1
    private var openRun = List.empty[(Long, Long)] // (ts, id), REVERSED
    private var rows = 0L

    def reset(): Unit = { step = -1; rows = 0L; openRun = Nil }

    /** Checkpointable automaton state — the streaming processor carries
      * it in a ValueState across micro-batches.
      */
    def snapshot: (Int, Long, List[(Long, Long)]) = (step, rows, openRun)
    def restore(s: (Int, Long, List[(Long, Long)])): Unit = {
      step = s._1; rows = s._2; openRun = s._3
    }

    private def complete(ts: Long, id: Long): Option[CepMatch] = {
      // leftmost viable start: earliest opening-run row within window
      val starts = openRun.reverse
      val m = starts.zipWithIndex.collectFirst {
        case ((sTs, sId), k) if ts - sTs <= windowUs =>
          CepMatch(-1L, sId, sTs, id, ts, rows - k)
      }
      reset() // SKIP PAST LAST ROW whether or not the window admitted it
      m
    }

    /** Feed one row; emits the completed match if this row closes one. */
    def feed(ts: Long, id: Long, tpe: String): Option[CepMatch] = {
      if (step >= 0) {
        val cur = pattern(step)
        if (cur.plus && tpe == cur.symbol) {
          rows += 1
          if (step == 0) openRun = (ts, id) :: openRun
          return None
        }
        if (step + 1 < pattern.length && tpe == pattern(step + 1).symbol) {
          step += 1; rows += 1
          if (step == pattern.length - 1) return complete(ts, id)
          return None
        }
        reset() // mismatch: fall through — this row may open a new match
      }
      if (tpe == pattern(0).symbol) {
        step = 0; openRun = List((ts, id)); rows = 1L
        if (pattern.length == 1) complete(ts, id) else None
      } else None
    }
  }

  /** Library form over any (user_id, ts, event_id, event_type) frame. */
  def cepMatchOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long): Dataset[CepMatch] = {
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
          if (m == null || u != key) { key = u; m = new Machine(pat, windowUs) }
          m.feed(ts, id, tpe).map(_.copy(user_id = u))
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
}
