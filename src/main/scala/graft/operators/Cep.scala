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
  * PATTERN CLASSES (r12: the full regex-greedy class is supported):
  * patterns whose adjacent step symbols are distinct (the collapse-
  * closure class, where greedy consumption is deterministic — a row
  * can never extend the current step AND open the next one) run the
  * O(buffer) greedy walk; patterns OUTSIDE the class (A A, A+ B? A,
  * intersecting adjacent alternation sets) automatically take the
  * memoized BACKTRACKING walk with identical regex-greedy semantics
  * (see [[closureHolds]] and `walkBack` — which also carries DEFINE
  * predicates, wildcard steps and TRAILING quantified steps, whose
  * greedy runs resolve at the first bounding row, a window-stale
  * feed, or — batch only — the end-of-input flush). One requirement
  * remains for every contiguous pattern: a
  * required predicate-free first step (candidate starts key on it).
  * The automaton is a shared-buffer
  * matcher — it holds the current partial's rows and, on a mismatch or
  * a window-killed completion, falls back to the next candidate start
  * INSIDE the buffer (the leftmost-start preference MATCH_RECOGNIZE
  * defines), which is exactly the partial-match buffering Flink's CEP
  * NFA carries. Exactness is pinned by CepMachineProps against
  * independent brute-force AND java.util.regex references over random
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

  /** A DEFINE-clause predicate comparing the row's value against the
    * PHYSICALLY PREVIOUS row's value — MATCH_RECOGNIZE's
    * `X.value < PREV(X.value)` family (PREV navigates input rows; in
    * contiguous matching the previous input row is the previous match
    * row for every step after the first). The canonical V-pattern
    * (STRT DOWN+ UP+) is `PrevLt` / `PrevGt`.
    */
  sealed trait PrevCmp extends Serializable
  case object PrevLt extends PrevCmp
  case object PrevGt extends PrevCmp
  case object PrevLe extends PrevCmp
  case object PrevGe extends PrevCmp

  private[graft] def cmpHolds(c: PrevCmp, l: Long, r: Long): Boolean =
    c match {
      case PrevLt => l < r
      case PrevGt => l > r
      case PrevLe => l <= r
      case PrevGe => l >= r
    }

  /** A CROSS-VARIABLE DEFINE predicate — the SQL-standard /
    * Flink-canonical `A.value <op> FIRST/LAST(B.value)` family (and
    * the bare `A.value <op> B.value`, the standard's implicit
    * LAST(B.value)): the row's value compares against the FIRST or
    * LAST row that ANOTHER, already-matched step consumed in the
    * current parse. `step` is the referenced step's flat index and
    * must be STRICTLY BEFORE the carrying step (a reference to a
    * not-yet-matched variable has no rows to navigate — rejected as
    * undecidable, the same rule Flink's planner applies). If the
    * referenced step consumed ZERO rows (an optional that took
    * nothing), the navigation is NULL and the row does not match —
    * SQL NULL-comparison semantics, exactly like PREV off the buffer
    * head. Cross-referencing steps run on the backtracking walk, and
    * because the referenced span depends on the PATH (the referenced
    * step's take), (step, position) memoization is disabled from the
    * first position a later step's reference can reach back across
    * (see walkBack's memoOkFrom) — the walk degrades to plain
    * backtracking there, still window-bounded per feed.
    */
  final case class CrossRef(step: Int, first: Boolean, cmp: PrevCmp)
    extends Serializable

  /** One pattern step: match rows whose event_type equals `symbol` or
    * any member of `alt` (ALTERNATION — `(a|b)` is
    * `Step("a", …, alt = Set("b"))`), or ANY type when `any` is set
    * (MATCH_RECOGNIZE's undefined variable — always true). Quantifier
    * flags: `plus` = greedy OneOrMore; `opt` = the step may match ZERO
    * rows (ZeroOrOne, or with `plus` ZeroOrMore) — greedy: a matching
    * row is always consumed. `cmp` adds a DEFINE predicate on the
    * row's value vs a previous row's ([[PrevCmp]]) — `cmpOff` selects
    * WHICH previous row, MATCH_RECOGNIZE's `PREV(X.value, k)` offset
    * (default 1 = the physically previous row). PREV is MATCH-SCOPED:
    * a k-back position falling before the match candidate's first row
    * evaluates as NULL (the row never matches) — full-input PREV would
    * need a k-row look-behind over rows the segmented scan and the
    * streaming state have deliberately dropped, so the machine keeps
    * the scoped reading (with k = 1 the two coincide everywhere a cmp
    * step can legally sit, since step 0 cannot carry cmp). `sumCap`
    * adds a
    * RUNNING-AGGREGATE DEFINE predicate: each row of the step's run
    * matches only while the run's cumulative cents value INCLUDING the
    * row stays <= the cap — `SUM(X.value) <= c`, evaluated per row
    * exactly as SQL DEFINE does (the first violating row bounds the
    * run). `reluctant`
    * flips the quantifier to LAZY (regex `+?`: the SHORTEST take that
    * lets the rest of the pattern match wins — MATCH_RECOGNIZE's
    * reluctant quantifiers). `neg` makes the step a ZERO-WIDTH ABSENCE
    * assertion over its symbol set — Flink CEP's negative patterns: in
    * contiguous mode `notNext` (the physically next row, if inside the
    * window horizon, must not match), in relaxed mode `notFollowedBy`
    * (no matching row between the previous step's last consumed row
    * and the next step's first — or, trailing, anywhere inside the
    * window horizon, with emission at horizon expiry). Steps with
    * `cmp`, `any`, `reluctant`, `neg` or `sumCap`,
    * like all non-closure shapes, run on the backtracking walk.
    */
  final case class Step(symbol: String, plus: Boolean = false,
      opt: Boolean = false, alt: Set[String] = Set.empty,
      rep: Option[(Int, Int)] = None, any: Boolean = false,
      cmp: Option[PrevCmp] = None, reluctant: Boolean = false,
      neg: Boolean = false, cmpOff: Int = 1,
      sumCap: Option[Long] = None,
      cross: List[CrossRef] = Nil) {
    /** The step's full symbol set (alphabet contribution; meaningless
      * under `any`).
      */
    def syms: Set[String] = alt + symbol
    /** Symbol-only row-match test (set membership / wildcard). */
    def matches(tpe: String): Boolean =
      any || tpe == symbol || alt.contains(tpe)
    /** Full row-match: symbol test plus the DEFINE predicate against
      * the cmpOff-back row's value (None = no such row — a `cmp`
      * step never matches there, exactly NULL-comparison semantics).
      */
    def matchesRow(tpe: String, valueC: Long,
        prevValueC: Option[Long]): Boolean =
      matches(tpe) &&
        cmp.forall(c => prevValueC.exists(pv => cmpHolds(c, valueC, pv)))
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

  /** GROUP-QUANTIFIER pattern tree — quantifiers over SEQUENCES, the
    * one MATCH_RECOGNIZE shape a flat step list cannot express:
    * `PATTERN ((A B)+ C)` repeats the two-step sequence A B. [[GLf]]
    * wraps an ordinary [[Step]] (its own quantifier/alternation/DEFINE
    * fields all apply), [[GCat]] concatenates, [[GRep]] repeats a
    * sub-pattern `{lo, hi}` with greedy (default) or reluctant bias —
    * `(…)+` is GRep(_, 1, Int.MaxValue), `(…)?` GRep(_, 0, 1), `(…)*`
    * GRep(_, 0, Int.MaxValue). The tree compiles to a tiny
    * Thompson-style program (RunM / SplitI / JumpI / AcceptI) the
    * machine walks with the SAME memoized backtracking discipline as
    * the flat class: split branches try the preferred arm first
    * (greedy = loop-continue, reluctant = exit), the first
    * non-Mismatch outcome decides, a leaf run reaching the buffer end
    * below its cap waits (Partial) while the window still admits
    * future rows, and the window check lives at Accept so shorter
    * parses survive a window-killed longest one. Bounded group repeats
    * unroll at compile time (hi − lo ≤ 16 enforced); unbounded ones
    * compile to a split-back loop whose body must consume ≥ 1 row
    * (validated — a nullable starred body would loop forever).
    */
  sealed trait GPat extends Serializable
  final case class GLf(step: Step) extends GPat
  final case class GCat(items: Seq[GPat]) extends GPat
  final case class GRep(body: GPat, lo: Int, hi: Int,
    reluctant: Boolean = false) extends GPat
  /** Alternation of SUB-SEQUENCES — `(A B | C D)`: arms tried in
    * order, leftmost preferred (regex alternation's bias), each arm
    * any sub-pattern. With [[GCat]]/[[GRep]]/leaf predicates this
    * completes the full regex algebra over predicated symbols.
    */
  final case class GAlt(arms: Seq[GPat]) extends GPat

  /** Calcite/Flink MATCH_RECOGNIZE `PERMUTE(A, B, …)` — all orderings
    * of the given steps, expanded at build time to sequence
    * alternation ([[GAlt]] of the n! [[GCat]] orderings, listed-order
    * lexicographic like Calcite's expansion). Bounded at n <= 4 (24
    * arms): the expansion is factorial and a larger n is a modeling
    * smell — compose explicit alternation instead.
    */
  def permute(steps: Seq[Step]): GPat = {
    require(steps.length >= 2 && steps.length <= 4,
      s"cep: PERMUTE expands to n! alternation arms — supported for " +
        s"2 <= n <= 4 steps (got ${steps.length})")
    GAlt(steps.permutations.map(ord =>
      GCat(ord.map(st => GLf(st)).toList): GPat).toList)
  }

  private[graft] sealed trait GInstr extends Serializable
  /** `leaf` = the instruction's source leaf's index in [[gLeaves]]
    * order — a bounded repeat unrolls one RunM copy per iteration, all
    * sharing the source leaf's index, which is what lets the walk
    * accumulate a repeated group's per-leaf consumed positions across
    * iterations (grouped MEASURES / ALL ROWS output).
    */
  private[graft] final case class RunM(step: Step, leaf: Int) extends GInstr
  private[graft] final case class SplitI(var a: Int, var b: Int)
    extends GInstr
  private[graft] final case class JumpI(k: Int) extends GInstr
  private[graft] case object AcceptI extends GInstr

  /** Minimal rows a sub-pattern must consume. */
  private[graft] def gMinLen(p: GPat): Int = p match {
    case GLf(st)            => st.bounds._1
    case GCat(items)        => items.map(gMinLen).sum
    case GRep(b, lo, _, _)  => lo * gMinLen(b)
    case GAlt(arms)         => arms.map(gMinLen).min
  }

  private[graft] def gLeaves(p: GPat): Seq[Step] = p match {
    case GLf(st)     => Seq(st)
    case GCat(items) => items.flatMap(gLeaves)
    case GRep(b, _, _, _) => gLeaves(b)
    case GAlt(arms)  => arms.flatMap(gLeaves)
  }

  /** The FIRST set: leaves that can consume a match's first row
    * (nullable-aware). Candidate-start pruning keys on it.
    */
  private[graft] def gFirstSteps(p: GPat): Seq[Step] = {
    val out = Seq.newBuilder[Step]
    // returns nullable
    def walk(n: GPat): Boolean = n match {
      case GLf(st) => out += st; st.bounds._1 == 0
      case GCat(items) =>
        var nullable = true
        val it = items.iterator
        while (nullable && it.hasNext) nullable = walk(it.next())
        nullable
      case GRep(b, lo, _, _) => walk(b) || lo == 0
      case GAlt(arms) =>
        // every arm contributes firsts; the alternation is nullable
        // iff SOME arm is (walk all arms eagerly for the first set)
        arms.map(walk).exists(identity)
    }
    walk(p)
    out.result()
  }

  private[graft] def validateGrouped(p: GPat): Unit = {
    val ls = gLeaves(p)
    require(ls.nonEmpty, "cep: empty grouped pattern")
    require(gMinLen(p) >= 1,
      "cep: a grouped pattern must consume at least one row (an " +
        "all-optional pattern would accept the empty match)")
    ls.zipWithIndex.foreach { case (st, i) =>
      require(!st.neg,
        "cep: negation steps are the linear machine's — compose " +
          "absence with cepMatchOf/cepFollowedByOf patterns")
      // CROSS-VARIABLE DEFINE on grouped patterns (r17): the
      // referenced index is a LEAF index in gLeaves preorder and must
      // be STRICTLY EARLIER than the carrying leaf. Semantics are the
      // Flink IterativeCondition reading the split-program walk makes
      // well-defined: the reference resolves against the referenced
      // leaf's consumed-position POOL as of the current path —
      // accumulated ACROSS group iterations (the r14 ALL-ROWS
      // machinery), with the current iteration's rows included when
      // the referenced leaf executes before the carrying one inside
      // the body. FIRST/LAST navigate that pool; an empty pool (a
      // sibling alternation arm not taken, an optional that consumed
      // nothing) is NULL and the row does not match — the same
      // NULL-comparison rule as the flat machine's span navigation.
      st.cross.foreach { cr =>
        require(cr.step >= 0 && cr.step < ls.length,
          s"cep: cross reference targets leaf ${cr.step} of " +
            s"${ls.length}")
        require(cr.step < i,
          "cep: a grouped cross-variable reference must target a leaf " +
            "STRICTLY EARLIER in pattern preorder — a later leaf has " +
            "no rows to navigate on any path reaching this one")
      }
      require(st.cmpOff >= 1, "cep: PREV offset must be >= 1")
      st.rep.foreach { case (lo, hi) =>
        require(!st.plus && !st.opt && 0 <= lo && lo <= hi && hi >= 1,
          "cep: bad leaf rep bounds")
      }
    }
    def walkReps(n: GPat): Unit = n match {
      case GLf(_) => ()
      case GCat(items) => items.foreach(walkReps)
      case GAlt(arms) =>
        require(arms.nonEmpty, "cep: empty alternation")
        arms.foreach(walkReps)
      case GRep(b, lo, hi, _) =>
        require(0 <= lo && lo <= hi && hi >= 1,
          s"cep: group rep bounds must satisfy 0 <= lo <= hi ($lo, $hi)")
        require(hi == Int.MaxValue || hi - lo <= 16,
          "cep: bounded group repeats unroll at compile time — keep " +
            "hi - lo <= 16 (use an unbounded repeat + window otherwise)")
        require(gMinLen(b) >= 1,
          "cep: a repeated group's body must consume at least one row " +
            "per iteration (a nullable body loops forever)")
        walkReps(b)
    }
    walkReps(p)
    gFirstSteps(p).foreach { st =>
      require(st.cmp.isEmpty,
        "cep: a leaf that can open the match cannot carry a PREV " +
          "predicate — the row before the match start is outside the " +
          "buffer (same rule as the linear machine's step 0)")
      // a first-set leaf MAY carry a cross reference (unlike PREV):
      // when it opens the match the referenced pool is empty → NULL →
      // the row does not match THERE, but paths where an earlier
      // optional leaf consumed still reach it legitimately (A* B with
      // B referencing A ≡ A+ B) — runtime NULL resolution, not a
      // rejection
    }
  }

  /** Compile the tree to the split-program. Greedy GRep loops prefer
    * another body iteration, reluctant ones the exit; GAlt arms are
    * tried leftmost-first (regex alternation's bias).
    */
  private[graft] def compileGrouped(p: GPat): Vector[GInstr] = {
    validateGrouped(p)
    val prog = scala.collection.mutable.ArrayBuffer.empty[GInstr]
    // `base` threads each sub-pattern's first-leaf index through the
    // generator so every RunM copy knows its source leaf (gLeaves
    // preorder: GCat items in order, GAlt arms in order, GRep = body)
    def leafCount(n: GPat): Int = gLeaves(n).length
    def gen(n: GPat, base: Int): Unit = n match {
      case GLf(st)     => prog += RunM(st, base)
      case GCat(items) =>
        var b = base
        items.foreach { it => gen(it, b); b += leafCount(it) }
      case GAlt(arms) =>
        // split chain, leftmost arm preferred; every non-last arm
        // jumps past the whole alternation (patched at the end)
        val jumpAts = scala.collection.mutable.ListBuffer.empty[Int]
        var armBase = base
        arms.zipWithIndex.foreach { case (arm, i) =>
          if (i < arms.length - 1) {
            val sp = SplitI(-1, -1)
            val at = prog.length
            prog += sp
            gen(arm, armBase)
            jumpAts += prog.length
            prog += JumpI(-1) // patched below
            sp.a = at + 1        // try this arm first...
            sp.b = prog.length   // ...else fall through to the next
          } else gen(arm, armBase)
          armBase += leafCount(arm)
        }
        val end = prog.length
        jumpAts.foreach(j => prog(j) = JumpI(end))
      case GRep(b, lo, hi, rel) =>
        (0 until lo).foreach(_ => gen(b, base))
        if (hi == Int.MaxValue) {
          val sp = SplitI(-1, -1)
          val l1 = prog.length
          prog += sp
          gen(b, base)
          prog += JumpI(l1)
          if (rel) { sp.a = prog.length; sp.b = l1 + 1 }
          else { sp.a = l1 + 1; sp.b = prog.length }
        } else {
          // each optional copy: continue into the copy's body or exit
          // straight past the whole unrolled block
          val exits =
            scala.collection.mutable.ListBuffer.empty[(SplitI, Int)]
          (0 until hi - lo).foreach { _ =>
            val sp = SplitI(-1, -1)
            val at = prog.length
            prog += sp; exits += ((sp, at))
            gen(b, base)
          }
          exits.foreach { case (sp, at) =>
            if (rel) { sp.a = prog.length; sp.b = at + 1 }
            else { sp.a = at + 1; sp.b = prog.length }
          }
        }
    }
    gen(p, 0)
    prog += AcceptI
    prog.toVector
  }

  /** AFTER MATCH strategy — where matching resumes after an accepted
    * match, MATCH_RECOGNIZE's full strategy set (Flink ships the same
    * four): [[SkipPastLast]] drops the whole match (matches never
    * overlap — the default); [[SkipToNextRow]] resumes at the row
    * after the match's FIRST row (all overlapping matches emit);
    * [[SkipToFirst]]/[[SkipToLast]] resume at the first/last row the
    * given pattern step consumed — the selective middle ground (skips
    * re-matches starting inside the prefix before that step, keeps
    * ones from it onward). FIRST/LAST require `1 <= step` and a
    * required step (`lo >= 1`): step 0 or an empty variable could
    * resume at the match's own start and loop forever — the same
    * cases Flink rejects at runtime, rejected here up front.
    */
  sealed trait AfterMatch extends Serializable
  case object SkipPastLast extends AfterMatch
  case object SkipToNextRow extends AfterMatch
  final case class SkipToFirst(step: Int) extends AfterMatch
  final case class SkipToLast(step: Int) extends AfterMatch

  private[graft] def validateAfter(pattern: Seq[Step],
      after: AfterMatch): Unit = {
    def checkStep(s: Int, name: String): Unit = {
      require(s >= 1 && s < pattern.length,
        s"cep: $name step must be in [1, ${pattern.length - 1}] — " +
          "resuming at step 0's first row would re-match the same start")
      require(pattern(s).bounds._1 >= 1 && !pattern(s).neg,
        s"cep: $name target step must be required and consuming " +
          "(lo >= 1, not a negation) — an empty or zero-width pattern " +
          "variable has no first/last row to resume at")
    }
    after match {
      case SkipToFirst(s) => checkStep(s, "SKIP TO FIRST")
      case SkipToLast(s)  => checkStep(s, "SKIP TO LAST")
      case _              => ()
    }
  }

  /** The NEGATION structure rules shared by both contiguity modes: a
    * neg step is a pure zero-width symbol assertion (no quantifier, no
    * value predicate, no wildcard), cannot open the pattern (candidate
    * starts key on a consuming first step), cannot follow another neg
    * (assert both symbols with one `alt` set instead), and — relaxed
    * mode only — cannot precede a step that may consume ZERO rows (the
    * gap under watch would silently extend past the empty step; fold
    * the optional step away or make it required).
    */
  private def validateNeg(pattern: Seq[Step], relaxed: Boolean): Unit = {
    val pat = pattern.toIndexedSeq
    pat.zipWithIndex.foreach { case (st, i) =>
      if (st.neg) {
        require(!st.plus && !st.opt && st.rep.isEmpty && !st.reluctant,
          "cep: a negation step is zero-width — quantifiers don't apply")
        require(st.cmp.isEmpty && st.sumCap.isEmpty && st.cross.isEmpty &&
          !st.any,
          "cep: a negation step asserts SYMBOL absence only (no value " +
            "predicates, no wildcard — a not-anything step can never " +
            "pass)")
        require(i > 0,
          "cep: a pattern cannot open with a negation — candidate " +
            "starts key on a consuming first step (Flink rejects a " +
            "leading notNext/notFollowedBy the same way)")
        require(!pat(i - 1).neg,
          "cep: adjacent negation steps — assert both symbol sets with " +
            "one step's alt set instead")
        if (relaxed && i < pat.length - 1)
          require(pat(i + 1).bounds._1 >= 1,
            "cep: a relaxed negation must precede a REQUIRED step — an " +
              "optional successor would silently extend the watched gap")
      }
    }
  }

  /** Relaxed-contiguity (followedBy) pattern class: symbol steps with
    * any quantifier (r13 — looping relaxed states: a quantified step's
    * run is a SUBSEQUENCE of matching rows, greedy by default), plus
    * zero-width negations ([[validateNeg]]). Alternation and repeated
    * symbols are fine (subsequence parsing needs no closure rule);
    * `cmp`/`any` stay banned — a PREV predicate navigates physically
    * adjacent rows, which followedBy deliberately skips, and a
    * wildcard step would defeat the alphabet-bounded state contract.
    */
  private[graft] def validateSubseq(pattern: Seq[Step]): Unit = {
    require(pattern.nonEmpty, "cep: empty pattern")
    pattern.foreach { st =>
      require(st.cmp.isEmpty && !st.any,
        "cep: relaxed contiguity supports symbol steps only — a PREV " +
          "predicate navigates physically adjacent rows, which " +
          "followedBy deliberately skips, and a wildcard step would " +
          "defeat the alphabet-bounded state contract")
      require(st.sumCap.isEmpty,
        "cep: running-aggregate DEFINE predicates are contiguous-mode " +
          "only (a relaxed run's membership is not prefix-decidable " +
          "under a cap when rows can be skipped)")
      st.rep.foreach { case (lo, hi) =>
        require(!st.plus && !st.opt,
          "cep: rep bounds override the quantifier flags")
        require(0 <= lo && lo <= hi && hi >= 1,
          s"cep: rep bounds must satisfy 0 <= lo <= hi, hi >= 1 " +
            s"(got ($lo, $hi))")
      }
    }
    // r16: cross-variable DEFINE references run in relaxed mode too —
    // the GENERALIZED subsequence walk tracks per-step consumed
    // positions (`taken`), so FIRST/LAST navigation reads the current
    // path's takes exactly as the backtracking walk's span arrays do.
    // Same structural rules as the contiguous class: strictly-earlier
    // target, never a zero-width negation.
    pattern.toIndexedSeq.zipWithIndex.foreach { case (st, i) =>
      st.cross.foreach { cr =>
        require(cr.step >= 0 && cr.step < i,
          s"cep: a cross-variable DEFINE reference must name an " +
            s"EARLIER step (step $i references ${cr.step} — a " +
            "not-yet-matched variable has no rows to navigate)")
        require(!pattern(cr.step).neg,
          "cep: a cross-variable reference targets a zero-width " +
            "negation step, which consumes no row to navigate")
      }
    }
    require(pattern.head.bounds._1 >= 1 && !pattern.head.neg,
      "cep: first step must be required and consuming (candidate " +
        "starts and window pruning key on the first step's symbol)")
    validateNeg(pattern, relaxed = true)
  }

  /** COLLAPSE-CLOSURE distinctness: any two steps separated only by
    * OPTIONAL steps have distinct symbols (with zero steps between,
    * this is the plain adjacent-distinct rule). Optional steps can
    * vanish, so such step pairs can become adjacent in a parse; if
    * they shared a symbol, a row could extend/open either one and
    * greedy consumption would need backtracking. Under the rule,
    * consuming a matching row is always the unique viable choice: a
    * parse that instead skips the current optional step must match the
    * row at a later step reachable by skipping only optionals — whose
    * symbol would equal the current step's, contradicting the rule.
    * (The rule also stops a OneOrMore from overshooting into a
    * same-symbol step behind a vanishing optional.)
    *
    * Patterns INSIDE the class run the O(buffer) greedy walk; patterns
    * outside it (A A, A+ B? A, intersecting adjacent sets) fall back
    * to the memoized BACKTRACKING walk — same semantics class as
    * regex/Flink-NFA greedy matching (since r12 the class is a fast
    * path, not a boundary).
    */
  private[graft] def closureHolds(pattern: IndexedSeq[Step]): Boolean = {
    // an `any` step's symbol set is universal — it intersects every
    // other step's
    def disjoint(a: Step, b: Step): Boolean =
      !a.any && !b.any && (a.syms intersect b.syms).isEmpty
    pattern.indices.forall { i =>
      var j = i + 1
      var chain = true
      var ok = true
      while (chain && j < pattern.length) {
        ok = ok && disjoint(pattern(i), pattern(j))
        chain = pattern(j).bounds._1 == 0
        j += 1
      }
      ok
    }
  }

  /** The checks every contiguous pattern needs regardless of walk
    * strategy: non-empty, sane rep bounds, required first step
    * (candidate starts and pruning key on it), One last step (a
    * trailing repeat or optional has no greedy completion point even
    * with backtracking — the walk could never commit).
    */
  private[graft] def validateCommon(pattern: Seq[Step]): Unit = {
    require(pattern.nonEmpty, "cep: empty pattern")
    val pat = pattern.toIndexedSeq
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
    pat.foreach { st =>
      require(st.cmpOff >= 1,
        s"cep: PREV offset must be >= 1 (got ${st.cmpOff})")
      require(!st.neg || !st.any, "cep: negation of a wildcard")
    }
    pat.zipWithIndex.foreach { case (st, i) =>
      st.cross.foreach { cr =>
        require(cr.step >= 0 && cr.step < i,
          s"cep: a cross-variable DEFINE reference must name an " +
            s"EARLIER step (step $i references ${cr.step} — a " +
            "not-yet-matched variable has no rows to navigate)")
        require(!pat(cr.step).neg,
          "cep: a cross-variable reference targets a zero-width " +
            "negation step, which consumes no row to navigate")
      }
    }
    require(pat.head.bounds._1 >= 1 && !pat.head.neg,
      "cep: first step must be required and consuming (candidate " +
        "starts and window pruning key on the first step's symbol)")
    require(pat.head.cmp.isEmpty,
      "cep: the first step cannot carry a PREV predicate — PREV " +
        "navigates input rows, and the row before the match start is " +
        "outside the machine's buffer (MATCH_RECOGNIZE patterns open " +
        "with a predicate-free variable for the same reason)")
    validateNeg(pat, relaxed = false)
    // a trailing quantified/optional step is allowed since r12: it
    // routes the pattern to the BACKTRACKING walk, whose run-resolution
    // rules (bounding row / window staleness) give the greedy trailing
    // run a sound completion point on a stream
  }

  /** The strict collapse-closure class check — [[validateCommon]] plus
    * the closure rule. Retained for callers that want to ASSERT a
    * pattern takes the O(buffer) greedy fast path rather than the
    * backtracking walk.
    */
  private[graft] def validate(pattern: Seq[Step]): Unit = {
    validateCommon(pattern)
    require(closureHolds(pattern.toIndexedSeq),
      "cep: steps separated only by optional steps must have " +
        "DISJOINT symbol sets (greedy consumption is otherwise " +
        "ambiguous — fold A A into A+ or A)")
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
    * cents-value sum and min/max, and the step's first/last event ids
    * (None when an optional step matched zero rows) — COUNT/SUM/MIN/
    * MAX/FIRST/LAST over a pattern variable, MATCH_RECOGNIZE's full
    * measure primitive set (AVG is sum/cnt downstream).
    */
  final case class StepAgg(step: Int, symbol: String, cnt: Long,
    sum_value_c: Long, min_value_c: Option[Long],
    max_value_c: Option[Long], first_event_id: Option[Long],
    last_event_id: Option[Long])

  private[graft] final class Machine(pattern: IndexedSeq[Step],
      windowUs: Long, after: AfterMatch = SkipPastLast,
      contiguous: Boolean = true, grouped: Option[GPat] = None,
      withRows: Boolean = false, withTimeouts: Boolean = false,
      // the per-step MEASURES fold is O(consumed rows) per match —
      // match-only folds whose conversions discard aggs skip it.
      // MUST stay true for cepTimedOutOf-class machines: the empty
      // aggs list is the timeout sentinel, real matches must differ.
      needsAggs: Boolean = true)
      extends Serializable {
    // GROUP-QUANTIFIER mode: the compiled split-program replaces the
    // linear walks entirely (pattern then only feeds the alphabet);
    // after-match is restricted to the two whole-match strategies —
    // FIRST/LAST target FLAT step indices, which a repeated group's
    // leaves don't have
    private val program: Vector[GInstr] = grouped match {
      case Some(g) =>
        require(contiguous, "cep: grouped patterns are contiguous-mode")
        require(after == SkipPastLast || after == SkipToNextRow,
          "cep: grouped patterns support AFTER MATCH SKIP PAST LAST " +
            "ROW / TO NEXT ROW (FIRST/LAST name flat steps)")
        compileGrouped(g)
      case None => null
    }
    private val firstPred: String => Boolean = grouped match {
      case Some(g) =>
        val fs = gFirstSteps(g).toIndexedSeq
        tpe => fs.exists(_.matches(tpe))
      case None => null
    }
    if (grouped.isEmpty) validateAfter(pattern, after)
    // relaxed contiguity (Flink CEP's followedBy): rows between step
    // matches are skipped (alternation sets allowed, repeated symbols
    // allowed: A B A and even A A are unambiguous under earliest-next
    // subsequence semantics; quantified/negation steps take the
    // generalized walk — see `relaxedQ`)
    if (grouped.isEmpty) {
      if (contiguous) validateCommon(pattern) else validateSubseq(pattern)
    }
    // rows outside the alphabet can never join a match in relaxed
    // mode — they are dropped at the door (they still advance pruning)
    private val alphabet: Set[String] = pattern.flatMap(_.syms).toSet
    // patterns outside the collapse-closure class (A A, A+ B? A,
    // intersecting adjacent symbol sets) take the memoized BACKTRACKING
    // walk — regex-greedy semantics; closure patterns keep the O(n)
    // greedy walk (behavior identical on that class, where exactly one
    // parse per start exists)
    private val backtrack = contiguous && (!closureHolds(pattern) ||
      pattern.exists(st => st.cmp.isDefined || st.any || st.reluctant ||
        st.neg || st.sumCap.isDefined || st.cross.nonEmpty) ||
      pattern.last.bounds != ((1, 1)))
    // (step, position) memoization is sound at step s only if no step
    // t >= s references back across s (a cross ref to a step < s makes
    // go(s, p)'s outcome depend on the PATH's earlier takes, not just
    // (s, p)); from the last such back-reference onward memo re-enables
    private val memoOkFrom: Array[Boolean] =
      Array.tabulate(pattern.length)(s =>
        (s until pattern.length).forall(t =>
          pattern(t).cross.forall(_.step >= s)))
    // per-step flag: some later step's cross reference targets step s.
    // Only those steps must record their take BEFORE each recursion
    // (the predicate reads the current path); the rest record on the
    // Complete unwind as before — recording eagerly for every step
    // would allocate an O(take) list per backtracking attempt on
    // cross-free patterns (O(c²) transient garbage per forced walk of
    // a shrinking greedy run)
    private val crossTargeted: Array[Boolean] =
      Array.tabulate(pattern.length)(s =>
        pattern.exists(_.cross.exists(_.step == s)))
    // grouped machines: `pattern` is the leaf list, so crossTargeted
    // doubles as the per-LEAF eager-recording flag; this gate disables
    // walkProg's (pc, position) memo when any leaf carries cross refs
    private val groupedCross: Boolean =
      program != null && pattern.exists(_.cross.nonEmpty)
    // relaxed patterns with quantified, negation, or cross-referencing
    // steps run the GENERALIZED subsequence walk (memoized backtracking
    // over subsequence takes — its `taken` arrays are what cross
    // navigation reads); plain One-step relaxed patterns keep the
    // O(buffer) earliest-next walk
    private val relaxedQ = !contiguous &&
      pattern.exists(st => st.bounds != ((1, 1)) || st.neg ||
        st.cross.nonEmpty)
    // TIMED-OUT PARTIAL MATCHES (Flink CEP's TimedOutPartialMatchHandler
    // — the abandoned-transaction surface) are implemented for the
    // contiguous collapse-closure class with a required-One tail under
    // SKIP PAST LAST ROW, where partial death is fully localized: the
    // post-emit buffer invariantly walks Partial from its head with
    // EVERY buffered row consumed, so a window-pruned head's partial
    // match IS the buffer. The backtracking / relaxed / grouped walks
    // resolve stale heads inside their own search where a single
    // "the" partial is ambiguous — rejected rather than guessed.
    if (withTimeouts) require(grouped.isEmpty && contiguous &&
      !backtrack && after == SkipPastLast,
      "cep: timed-out partials need a contiguous collapse-closure " +
        "pattern with a required one-row tail under AFTER MATCH SKIP " +
        "PAST LAST ROW (elsewhere the partial to surface is ambiguous)")
    // (ts, id, tpe, value_c) — value_c rides along untouched by the
    // walk; MEASURES folds it per step span at completion
    private var buf = Vector.empty[(Long, Long, String, Long)]

    /** Checkpointable automaton state — the streaming processor carries
      * it in a ValueState across micro-batches.
      */
    def snapshot: List[(Long, Long, String, Long)] = buf.toList
    def restore(s: List[(Long, Long, String, Long)]): Unit = buf = s.toVector

    // ALL-ROWS capture (withRows only): per emitted match, the consumed
    // rows as (step-or-leaf, ts, id, tpe, value_c) in step order /
    // ascending positions — queued 1:1 with emitted matches, so the
    // rows fold pops exactly one entry per match it converts
    private val rowsQ =
      scala.collection.mutable.Queue.empty[
        List[(Int, Long, Long, String, Long)]]
    def popRows(): List[(Int, Long, Long, String, Long)] = rowsQ.dequeue()

    private final val Partial = 0
    private final val Complete = 1
    private final val Mismatch = 2

    // per-step (offset, take) in buf of the LAST walk — valid only
    // when that walk returned Complete (the MEASURES spans)
    private val spanOff = new Array[Int](pattern.length)
    private val spanLen = new Array[Int](pattern.length)
    // per-step CONSUMED BUFFER POSITIONS of the last COMPLETE walk —
    // non-null only when that walk was the generalized relaxed walk,
    // whose quantified runs are SUBSEQUENCES the (off, len) spans
    // cannot represent (Nil for a zero-width negation step)
    private var spanPos: Array[List[Int]] = null

    /** Greedy deterministic walk of the whole buffer from its head.
      * Optional steps skip when the row does not match; when it does,
      * consuming is the unique viable choice (validate's
      * collapse-closure rule — see there for the argument).
      */
    /** Relaxed-contiguity walk: each One step consumes the EARLIEST
      * matching row at or after the previous step's row, skipping
      * non-matching rows (which stay in the buffer for later starts).
      * Deterministic without any symbol-distinctness rule — earliest-
      * next is a unique choice, and parse existence is MONOTONE in the
      * start (a later start's step rows are never earlier), which is
      * what makes the leftmost-preference fold complete: a later
      * start's match can never be ready while an earlier start's parse
      * is still pending.
      */
    private def walkSubseq(): Int = {
      var p = 0
      var s = 0
      while (s < pattern.length) {
        while (p < buf.length && !pattern(s).matches(buf(p)._3)) p += 1
        if (p >= buf.length) return Partial
        spanOff(s) = p
        spanLen(s) = 1
        p += 1
        s += 1
      }
      Complete
    }

    /** GENERALIZED relaxed-contiguity walk — Flink CEP's looping
      * relaxed states and negative patterns: memoized backtracking
      * over SUBSEQUENCE takes. A quantified step's run is a
      * subsequence of matching rows (each additional loop row may skip
      * non-matching rows); greedy prefers the LONGEST take — and since
      * a subsequence run is never bounded by a non-matching row, a
      * below-cap run stays extendable by ANY future row, so greedy
      * commits only when the window closes over the start (futureOk
      * false) or at the end-of-input flush. A negation step watches
      * the GAP to the next step's first consumed row (notFollowedBy —
      * a matching row there kills the branch); a TRAILING negation
      * watches the whole window horizon after the last consumed row
      * and completes at horizon expiry, which is what gives the
      * abandoned-cart pattern its emission point. The walk starts by
      * pruning rows before the first step-0 candidate (they can never
      * be consumed by this or any later start — keeps state
      * window-bounded), and resolves WINDOW-STALE starts itself
      * (futureOk false forces every take), so [[feedM]] skips the
      * head prune exactly as it does for the contiguous backtracking
      * walk. Same memo bound: O(|pattern| · |buffer|²) per feed with a
      * window-bounded buffer.
      */
    private def walkRelaxedQ(fedTs: Long): Int = {
      // prune dead weight before the first candidate start
      var q0 = 0
      while (q0 < buf.length && !pattern(0).matches(buf(q0)._3)) q0 += 1
      if (q0 >= buf.length) { buf = Vector.empty; return Partial }
      if (q0 > 0) buf = buf.drop(q0)
      val n = buf.length
      val startTs = buf(0)._1
      val horizon = startTs + windowUs
      val futureOk = fedTs <= horizon
      val memo = Array.ofDim[Byte](pattern.length, n + 1)
      val taken = new Array[List[Int]](pattern.length)
      // negWatch: symbol set of the negation step immediately before
      // step s (empty otherwise) — the gap to s's first consumed row
      def go(s: Int, p: Int, negWatch: Set[String]): Int = {
        if (s == pattern.length)
          return if (buf(p - 1)._1 - startTs <= windowUs) Complete
            else Mismatch
        val st = pattern(s)
        if (st.neg) {
          if (s == pattern.length - 1) {
            // TRAILING absence over the window horizon
            if (buf(p - 1)._1 - startTs > windowUs) return Mismatch
            var q = p
            while (q < n) {
              // a buffered row past the horizon proves no in-horizon
              // row can still arrive (rows are fed in ts order)
              if (buf(q)._1 > horizon) { taken(s) = Nil; return Complete }
              if (st.matches(buf(q)._3)) return Mismatch
              q += 1
            }
            if (futureOk) return Partial
            taken(s) = Nil
            Complete
          } else {
            // middle absence: delegate the gap watch to the next
            // (required — validateNeg) consuming step's scan. Zero
            // width: taken is Nil on any path through it (set before
            // the recursion — uniform with the consuming branch, though
            // cross refs to negs are rejected and never read it)
            taken(s) = Nil
            go(s + 1, p, st.syms)
          }
        } else {
          // memo reads AND writes are gated on memoOkFrom, exactly as
          // walkBack's: a position a later step's cross-variable
          // reference reaches back across is path-dependent (go(s, p)'s
          // outcome depends on the referenced step's take, not just
          // (s, p)) and must not be cached
          val mOk = memoOkFrom(s)
          if (mOk && memo(s)(p) != 0)
            return if (memo(s)(p) == 3) Partial else Mismatch
          val (lo, hi) = st.bounds
          // CROSS-VARIABLE references read the current path's takes
          // (set before each recursion): FIRST/LAST of the referenced
          // step's consumed positions — a zero-take referenced span is
          // NULL, the row never matches (NULL-comparison semantics,
          // same as walkBack's span navigation)
          def crossOk(q: Int): Boolean =
            st.cross.forall { cr =>
              val tk = taken(cr.step)
              tk != null && tk.nonEmpty && cmpHolds(cr.cmp, buf(q)._4,
                buf(if (cr.first) tk.head else tk.last)._4)
            }
          // collect subsequence match positions from p; a negWatch row
          // BEFORE the first own-match kills the branch; rows past the
          // horizon end collection (they could never be consumed — the
          // final window check would fail — and bound extension). A row
          // matching the symbol but failing a cross predicate is a
          // NON-MATCHING row (relaxed contiguity skips it — Flink's
          // IterativeCondition reading: the condition is part of the
          // state's take test, and followedBy skips non-taken rows)
          val pos = scala.collection.mutable.ArrayBuffer.empty[Int]
          var q = p
          var stoppedByHorizon = false
          var killed = false
          while (q < n && pos.length < hi && !stoppedByHorizon && !killed) {
            if (buf(q)._1 > horizon) stoppedByHorizon = true
            else {
              val tpe = buf(q)._3
              if (st.matches(tpe) && crossOk(q)) pos += q
              else if (pos.isEmpty && negWatch.contains(tpe)) killed = true
              q += 1
            }
          }
          if (killed) { if (mOk) memo(s)(p) = 2; return Mismatch }
          val c = pos.length
          val canExtend = c < hi && !stoppedByHorizon
          // cross-TARGETED steps record their take BEFORE the
          // recursion (later steps' cross references read the current
          // path; Complete short-circuits, so the accepted path's
          // values are exactly what remains); the rest record on the
          // Complete unwind only — no per-attempt list allocation
          def rec(take: Int): Int = {
            if (crossTargeted(s)) taken(s) = pos.take(take).toList
            go(s + 1, if (take > 0) pos(take - 1) + 1 else p, Set.empty)
          }
          def commit(take: Int): Int = {
            if (!crossTargeted(s)) taken(s) = pos.take(take).toList
            Complete
          }
          if (!st.reluctant) {
            if (canExtend && futureOk) {
              if (mOk) memo(s)(p) = 3
              return Partial
            }
            var take = c
            while (take >= lo) {
              rec(take) match {
                case Complete => return commit(take)
                case Partial =>
                  if (mOk) memo(s)(p) = 3
                  return Partial
                case _ => take -= 1
              }
            }
          } else {
            var take = lo
            while (take <= c) {
              rec(take) match {
                case Complete => return commit(take)
                case Partial =>
                  if (mOk) memo(s)(p) = 3
                  return Partial
                case _ => take += 1
              }
            }
            if (canExtend && futureOk) {
              if (mOk) memo(s)(p) = 3
              return Partial
            }
          }
          if (mOk) memo(s)(p) = 2
          Mismatch
        }
      }
      val r = go(0, 0, Set.empty)
      if (r == Complete) spanPos = taken
      r
    }

    /** Memoized backtracking walk — regex-greedy semantics for
      * patterns OUTSIDE the collapse-closure class. At each step,
      * takes are tried LONGEST FIRST (greedy); on a dead end the walk
      * backs off to a shorter take (the choice closure-class patterns
      * never face). Two stream-correctness rules the batch-regex view
      * doesn't have:
      *
      *   - A step whose run reaches the buffer end below its cap may
      *     still grow with FUTURE rows; greedy must prefer that longer
      *     take over any shorter-take completion available now, so the
      *     walk returns Partial (wait) — UNLESS the window already
      *     excludes future ends (fedTs > start + window), in which
      *     case the decision is forced now.
      *   - The window check lives INSIDE the walk (a parse ending
      *     beyond the window is a dead branch, and a SHORTER take may
      *     still fit — Flink's within() prunes NFA branches the same
      *     way). Completions may therefore land MID-buffer: the
      *     longest window-valid end can precede rows that arrived
      *     after it. This is also why [[feedM]] skips the head ts
      *     prune in backtrack mode: a stale head may still own a
      *     window-valid mid-buffer completion, and this walk resolves
      *     every stale head to Complete or Mismatch at the next feed,
      *     which keeps state window-bounded without the prune.
      *
      * Memoizing failed (step, pos) states bounds the walk at
      * O(|pattern| · |buffer|²) — Flink's shared-buffer NFA pays the
      * same order per event.
      */
    private def walkBack(fedTs: Long): Int = {
      val n = buf.length
      if (n == 0) return Partial
      val startTs = buf(0)._1
      val futureOk = fedTs <= startTs + windowUs
      val memo = Array.ofDim[Byte](pattern.length, n + 1)
      def go(s: Int, p: Int): Int = {
        if (s == pattern.length) {
          // p >= 1: the first step is required (validateCommon)
          return if (buf(p - 1)._1 - startTs <= windowUs) Complete
            else Mismatch
        }
        // memo codes are DISTINCT from the status constants: 3 =
        // Partial, 2 = Mismatch (1 is never stored — Complete returns
        // carry span state and short-circuit the walk). Partial today
        // unwinds the whole walk immediately, so the 3-branch is never
        // re-read in practice, but encoding it distinctly keeps any
        // future keep-exploring refactor from reading a memoized
        // Partial back as Complete with stale span arrays. Reads AND
        // writes are gated on memoOkFrom: a position a later step's
        // cross-variable reference reaches back across is path-
        // dependent and must not be cached.
        val mOk = memoOkFrom(s)
        if (mOk && memo(s)(p) != 0)
          return if (memo(s)(p) == 3) Partial else Mismatch
        val st = pattern(s)
        if (st.neg) {
          // ZERO-WIDTH notNext: the physically next row — if one exists
          // inside the window horizon — must not match the neg symbol
          // set; a next row BEYOND the horizon is outside the
          // assertion's scope (pass), and no-next-row stays Partial
          // until the window closes (then the assertion is vacuously
          // confirmed: any future row lands past the horizon).
          // span set BEFORE the recursion: later steps' cross-variable
          // references read the current path's spans (a zero-width
          // step's span is (p, 0); cross refs to negs are rejected)
          spanOff(s) = p; spanLen(s) = 0
          val r =
            if (p < n) {
              if (buf(p)._1 > startTs + windowUs) go(s + 1, p)
              else if (st.matches(buf(p)._3)) Mismatch
              else go(s + 1, p)
            } else if (futureOk) Partial
            else go(s + 1, p)
          if (r != Complete && mOk) memo(s)(p) = if (r == Partial) 3 else 2
          return r
        }
        val (lo, hi) = st.bounds
        // DEFINE predicates compare against the row cmpOff back —
        // buf(q - cmpOff), PREV(X.value, k) over PHYSICAL input rows
        // (contiguous-mode buffers append every fed row and drop
        // prefixes only). q < cmpOff has no such row (None — a cmp
        // step never matches there; validateCommon keeps cmp off
        // step 0 so q >= 1 in practice). CROSS-VARIABLE references
        // read the current path's spans (set before each recursion):
        // FIRST/LAST of the referenced step's consumed run — a
        // zero-take referenced span is NULL, the row never matches.
        def rowOk(q: Int): Boolean =
          st.matchesRow(buf(q)._3, buf(q)._4,
            if (q >= st.cmpOff) Some(buf(q - st.cmpOff)._4) else None) &&
          st.cross.forall { cr =>
            spanLen(cr.step) > 0 && cmpHolds(cr.cmp, buf(q)._4,
              buf(if (cr.first) spanOff(cr.step)
                  else spanOff(cr.step) + spanLen(cr.step) - 1)._4)
          }
        var c = 0
        // the running-aggregate DEFINE (SUM <= cap): per-row
        // evaluation — the first row that would push the run's sum
        // past the cap fails its predicate and BOUNDS the run exactly
        // like a non-matching row (so it also closes canExtend)
        var runSum = 0L
        var capped = false
        while (p + c < n && c < hi && !capped && rowOk(p + c)) {
          st.sumCap match {
            case Some(cap) =>
              if (runSum + buf(p + c)._4 > cap) capped = true
              else { runSum += buf(p + c)._4; c += 1 }
            case None => c += 1
          }
        }
        // Takes are tried in the step's PREFERENCE order and the first
        // non-Mismatch outcome decides: Complete commits; Partial
        // means a MORE-PREFERRED branch is still undecidable, and
        // committing to a less-preferred take now would violate the
        // quantifier's bias — wait instead (the blocked completion is
        // not lost: when the preferred branch resolves to Mismatch at
        // a later feed, or the window forces futureOk false and
        // eliminates every Partial source, the loop reaches it then).
        //   GREEDY preference:    [future extension?, c, c-1, …, lo]
        //   RELUCTANT preference: [lo, lo+1, …, c, future extension?]
        // "future extension?" — the run reaching the buffer end below
        // its cap might still grow; it is the MOST preferred branch
        // for greedy and the LEAST for reluctant, hence the asymmetric
        // placement of the canExtend check.
        val canExtend = p + c >= n && c < hi
        // spans are set BEFORE each recursion (not on the Complete
        // unwind): later steps' cross-variable references read the
        // current path's takes; Complete short-circuits, so the
        // accepted path's values are exactly what remains
        if (!st.reluctant) {
          if (canExtend && futureOk) {
            if (mOk) memo(s)(p) = 3
            return Partial
          }
          var take = c
          while (take >= lo) {
            spanOff(s) = p; spanLen(s) = take
            go(s + 1, p + take) match {
              case Complete =>
                return Complete
              case Partial =>
                if (mOk) memo(s)(p) = 3
                return Partial
              case _ => take -= 1
            }
          }
        } else {
          var take = lo
          while (take <= c) {
            spanOff(s) = p; spanLen(s) = take
            go(s + 1, p + take) match {
              case Complete =>
                return Complete
              case Partial =>
                if (mOk) memo(s)(p) = 3
                return Partial
              case _ => take += 1
            }
          }
          if (canExtend && futureOk) {
            if (mOk) memo(s)(p) = 3
            return Partial
          }
        }
        if (mOk) memo(s)(p) = 2
        Mismatch
      }
      go(0, 0)
    }

    // end-of-input flush in progress: force the backtracking walk (its
    // futureOk gate is the only place run-extension pending lives, and
    // it is semantically identical to the greedy walk on the closure
    // class), with a fedTs past every window so greed resolves NOW
    private var flushing = false

    // exclusive end position (in buf) of the last COMPLETE program
    // walk — the grouped machine's whole-match span (consumption is
    // contiguous from the buffer head, so [0, progEnd) IS the match)
    private var progEnd = -1

    /** GROUP-PROGRAM walk: interpret the compiled split-program with
      * the shared backtracking discipline — split arms in preference
      * order (first non-Mismatch decides, Partial short-circuits), a
      * leaf run take-loop identical to walkBack's (sum caps, PREV
      * offsets, reluctant bias, the futureOk pending gate), and the
      * window check at Accept so shorter parses survive a
      * window-killed longest one. Memo on (pc, position) — the
      * continuation is fixed by pc, which is what makes the program
      * form memoizable where a tree walk with continuations is not.
      * Same bound as walkBack: O(program · buffer²) per feed.
      *
      * CROSS-VARIABLE DEFINE (r17): a leaf's cross references read the
      * referenced LEAF's consumed-position pool as of the current path
      * — accumulated ACROSS group iterations. Cross-targeted leaves
      * record their take BEFORE the recursion (append in execution
      * order; restored on backtrack), so a body leaf referencing an
      * earlier body leaf sees the CURRENT iteration's rows too —
      * Flink's IterativeCondition reading. An empty pool (alternation
      * arm not taken, optional that consumed nothing, a first-set leaf
      * opening the match) is NULL: the row does not match. With cross
      * references present the (pc, position) memo is UNSOUND (the
      * outcome depends on the path's takes, not just (pc, p) — and
      * loop back-jumps make any per-pc gating circular), so it is
      * disabled wholesale for such patterns: the walk degrades to
      * plain backtracking, window-bounded per feed, worst-case
      * exponential on adversarial same-symbol runs — the same
      * documented acceptance as the relaxed cross walk. Cross-free
      * grouped patterns keep the memo and the exact r16 behavior.
      */
    private def walkProg(fedTs: Long): Int = {
      val n = buf.length
      if (n == 0) return Partial
      val startTs = buf(0)._1
      val futureOk = fedTs <= startTs + windowUs
      val memo = Array.ofDim[Byte](program.length, n + 1)
      // per-LEAF consumed positions, accumulated across group
      // iterations: each RunM frame on the accepting path prepends its
      // take's block as the stack unwinds (unwind order is reverse
      // execution order, so prepending restores execution order and
      // ascending positions per leaf). Frames off the accepting path
      // return Mismatch before recording; memo hits can't lose spans
      // because Complete is never memoized (it short-circuits).
      val taken = Array.fill(pattern.length)(List.empty[Int])
      def go(pc: Int, p: Int): Int = program(pc) match {
        case AcceptI =>
          if (p == 0) Mismatch // gMinLen >= 1 makes this unreachable
          else if (buf(p - 1)._1 - startTs <= windowUs) {
            progEnd = p
            Complete
          } else Mismatch
        case JumpI(k) => go(k, p)
        case SplitI(a, b) =>
          val r = go(a, p)
          if (r != Mismatch) r else go(b, p)
        case RunM(st, leaf) =>
          // memo disabled wholesale for cross-carrying patterns (see
          // the walk's scaladoc); cross-free patterns keep it exactly
          val mOk = !groupedCross
          if (mOk && memo(pc)(p) != 0)
            return if (memo(pc)(p) == 3) Partial else Mismatch
          val (lo, hi) = st.bounds
          // cross navigation: FIRST/LAST over the referenced leaf's
          // current-path pool; empty pool = NULL = no match (a row
          // failing it BOUNDS the run — contiguous semantics, exactly
          // walkBack's kill-not-skip reading)
          def crossOk(q: Int): Boolean =
            st.cross.forall { cr =>
              val tk = taken(cr.step)
              tk.nonEmpty && cmpHolds(cr.cmp, buf(q)._4,
                buf(if (cr.first) tk.head else tk.last)._4)
            }
          def rowOk(q: Int): Boolean =
            st.matchesRow(buf(q)._3, buf(q)._4,
              if (q >= st.cmpOff) Some(buf(q - st.cmpOff)._4) else None) &&
              (st.cross.isEmpty || crossOk(q))
          var c = 0
          var runSum = 0L
          var capped = false
          while (p + c < n && c < hi && !capped && rowOk(p + c)) {
            st.sumCap match {
              case Some(cap) =>
                if (runSum + buf(p + c)._4 > cap) capped = true
                else { runSum += buf(p + c)._4; c += 1 }
              case None => c += 1
            }
          }
          val canExtend = p + c >= n && c < hi && !capped
          // cross-TARGETED leaves record their take BEFORE the
          // recursion (execution-order append, restored on backtrack)
          // so later leaves' cross references read the current path;
          // the rest record on the Complete unwind (reverse-order
          // prepend) as before — no per-attempt allocation for them
          def attempt(take: Int): Int =
            if (crossTargeted(leaf)) {
              val saved = taken(leaf)
              taken(leaf) = saved ::: (p until p + take).toList
              val r = go(pc + 1, p + take)
              if (r != Complete) taken(leaf) = saved
              r
            } else {
              val r = go(pc + 1, p + take)
              if (r == Complete)
                taken(leaf) = (p until p + take).toList ::: taken(leaf)
              r
            }
          if (!st.reluctant) {
            if (canExtend && futureOk) {
              if (mOk) memo(pc)(p) = 3
              return Partial
            }
            var take = c
            while (take >= lo) {
              attempt(take) match {
                case Complete => return Complete
                case Partial  =>
                  if (mOk) memo(pc)(p) = 3
                  return Partial
                case _        => take -= 1
              }
            }
          } else {
            var take = lo
            while (take <= c) {
              attempt(take) match {
                case Complete => return Complete
                case Partial  =>
                  if (mOk) memo(pc)(p) = 3
                  return Partial
                case _        => take += 1
              }
            }
            if (canExtend && futureOk) {
              if (mOk) memo(pc)(p) = 3
              return Partial
            }
          }
          if (mOk) memo(pc)(p) = 2
          Mismatch
      }
      val r = go(0, 0)
      if (r == Complete) spanPos = taken
      r
    }

    private def walk(fedTs: Long): Int = {
      spanPos = null
      progEnd = -1
      if (program != null) return walkProg(fedTs)
      if (!contiguous)
        return if (relaxedQ) walkRelaxedQ(fedTs) else walkSubseq()
      if (backtrack || flushing) return walkBack(fedTs)
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
      // Complete even if rows trail (p < buf.length). In the plain
      // feed flow completion lands on the fed row (the buffer held a
      // strict partial before it arrived), but a buffer RETAINED by an
      // overlap after-match resume, or re-walked after a fallback, is
      // an incremental REPLAY of already-seen rows — a parse ending
      // mid-buffer is one that a fresh machine fed those rows one at a
      // time would have emitted at its own completing feed, so it must
      // count here too (the going-loop then continues on the rest).
      Complete
    }

    /** Drop through the next candidate start (a pattern[0]-symbol row
      * after the current head); false when none remains (buffer
      * emptied).
      */
    private def dropToNextStart(): Boolean = {
      val i =
        if (program != null) buf.indexWhere(r => firstPred(r._3), 1)
        else buf.indexWhere(r => pattern(0).matches(r._3), 1)
      if (i < 0) { buf = Vector.empty; false }
      else { buf = buf.drop(i); true }
    }

    /** MEASURES fold over the just-completed walk's spans (or, for the
      * generalized relaxed walk, its per-step consumed positions).
      */
    private def stepAggs(): List[StepAgg] =
      pattern.indices.map { s =>
        if (spanPos != null) {
          val ps = spanPos(s)
          if (ps.isEmpty)
            StepAgg(s, pattern(s).symbol, 0L, 0L, None, None, None, None)
          else {
            var sum = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            ps.foreach { i =>
              val v = buf(i)._4
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            StepAgg(s, pattern(s).symbol, ps.length.toLong, sum,
              Some(mn), Some(mx), Some(buf(ps.head)._2),
              Some(buf(ps.last)._2))
          }
        } else {
        val off = spanOff(s)
        val len = spanLen(s)
        if (len == 0)
          StepAgg(s, pattern(s).symbol, 0L, 0L, None, None, None, None)
        else {
          var sum = 0L
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var i = off
          while (i < off + len) {
            val v = buf(i)._4
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          StepAgg(s, pattern(s).symbol, len.toLong, sum, Some(mn), Some(mx),
            Some(buf(off)._2), Some(buf(off + len - 1)._2))
        }
        }
      }.toList

    /** Feed one row; emits every match this row closes, each with its
      * per-step MEASURES. SKIP PAST LAST ROW machines emit at most one
      * (acceptance clears the buffer); the other strategies resume
      * INSIDE the accepted match ([[AfterMatch]]), so one fed row can
      * close several overlapping matches (emitted in start order —
      * the leftmost-preference scan order).
      */
    def feedM(ts: Long, id: Long, tpe: String,
        valueC: Long): List[(CepMatch, List[StepAgg])] = {
      // window prune: heads that can no longer start a completing
      // match. Sound because in the greedy/subseq walks completions
      // always land on the fed row (end ts >= ts, so a stale head's
      // parse is window-dead). NOT sound in backtrack mode — a stale
      // head may still own a window-valid MID-buffer completion — so
      // there walkBack resolves stale heads itself (Complete or
      // Mismatch at this very feed; see its scaladoc). The generalized
      // relaxed walk and the group program resolve their own stale
      // heads the same way.
      if (!backtrack && !relaxedQ && program == null)
        pruneStaleHeads(ts)
      // relaxed mode: a row outside the alphabet can never join a
      // match — skip it after the prune. For the One-step subsequence
      // walk no re-walk is needed (parse existence is monotone in the
      // start — walkSubseq's doc); the GENERALIZED relaxed walk's
      // pendings also resolve by TIME (window expiry over a greedy run
      // or a trailing absence), so there the row's timestamp still
      // advances the machine even though the row itself is dropped.
      if (!contiguous && !alphabet.contains(tpe))
        return if (relaxedQ) advance(ts) else Nil
      buf = buf :+ ((ts, id, tpe, valueC))
      val out = scala.collection.mutable.ListBuffer
        .empty[(CepMatch, List[StepAgg])]
      emitLoop(ts, out)
      if (timeoutsQ.isEmpty) out.toList
      else {
        // timeouts chronologically precede the fed row's own matches
        val t = timeoutsQ.toList
        timeoutsQ.clear()
        t ++ out.toList
      }
    }

    // window-pruned partials awaiting this feed's return (withTimeouts
    // only; drained within the same feed, never part of snapshot state)
    private val timeoutsQ = scala.collection.mutable.ListBuffer
      .empty[(CepMatch, List[StepAgg])]

    /** Drop heads whose window closed at `ts` (simple-walk classes
      * only — the backtracking/relaxed/grouped walks resolve their own
      * stale heads). With timeouts on, a dropped head still walking
      * Partial surfaces first: its buffered rows ARE the partial match
      * (post-emit invariant — every buffered row is consumed by the
      * prefix parse), queued through the completion channel with the
      * EMPTY-aggs sentinel the timeout surfaces key on (a real match
      * always carries one StepAgg per step).
      */
    private def pruneStaleHeads(ts: Long): Unit =
      while (buf.nonEmpty && ts - buf.head._1 > windowUs) {
        if (withTimeouts && walk(ts) == Partial)
          timeoutsQ += ((CepMatch(-1L, buf.head._2, buf.head._1,
            buf.last._2, buf.last._1, buf.length.toLong), Nil))
        if (!dropToNextStart()) ()
      }

    /** TIME-ADVANCE without a row: resolve every pending decision
      * whose window closes at or before `ts` — greedy relaxed runs
      * commit their takes and trailing absences confirm once `ts`
      * passes the start's horizon. The streaming processor calls this
      * from its event-time timers (absence emission must not wait for
      * a next row); the batch fold gets the same effect from fed-row
      * timestamps plus the end-of-input [[flush]]. A no-op for walks
      * whose pendings only wait for rows.
      */
    def advance(ts: Long): List[(CepMatch, List[StepAgg])] = {
      // with timeouts on, a watermark advance expires stale heads the
      // way a fed row's prune would — the streaming processor's
      // horizon timers land here, so an abandoned partial times out
      // even if no further row ever arrives for its key
      if (withTimeouts) pruneStaleHeads(ts)
      val out = scala.collection.mutable.ListBuffer
        .empty[(CepMatch, List[StepAgg])]
      emitLoop(ts, out)
      if (timeoutsQ.isEmpty) out.toList
      else {
        val t = timeoutsQ.toList
        timeoutsQ.clear()
        t ++ out.toList
      }
    }

    /** The earliest instant a pending decision could still be waiting
      * on: the current head's window horizon. None when no state is
      * buffered. The streaming processor registers an event-time timer
      * here so horizon-gated emissions (trailing absences, greedy
      * relaxed takes) fire even if no further row ever arrives.
      */
    def pendingHorizonUs: Option[Long] = buf.headOption.map(_._1 + windowUs)

    /** The walk-emit-fallback loop shared by [[feedM]] and [[flush]]:
      * walk the buffer, emit completions (resuming per the after-match
      * strategy), fall back through candidate starts on mismatches and
      * window kills, stop on Partial.
      */
    private def emitLoop(fedTs: Long,
        out: scala.collection.mutable.ListBuffer[(CepMatch, List[StepAgg])])
        : Unit = {
      var going = buf.nonEmpty
      while (going) {
        walk(fedTs) match {
          case Partial => going = false
          case Complete =>
            // match boundaries from the walk's spans: start = step 0's
            // first row; end = the LAST CONSUMING step's last row (a
            // trailing zero-width negation consumes nothing). The
            // generalized relaxed walk reports non-contiguous
            // consumption via spanPos, the GROUP PROGRAM its exclusive
            // end (consumption contiguous from the head); the others
            // via (off, len).
            val startIdx =
              if (progEnd >= 0) 0
              else if (spanPos != null) spanPos(0).head else spanOff(0)
            // contiguous walks: a trailing zero-width/empty step has
            // spanOff = p and spanLen = 0, so off + len - 1 is still
            // the last CONSUMED row's index
            val endIdx =
              if (progEnd >= 0) progEnd - 1
              else if (spanPos != null)
                spanPos.reverseIterator.collectFirst {
                  case l if l.nonEmpty => l.last
                }.get
              else spanOff(pattern.length - 1) +
                spanLen(pattern.length - 1) - 1
            val (sTs, sId, _, _) = buf(startIdx)
            val (eTs, eId, _, _) = buf(endIdx)
            if (eTs - sTs <= windowUs) {
              var n = 0L
              if (progEnd >= 0) n = progEnd.toLong
              else {
                var s = 0
                while (s < pattern.length) {
                  n += (if (spanPos != null) spanPos(s).length.toLong
                    else spanLen(s).toLong)
                  s += 1
                }
              }
              // the group program populates spanPos too (per-LEAF
              // positions across iterations), so grouped matches carry
              // real MEASURES since r14
              val aggs = if (needsAggs) stepAggs() else Nil
              if (withRows) rowsQ += pattern.indices.iterator.flatMap {
                s =>
                  val ps =
                    if (spanPos != null) spanPos(s)
                    else (spanOff(s) until spanOff(s) + spanLen(s)).toList
                  ps.iterator.map { i =>
                    val (ts, id, tpe, vc) = buf(i)
                    (s, ts, id, tpe, vc)
                  }
              }.toList
              out += ((CepMatch(-1L, sId, sTs, eId, eTs, n), aggs))
              // resume point per strategy; every case drops >= 1 row
              // (validateAfter), so the loop strictly progresses —
              // the retained suffix may close further matches at this
              // same fed row, keep walking
              val resume = after match {
                case SkipPastLast   => endIdx + 1
                case SkipToNextRow  => startIdx + 1
                case SkipToFirst(k) =>
                  if (spanPos != null) spanPos(k).head else spanOff(k)
                case SkipToLast(k)  =>
                  if (spanPos != null) spanPos(k).last
                  else spanOff(k) + spanLen(k) - 1
              }
              buf = buf.drop(resume)
              going = buf.nonEmpty
            } else if (!dropToNextStart()) going = false
          case _ =>
            if (!dropToNextStart()) going = false
        }
      }
    }

    /** END-OF-INPUT flush — SQL MATCH_RECOGNIZE finite-input semantics:
      * end of partition RESOLVES greed. A pending greedy run (a
      * trailing quantified step whose take could still grow with future
      * rows) commits its current take because no future row exists; the
      * walk runs with a fedTs past every window, so the futureOk gate —
      * the only source of run-extension pending — is closed and every
      * buffered candidate resolves to Complete or Mismatch. The batch
      * folds call this at each key boundary and at partition end; the
      * STREAMING processor never does (a stream has no end — pending
      * runs stay pending, the documented streaming contract, which is
      * why the stream twins of trailing-quantified gates emit strict
      * subsets of their batch twins). One-step relaxed (followedBy)
      * machines have no greedy pending (their subsequence parses wait
      * only for missing rows, which end-of-input cannot supply) —
      * flush clears state and emits nothing; the GENERALIZED relaxed
      * walk's pendings (greedy takes, trailing absences) resolve here
      * exactly like the contiguous ones.
      */
    def flush(): List[(CepMatch, List[StepAgg])] = {
      val out = scala.collection.mutable.ListBuffer
        .empty[(CepMatch, List[StepAgg])]
      if (withTimeouts) {
        // end-of-input under watermark → ∞ (Flink CEP's reading): the
        // required-One tail means flush can complete nothing — the
        // walk is row-pure and the post-emit buffer walks Partial — so
        // every head surviving to here either TIMES OUT (Partial: its
        // rows are the partial match) or already died to a mismatch
        // fallback. Walk with the plain (non-flushing) dispatch: there
        // is no trailing greed to resolve in this class.
        var going = buf.nonEmpty
        while (going) {
          walk(Long.MaxValue) match {
            case Partial =>
              out += ((CepMatch(-1L, buf.head._2, buf.head._1,
                buf.last._2, buf.last._1, buf.length.toLong), Nil))
              going = dropToNextStart()
            case _ => going = dropToNextStart()
          }
        }
        buf = Vector.empty
        return out.toList
      }
      if (contiguous || relaxedQ) {
        flushing = true
        try emitLoop(Long.MaxValue, out) finally flushing = false
      }
      buf = Vector.empty
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
    * `after` selects the AFTER MATCH strategy — see [[AfterMatch]]
    * (default SKIP PAST LAST ROW, matches never overlap).
    *
    * END-OF-INPUT: batch input is FINITE, and per SQL MATCH_RECOGNIZE /
    * Flink batch semantics the end of a partition resolves greed — a
    * trailing quantified step's run that reaches end-of-data commits
    * its current take ([[Machine.flush]] at each key boundary and
    * partition end). The STREAMING twin
    * (`StreamingOps.cepStream`) deliberately differs: a stream has no
    * end, so such runs stay pending forever — its results are a strict
    * subset of this operator's on the same finite prefix whenever the
    * pattern ends in a quantified/optional step.
    *
    * COST MODEL: patterns inside the collapse-closure class (adjacent
    * step symbols distinct — see [[closureHolds]]) run the O(buffer)
    * greedy walk per fed row; patterns outside it take the memoized
    * backtracking walk at O(pattern · buffer²) worst case per feed —
    * the same complexity class as Flink's shared-buffer NFA. In both
    * cases the buffer is WINDOW-BOUNDED (a head older than the window
    * can never complete), so per-key state and per-feed work scale
    * with the window span's row count, never the series length. A
    * pathological key (single-symbol stream under a wide window) pays
    * the quadratic-in-window worst case; narrow the window, not the
    * data, to bound it.
    */
  def cepMatchOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long, after: AfterMatch = SkipPastLast)
      : Dataset[CepMatch] = {
    validateCommon(pattern)
    matchInternal(events, pattern, windowUs, after, contiguous = true)
  }

  /** RELAXED-CONTIGUITY pattern matching — Flink CEP's `followedBy`
    * class: rows between step matches are skipped (a One step takes
    * the EARLIEST matching row after the previous step's), vs
    * [[cepMatchOf]]'s MATCH_RECOGNIZE strict contiguity where an
    * intervening non-matching row breaks the partial. Since r13 the
    * class also carries:
    *
    *   - QUANTIFIED steps (Flink's looping relaxed states): a run is
    *     a SUBSEQUENCE of matching rows; the greedy default takes the
    *     longest, and because any future row could extend a
    *     subsequence run, greedy commits only when the window closes
    *     over the start or at the batch end-of-input flush (Flink's
    *     greedy relaxed oneOrMore materializes at the window boundary
    *     the same way). `reluctant` gives the shortest-take dual with
    *     eager emission.
    *   - NEGATION steps (`neg = true` — Flink's `notFollowedBy`):
    *     zero-width absence assertions over the gap to the next step's
    *     first consumed row, or — trailing — over the whole window
    *     horizon after the last consumed row, emitting at horizon
    *     expiry (the abandoned-cart pattern). In streaming, horizon
    *     expiry rides event-time timers (`StreamingOps.cepStream`).
    *
    * One-step patterns keep the O(buffer) earliest-next walk;
    * quantified/negation patterns run the generalized memoized
    * backtracking walk over subsequence takes (same cost class as the
    * contiguous one — see [[cepMatchOf]]'s cost model). Same scale
    * shape: one key shuffle + segmented scan; per-key state is bounded
    * by the window span of ALPHABET rows only — rows outside the
    * pattern's symbols are dropped at the door, never buffered (their
    * timestamps still advance horizon-gated pendings).
    */
  def cepFollowedByOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long, after: AfterMatch = SkipPastLast)
      : Dataset[CepMatch] = {
    validateSubseq(pattern)
    matchInternal(events, pattern, windowUs, after, contiguous = false)
  }

  /** The per-partition segmented scan shared by the batch folds: one
    * machine per key, every feed's emissions drained in order, and a
    * [[Machine.flush]] at each key boundary and at partition end (the
    * SQL finite-input contract — end of partition resolves greed).
    * Lazy single-pass iterator: holds the one live machine plus a
    * small emission queue, never the partition.
    */
  private def segmentedScan[O](it: Iterator[(Long, Long, Long, String, Long)],
      mk: () => Machine)(
      conv: (Long, Machine, (CepMatch, List[StepAgg])) => Iterator[O])
      : Iterator[O] =
    new Iterator[O] {
      private var key = Long.MinValue
      private var m: Machine = null
      private val q = scala.collection.mutable.Queue.empty[O]
      private def pump(): Unit = {
        while (q.isEmpty && it.hasNext) {
          val (u, ts, id, tpe, vc) = it.next()
          if (m == null) { key = u; m = mk() }
          else if (u != key) {
            val fm = m
            fm.flush().foreach(r => q ++= conv(key, fm, r))
            key = u; m = mk()
          }
          val cm = m
          cm.feedM(ts, id, tpe, vc).foreach(r => q ++= conv(u, cm, r))
        }
        if (q.isEmpty && !it.hasNext && m != null) {
          val fm = m
          fm.flush().foreach(r => q ++= conv(key, fm, r))
          m = null
        }
      }
      def hasNext: Boolean = { pump(); q.nonEmpty }
      def next(): O = { pump(); q.dequeue() }
    }

  private def matchInternal(events: DataFrame, pattern: Seq[Step],
      windowUs: Long, after: AfterMatch, contiguous: Boolean)
      : Dataset[CepMatch] = {
    validateAfter(pattern, after)
    val ss = events.sparkSession
    import ss.implicits._
    val pat = pattern.toIndexedSeq
    // the value column rides along only when a DEFINE predicate needs
    // it — symbol-only patterns keep working on frames without `value`
    val valueC =
      if (pat.exists(st => st.cmp.isDefined || st.sumCap.isDefined ||
          st.cross.nonEmpty))
        round(col("value") * 100).cast("long")
      else lit(0L)
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"),
        valueC.as("value_c"))
      .as[(Long, Long, Long, String, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        segmentedScan(it, () => new Machine(pat, windowUs, after, contiguous,
          needsAggs = false))(
          (u, _, r) => Iterator.single(r._1.copy(user_id = u)))
      }
  }

  /** One match × step row of [[cepMeasuresOf]]: the match identity
    * columns plus the step's MEASURES (COUNT, SUM of cents value,
    * FIRST/LAST event id — null when an optional step took no rows).
    */
  final case class CepMeasured(user_id: Long, start_event_id: Long,
    start_ts_us: Long, end_event_id: Long, end_ts_us: Long, n_rows: Long,
    step: Int, symbol: String, cnt: Long, sum_value_c: Long,
    min_value_c: Option[Long], max_value_c: Option[Long],
    first_event_id: Option[Long], last_event_id: Option[Long])

  /** MATCH_RECOGNIZE MEASURES — [[cepMatchOf]] with per-step
    * aggregates over the pattern variables: one output row per
    * (match, step), carrying COUNT/SUM/MIN/MAX/FIRST/LAST of the rows
    * that step consumed (AVG is sum/cnt downstream; value is the events
    * `value` in exact cents). The automaton already buffers the match
    * rows, so the measures are a driver-free fold over the completed
    * walk's step spans — same shuffle shape as the match-only form
    * (one key repartition, per-partition sort, segmented scan).
    */
  def cepMeasuresOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long, after: AfterMatch = SkipPastLast): Dataset[CepMeasured] = {
    validateCommon(pattern)
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
        segmentedScan(it, () => new Machine(pat, windowUs, after)) {
          case (u, _, (c, aggs)) =>
            aggs.iterator.map(a => CepMeasured(u, c.start_event_id,
              c.start_ts_us, c.end_event_id, c.end_ts_us, c.n_rows,
              a.step, a.symbol, a.cnt, a.sum_value_c,
              a.min_value_c, a.max_value_c,
              a.first_event_id, a.last_event_id))
        }
      }
  }

  /** One output row of the ALL-ROWS-PER-MATCH folds ([[cepRowsOf]] /
    * [[cepRowsGroupedOf]]): a consumed input row with its match's
    * identity columns riding along. `step` is the flat step index (or
    * the leaf index in [[gLeaves]] order for grouped patterns) — the
    * SQL surface maps it to the pattern variable name (CLASSIFIER).
    * The match id is (user_id, start_event_id): start event ids are
    * unique per key, so no extra match-numbering state is needed.
    */
  final case class CepRowMatched(user_id: Long, start_event_id: Long,
    start_ts_us: Long, end_event_id: Long, end_ts_us: Long, n_rows: Long,
    event_id: Long, ts_us: Long, event_type: String, value_c: Long,
    step: Int)

  /** One outcome row of [[cepTimedOutOf]]: a completed match
    * (`timed_out = false`, ends on the pattern's closing row) or a
    * TIMED-OUT PARTIAL (`timed_out = true`, ends on the last row the
    * partial consumed before its window expired; n_rows counts the
    * partial's rows).
    */
  final case class CepOutcome(user_id: Long, start_event_id: Long,
    start_ts_us: Long, end_event_id: Long, end_ts_us: Long, n_rows: Long,
    timed_out: Boolean)

  /** Flink CEP's TIMED-OUT PARTIAL MATCHES (`within` +
    * `TimedOutPartialMatchHandler` — the abandoned-transaction
    * surface): matches AND window-expired partials in one pass, each
    * partial surfaced exactly once, at the first row past its head's
    * horizon (row-driven, the batch analogue of Flink's timeout
    * timer) or at end-of-input (watermark → ∞, Flink's bounded-job
    * reading — every surviving partial resolves). Restricted to the
    * contiguous collapse-closure class with a required one-row tail
    * under SKIP PAST LAST ROW, where "the" partial is well-defined:
    * the post-emit buffer invariantly holds exactly the head's prefix
    * parse. Mismatch-killed heads (a contradicting row INSIDE the
    * window) are kills, not timeouts — Flink's own distinction. Same
    * one-shuffle segmented scan as every CEP fold.
    */
  /** Driver-side twin of the Machine's withTimeouts scope check — the
    * rejection must fire before a task does (batch and streaming
    * timeout surfaces share it).
    */
  private[graft] def validateTimeoutScope(pat: IndexedSeq[Step]): Unit =
    require(closureHolds(pat) &&
      !pat.exists(st => st.cmp.isDefined || st.any || st.reluctant ||
        st.neg || st.sumCap.isDefined || st.cross.nonEmpty) &&
      pat.last.bounds == ((1, 1)),
      "cep: timed-out partials need a contiguous collapse-closure " +
        "pattern with a required one-row tail under AFTER MATCH SKIP " +
        "PAST LAST ROW (elsewhere the partial to surface is ambiguous)")

  def cepTimedOutOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long): Dataset[CepOutcome] = {
    validateCommon(pattern)
    val pat = pattern.toIndexedSeq
    validateTimeoutScope(pat)
    val ss = events.sparkSession
    import ss.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"),
        lit(0L).as("value_c"))
      .as[(Long, Long, Long, String, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        segmentedScan(it, () => new Machine(pat, windowUs, SkipPastLast,
          contiguous = true, withTimeouts = true)) {
          case (u, _, (c, aggs)) =>
            // the empty-aggs sentinel marks a timeout (real matches
            // carry one StepAgg per step — patterns are non-empty)
            Iterator.single(CepOutcome(u, c.start_event_id, c.start_ts_us,
              c.end_event_id, c.end_ts_us, c.n_rows, aggs.isEmpty))
        }
      }
  }

  /** cep_timeout gate — the funnel under a 1-day completion window
    * with timed-out partials surfaced: every click is independently a
    * head here (funnel spans contain no clicks), so the oracle
    * classifies each click definitionally — a view run crossing the
    * horizon times out at the first late view (partial = the rows
    * before it), a completing purchase inside the horizon matches, a
    * contradicting row inside the horizon kills silently, end-of-data
    * times out whatever survived.
    */
  def cepTimeout(s: SparkSession, dir: String): DataFrame =
    cepTimedOutOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"), Step("view", plus = true), Step("purchase")),
      86400000000L)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  private def rowsScan(events: DataFrame, leaves: IndexedSeq[Step],
      windowUs: Long, after: AfterMatch, grouped: Option[GPat])
      : Dataset[CepRowMatched] = {
    val ss = events.sparkSession
    import ss.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"))
      .as[(Long, Long, Long, String, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        segmentedScan(it, () => new Machine(leaves, windowUs, after,
          contiguous = true, grouped = grouped, withRows = true,
          needsAggs = false)) {
          case (u, m, (c, _)) =>
            m.popRows().iterator.map { case (step, ts, id, tpe, vc) =>
              CepRowMatched(u, c.start_event_id, c.start_ts_us,
                c.end_event_id, c.end_ts_us, c.n_rows, id, ts, tpe, vc,
                step)
            }
        }
      }
  }

  /** ALL ROWS PER MATCH — the SQL standard's other MATCH_RECOGNIZE
    * output mode (Flink's planner ships both): one output row per
    * CONSUMED input row instead of one per match, each carrying the
    * match identity (user_id, start/end ids and timestamps, n_rows),
    * the row's own columns, and the step index that consumed it (→
    * CLASSIFIER at the SQL surface). Zero-width negation steps consume
    * nothing and contribute no rows, exactly as the standard's
    * excluded/empty variables. Same shuffle shape as [[cepMatchOf]];
    * the only extra cost is the per-match row capture, paid only on
    * this fold (`withRows` machines).
    */
  def cepRowsOf(events: DataFrame, pattern: Seq[Step],
      windowUs: Long, after: AfterMatch = SkipPastLast)
      : Dataset[CepRowMatched] = {
    validateCommon(pattern)
    validateAfter(pattern, after)
    rowsScan(events, pattern.toIndexedSeq, windowUs, after, None)
  }

  /** ALL ROWS PER MATCH over a GROUP-QUANTIFIER pattern: `step` is the
    * leaf's index in [[gLeaves]] order, and a repeated group's leaf
    * accumulates rows across iterations (the split-program walk records
    * per-leaf consumed positions on its accepting path since r14).
    * Alternation arms not taken contribute no rows.
    */
  def cepRowsGroupedOf(events: DataFrame, gpat: GPat,
      windowUs: Long, after: AfterMatch = SkipPastLast)
      : Dataset[CepRowMatched] = {
    validateGroupedEntry(gpat, after)
    rowsScan(events, gLeaves(gpat).toIndexedSeq, windowUs, after,
      Some(gpat))
  }

  /** Driver-side twin of the Machine's grouped-mode requires: the
    * grouped entry points must reject bad trees and flat-step
    * AFTER MATCH forms BEFORE a task runs (the Machine re-validates
    * in-ctor as the backstop).
    */
  private def validateGroupedEntry(gpat: GPat, after: AfterMatch): Unit = {
    validateGrouped(gpat)
    require(after == SkipPastLast || after == SkipToNextRow,
      "cep: grouped patterns support AFTER MATCH SKIP PAST LAST ROW " +
        "/ TO NEXT ROW (FIRST/LAST name flat steps)")
  }

  /** MEASURES over GROUP-QUANTIFIER patterns — [[cepMeasuresOf]]'s
    * grouped twin: one output row per (match, LEAF in [[gLeaves]]
    * order), aggregating every row that leaf consumed ACROSS group
    * iterations (`PATTERN ((A B)+ C)` answers `COUNT(A.*)` /
    * `SUM(A.value)` over all iterations' A rows — Flink/Calcite's
    * reading of measures over repeated groups). A leaf on no accepting
    * path (an alternation arm not taken) emits the zero row (cnt 0,
    * null min/max/first/last), like an optional flat step that took
    * nothing. Same scan shape as [[cepMatchGroupedOf]].
    */
  def cepMeasuresGroupedOf(events: DataFrame, gpat: GPat,
      windowUs: Long, after: AfterMatch = SkipPastLast)
      : Dataset[CepMeasured] = {
    validateGroupedEntry(gpat, after)
    val ss = events.sparkSession
    import ss.implicits._
    val leaves = gLeaves(gpat).toIndexedSeq
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"))
      .as[(Long, Long, Long, String, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        segmentedScan(it, () => new Machine(leaves, windowUs, after,
          contiguous = true, grouped = Some(gpat))) {
          case (u, _, (c, aggs)) =>
            aggs.iterator.map(a => CepMeasured(u, c.start_event_id,
              c.start_ts_us, c.end_event_id, c.end_ts_us, c.n_rows,
              a.step, a.symbol, a.cnt, a.sum_value_c,
              a.min_value_c, a.max_value_c,
              a.first_event_id, a.last_event_id))
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
      windowUs = 24L * 3600 * 1000000, after = SkipToNextRow)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_skip_first — AFTER MATCH SKIP TO FIRST click on
    * view+ click view (24 h): acceptance resumes at the click row, so
    * the view-run suffix re-matches SKIP TO NEXT ROW would emit are
    * skipped, but a chain continuing from the trailing view still
    * emits — the selective strategy, provably between the other two
    * (Round12Spec pins a corpus where all three differ). On the gate
    * corpus the answer is definitional: one match per (view-island,
    * single-click island, view-island) adjacency, starting at the
    * island's LEFTMOST window-valid view (the window-kill fallback
    * binds: 2 of the 50 emitting candidates at sf0.01 lose their
    * leftmost start to the 24 h window and emit a later one; 24
    * candidates die entirely).
    */
  def cepSkipFirst(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("view", plus = true), Step("click", plus = false),
        Step("view", plus = false)),
      windowUs = 24L * 3600 * 1000000, after = SkipToFirst(1))
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_followed_by — the RELAXED-CONTIGUITY funnel (click → view →
    * purchase with arbitrary rows between steps, 12 h window, SKIP
    * PAST LAST ROW): each step takes the earliest matching row after
    * the previous step's. Both selection mechanisms bind at sf0.01:
    * the window kills 1677 of 1722 subsequence parses, and the greedy
    * non-overlap cut drops 3 of the 45 valid candidates (42 emit).
    * The oracle is the definitional candidate set (per click, the
    * earliest following view then earliest following purchase) under
    * the same recursive greedy selection cep_revisit uses.
    */
  def cepFollowedBy(s: SparkSession, dir: String): DataFrame =
    cepFollowedByOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click", plus = false), Step("view", plus = false),
        Step("purchase", plus = false)),
      windowUs = 12L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_backtrack — a pattern OUTSIDE the collapse-closure class:
    * view+ view (adjacent same symbol — regex `a+a`), 24 h window.
    * Greedy view+ must BACK OFF one row so the final One step can take
    * the run's last view, and the in-walk window check makes the
    * backtracking bind further: a run spanning beyond the window emits
    * the LONGEST window-valid prefix, then re-chunks the remainder
    * under SKIP PAST LAST. A chunk RESOLVES when a later row proves it
    * can't grow — a non-view row bounding the run, or any same-user
    * row past the chunk start's window; a final chunk reaching an
    * unbroken end-of-data run stays pending forever (exactly the
    * streaming contract — greed needs the next row to commit). Every
    * a final chunk reaching an unbroken end-of-data run resolves at
    * the batch END-OF-INPUT flush (SQL finite-input semantics — see
    * [[cepMatchOf]]; only the STREAMING twin keeps it pending).
    * Every mechanism binds at sf0.01 / 24 h: 285 chunks emit (280 by
    * bounding row or window staleness + 5 by the end-of-input flush),
    * 5 multi-chunk islands, 32 interior starts skipped by the
    * start-advance fallback.
    */
  def cepBacktrack(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("view", plus = true), Step("view", plus = false)),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_vshape — the SQL-standard MATCH_RECOGNIZE flagship: the
    * V-pattern `STRT DOWN+ UP+` with DEFINE predicates over the value
    * column (DOWN: value < PREV(value); UP: value > PREV(value);
    * STRT: any row). Exercises three r12 capabilities at once:
    * wildcard steps, PREV predicates, and a trailing quantified step
    * (the UP+ run resolves at the first non-ascending row — the
    * backtracking walk's run-resolution rule — or at the batch
    * END-OF-INPUT flush: 49 pending end-of-data ascents resolve there
    * at sf0.01, the finite-input semantics [[cepMatchOf]] documents;
    * the streaming twin keeps them pending). SKIP PAST LAST makes
    * consecutive Vs interact: a new
    * descent starting right after an accepted V has its natural STRT
    * (the previous V's peak) already consumed, so its start is pushed
    * one row in — the oracle's floor recursion, binding on 1928 of
    * the selections (1212 pairs die entirely to the push). 2021
    * matches; the 7-day window exceeds every V span at gate scale
    * (max 6.4 d — verified), so windowed chunking (oracled by
    * cep_backtrack) stays out of this gate's oracle.
    */
  /** cep_reluctant — LAZY quantifiers (MATCH_RECOGNIZE's `+?`):
    * view+? view takes the SHORTEST run that lets the final step
    * match, so a view island resolves into consecutive disjoint PAIRS
    * — provably different from the greedy twin (cep_backtrack's
    * view+ view consumes whole islands). Eager completion: a pair
    * emits at its second row's feed, no bounding row needed, so
    * end-of-data islands participate fully (only trailing singletons
    * pend). The 6 h window binds as a FRAME SHIFT: a pair whose gap
    * exceeds the window is skipped and pairing resumes one row later
    * (165 pairs / 197 shifts at sf0.01).
    */
  def cepReluctant(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("view", plus = true, reluctant = true),
        Step("view", plus = false)),
      windowUs = 6L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  def cepVshape(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("*", plus = false, any = true),
        Step("*", plus = true, any = true, cmp = Some(PrevLt)),
        Step("*", plus = true, any = true, cmp = Some(PrevGt))),
      windowUs = 7L * 24 * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_not_followed — the ABANDONED-CART pattern (Flink CEP
    * `notFollowedBy`, trailing): a click NOT followed by a purchase
    * within 12 h, relaxed contiguity. Each click is its own candidate
    * (single-row matches make SKIP PAST LAST evaluate every click
    * independently); a purchase inside the horizon KILLS it, horizon
    * expiry EMITS it (batch: the first later-fed row past the horizon
    * or the end-of-input flush; streaming: an event-time timer at the
    * horizon). Both mechanisms bind at sf0.01: 1613 of 2006 clicks
    * abandoned, 393 killed by a purchase. Oracle: definitional
    * NOT EXISTS over (rn, ts)-ordered rows with the horizon binding.
    */
  def cepNotFollowed(s: SparkSession, dir: String): DataFrame =
    cepFollowedByOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"), Step("purchase", neg = true)),
      windowUs = 12L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_not_between — MIDDLE-position absence (`notFollowedBy`
    * between two positive steps): click → purchase (earliest, relaxed)
    * with NO error in the gap, within 12 h. A gap error kills the
    * branch — and with earliest-purchase parsing, the whole start
    * (any later purchase has the same error before it). Greedy SKIP
    * PAST LAST selection chains candidates exactly like
    * cep_followed_by (311 matches at sf0.01). Oracle: the earliest-
    * purchase candidate CTE with a NOT EXISTS gap clause under the
    * same recursive greedy selection.
    */
  def cepNotBetween(s: SparkSession, dir: String): DataFrame =
    cepFollowedByOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"), Step("error", neg = true), Step("purchase")),
      windowUs = 12L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_not_next — STRICT-contiguity absence (Flink CEP `notNext`,
    * trailing): click immediately followed by purchase, whose NEXT
    * physical row must not be an error — scoped to the 24 h window
    * horizon (an error arriving past the horizon is outside the
    * assertion; no next row resolves as a pass once the window closes
    * or at end-of-input). All three pass/kill mechanisms bind at
    * sf0.01: 35 pairs killed by a next-row error, 16 pass because the
    * error lands past the horizon, 4 pass at end-of-data; 295 emit.
    */
  def cepNotNext(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"), Step("purchase"), Step("error", neg = true)),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_followed_plus — LOOPING RELAXED STATES (followedBy +
    * oneOrMore, greedy): click → view+ → purchase over subsequences
    * within 48 h. The greedy view+ run takes EVERY view inside the
    * horizon that still leaves a completing purchase after it — and
    * since any future row could extend a subsequence run, the take
    * commits only when the window closes over the start (or at the
    * end-of-input flush), Flink's greedy-relaxed materialization
    * point. Binding at sf0.01: 316 matches from 1162 candidate clicks
    * (greedy non-overlap selection), 76 consuming more than one view
    * (maximality). Oracle: per candidate the maximal view prefix with
    * a horizon-valid purchase after it, earliest such purchase as the
    * end, under the recursive greedy selection.
    */
  def cepFollowedPlus(s: SparkSession, dir: String): DataFrame =
    cepFollowedByOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"), Step("view", plus = true), Step("purchase")),
      windowUs = 48L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_cross_followed — CROSS-VARIABLE DEFINE under RELAXED
    * contiguity (r16; Flink's IterativeCondition over followedBy
    * states): the relaxed funnel click → view+ → purchase where the
    * purchase must beat the FIRST view's value
    * (`P.value > FIRST(V.value)`), within 48 h. Unlike the contiguous
    * twin ([[MatchRecognize.cepCrossDefine]]), a failed purchase
    * predicate does NOT kill the candidate: relaxed matching SKIPS the
    * disqualified purchase, and shrinking the greedy view take exposes
    * EARLIER interleaved purchases — so the value predicate interacts
    * with greed (the machine's take-shrink loop), which is exactly the
    * seam this gate freezes. Oracle: the followed-plus recursive CTE
    * with the purchase universe restricted to QUALIFYING rows
    * (vc > first in-horizon view's vc) — greedy-longest take = all
    * in-horizon views before the LAST qualifying purchase, end = the
    * earliest qualifying purchase after the take, recursive
    * SKIP PAST LAST selection. Binding at sf0.01: 172 matches vs the
    * plain funnel's 316 (the predicate kills and reshapes), 42 multi-
    * view, and 21 matches NOT in the plain set — shifted ends and
    * re-opened starts, the skip-not-kill semantics observably binding.
    */
  def cepCrossFollowed(s: SparkSession, dir: String): DataFrame =
    cepFollowedByOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"), Step("view", plus = true),
        Step("purchase", cross = List(CrossRef(1, first = true, PrevGt)))),
      windowUs = 48L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_define_agg — RUNNING-AGGREGATE DEFINE (`SUM(A.value) <= c`):
    * the bounded-spend session click → purchase+ where the purchase
    * run's cumulative value stays <= 150.00, within 12 h, strict
    * contiguity. The cap is evaluated per row exactly as SQL DEFINE
    * does — the first purchase that would push the running sum past
    * the cap fails its own predicate and bounds the run (which also
    * closes the run's future-extension pending). Candidates are
    * independent (match interiors are purchases, starts are clicks).
    * All three cuts bind at sf0.01 / 12 h: 256 matches, 10 runs cut by
    * the cap, 33 by the window, 20 consuming more than one purchase.
    * Oracle: running-sum window over contiguous purchase runs after
    * each click, take = the maximal prefix under both caps.
    */
  def cepDefineAgg(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"),
        Step("purchase", plus = true, sumCap = Some(15000L))),
      windowUs = 12L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** GROUP-QUANTIFIER pattern matching — `PATTERN ((A B)+ C)`:
    * quantifiers over sub-SEQUENCES (see [[GPat]]), strict contiguity,
    * compiled to a split-program the machine walks with the shared
    * backtracking discipline. AFTER MATCH SKIP PAST LAST ROW / TO NEXT
    * ROW (FIRST/LAST name flat steps, which repeated-group leaves
    * don't have); MEASURES are the flat machine's — compose
    * downstream. Same scale shape and cost model as [[cepMatchOf]]'s
    * backtracking class (one key shuffle, segmented scan,
    * window-bounded buffers, O(program · buffer²) worst-case feeds).
    */
  def cepMatchGroupedOf(events: DataFrame, gpat: GPat,
      windowUs: Long, after: AfterMatch = SkipPastLast)
      : Dataset[CepMatch] = {
    validateGroupedEntry(gpat, after)
    val ss = events.sparkSession
    import ss.implicits._
    val leaves = gLeaves(gpat).toIndexedSeq
    val valueC =
      if (leaves.exists(st => st.cmp.isDefined || st.sumCap.isDefined ||
          st.cross.nonEmpty))
        round(col("value") * 100).cast("long")
      else lit(0L)
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"),
        valueC.as("value_c"))
      .as[(Long, Long, Long, String, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        segmentedScan(it, () => new Machine(leaves, windowUs, after,
          contiguous = true, grouped = Some(gpat), needsAggs = false))(
          (u, _, r) => Iterator.single(r._1.copy(user_id = u)))
      }
  }

  /** cep_group — the GROUP-QUANTIFIER gate: ((click|view)(signup|
    * error))+ purchase within 24 h — an alternating two-symbol-CLASS
    * run (A B repeated) closed by a purchase. Greedy repetition takes
    * the maximal alternating chain; leftmost preference makes the
    * match start the EARLIEST A chaining unbroken to the purchase, and
    * a window-killed leftmost start falls back along the chain at
    * stride 2 to the longest window-valid SUFFIX (the machine's
    * dropToNextStart walks first-set rows — here every interior B is
    * outside the first set, so the stride is exactly the chain's A
    * positions). Every mechanism binds at sf0.01 / 24 h: 208 matches,
    * 13 with >= 2 group iterations, 22 window-shifted starts, 116
    * candidates dead to the window. Oracle: a parity-partitioned
    * running MAX finds each purchase's last alternation break (the
    * chain's leftmost A = break + 2), then the window shift is a MIN
    * over the chain's same-parity positions inside the horizon — no
    * recursion needed because chains never overlap (they contain no
    * purchase rows, and matches end at theirs).
    */
  def cepGroup(s: SparkSession, dir: String): DataFrame =
    cepMatchGroupedOf(graft.Tables.t(s, dir, "events"),
      GCat(Seq(
        GRep(GCat(Seq(
          GLf(Step("click", alt = Set("view"))),
          GLf(Step("signup", alt = Set("error"))))), 1, Int.MaxValue),
        GLf(Step("purchase")))),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_alt_group — SEQUENCE ALTERNATION under group repetition:
    * ((click view | view click))+ purchase within 7 d — either-order
    * adjacent pairs repeated, then a purchase. Both arms bind at
    * sf0.01 (49 click-first / 54 view-first single-pair candidates),
    * iteration binds (11 multi-iteration matches of the 148), and the
    * leftmost-arm preference is semantically invisible here (the arms
    * are disjoint on their first symbol given the second — exactly why
    * the parity-chain oracle stays closed-form: a valid pair is ANY
    * adjacent click/view pair with distinct types, whichever arm
    * matched it). Window mechanics are cep_group's (oracled there; the
    * 7 d window exceeds every span at gate scale).
    */
  def cepAltGroup(s: SparkSession, dir: String): DataFrame =
    cepMatchGroupedOf(graft.Tables.t(s, dir, "events"),
      GCat(Seq(
        GRep(GAlt(Seq(
          GCat(Seq(GLf(Step("click")), GLf(Step("view")))),
          GCat(Seq(GLf(Step("view")), GLf(Step("click")))))),
          1, Int.MaxValue),
        GLf(Step("purchase")))),
      windowUs = 7L * 24 * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_prev2 — PREV with an OFFSET (`A.value > PREV(A.value, 2)`):
    * click → view → view+ where each further view's value exceeds the
    * value TWO physical rows back (for the first quantified view that
    * is the click row — PREV navigates input rows), within 24 h,
    * strict contiguity. Candidates are independent (interiors are
    * views, starts are clicks); the greedy run bounds at the first
    * row failing the offset predicate, the window trims the take to
    * the longest window-valid prefix, end-of-data runs resolve at the
    * flush. 23 matches / 70 rows at sf0.01. Oracle: lag(value, 2) run
    * islands after click-view anchors, capped by the window.
    */
  def cepPrev2(s: SparkSession, dir: String): DataFrame =
    cepMatchOf(graft.Tables.t(s, dir, "events"),
      Seq(Step("click"), Step("view"),
        Step("view", plus = true, cmp = Some(PrevGt), cmpOff = 2)),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))

  /** cep_group_measures — MEASURES over a GROUP QUANTIFIER: the
    * cep_group pattern (((click|view)(signup|error))+ purchase, 24 h)
    * with per-LEAF aggregates accumulated ACROSS iterations — leaf 0
    * answers COUNT/SUM over every (click|view) row of every iteration,
    * the ability the flat-only measures runner rejects. Matches are
    * cep_group's (oracled there); the measures join back definitionally
    * in the oracle: within a match's dense rn span, the A rows are the
    * start-parity positions, the B rows the off-parity ones, the
    * purchase the last — aggregated per class with arg_min/arg_max for
    * FIRST/LAST. Multi-iteration accumulation binds at sf0.01
    * (cep_group has 13 matches with >= 2 iterations → leaf 0 cnt >= 2).
    */
  def cepGroupMeasures(s: SparkSession, dir: String): DataFrame =
    cepMeasuresGroupedOf(graft.Tables.t(s, dir, "events"),
      GCat(Seq(
        GRep(GCat(Seq(
          GLf(Step("click", alt = Set("view"))),
          GLf(Step("signup", alt = Set("error"))))), 1, Int.MaxValue),
        GLf(Step("purchase")))),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"),
        col("step"))

  /** cep_cross_group — CROSS-VARIABLE DEFINE on a GROUP-QUANTIFIER
    * pattern (r17, closing the last CEP rejection class): the
    * cep_group pattern ((click|view)(signup|error))+ purchase within
    * 24 h, where the purchase must beat the FIRST chain row's value —
    * `P.value > FIRST(A.value)` with A the repeated group's first
    * leaf, whose pool ACCUMULATES across iterations (FIRST = the
    * match's opening row). A failed predicate is a KILL (contiguous
    * semantics) and the machine falls back along the chain's
    * same-parity starts — the new start is both the window's and the
    * predicate's candidate, so the oracle extends cep_group's
    * parity-chain MIN with the value conjunct (no recursion needed,
    * chains still never overlap). Every mechanism binds at sf0.01 /
    * 24 h: 208 plain matches → 111 (the predicate kills 97), 3
    * survivor starts are predicate-SHIFTED along their chain (the
    * fallback interacts with the cross pool — FIRST moves with the
    * start), 5 matches carry >= 2 iterations, and a LAST(A) reading
    * provably diverges (109 matches, 2 asymmetric).
    */
  def cepCrossGroup(s: SparkSession, dir: String): DataFrame =
    cepMatchGroupedOf(graft.Tables.t(s, dir, "events"),
      GCat(Seq(
        GRep(GCat(Seq(
          GLf(Step("click", alt = Set("view"))),
          GLf(Step("signup", alt = Set("error"))))), 1, Int.MaxValue),
        GLf(Step("purchase",
          cross = List(CrossRef(0, first = true, PrevGt)))))),
      windowUs = 24L * 3600 * 1000000)
      .toDF()
      .orderBy(col("user_id"), col("start_ts_us"), col("start_event_id"))
}
