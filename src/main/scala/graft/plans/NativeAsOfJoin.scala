package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native AS-OF join — the full custom-operator tier (SURVEY.md §7.3
  * row (c)): a logical node, an injected `SparkStrategy`, and a physical
  * `SparkPlan` that executes the per-key ordered merge directly.
  *
  * The compositional form (operators.AsOfJoin, union-carry-forward) pays
  * for generality: it unions both inputs into one wide nullable schema,
  * sorts the merged timeline, runs a window, and filters half the rows
  * back out. This operator instead asks the planner for exactly what the
  * algorithm needs — both sides hash-clustered on the key and sorted by
  * (key, ts) — and then streams the two iterators through a single-pass
  * merge with O(1) state (the last matching right row). No union, no
  * window machinery, no filter-half-away: one exchange + sort per side,
  * like a sort-merge join.
  *
  * Semantics match operators.AsOfJoin.asOfJoin: latest right row with
  * rTs <= lTs per key (inclusive), ties on rTs broken by the largest
  * tiebreak, left-outer (unmatched left rows keep nulls). Key/ts/tiebreak
  * must evaluate to non-null long-backed atomics (bigint / timestamp);
  * null-keyed or null-ts rows are unmatched (left) / skipped (right).
  *
  * Reference scope: Flink's temporal table join (SURVEY.md §2.3 as-of
  * row) re-expressed as a first-class Spark physical operator.
  */
object NativeAsOfJoin {

  /** Logical marker node: output = left ⧺ right (right side nullable). */
  case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, leftTs: Expression,
      rightKey: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy mapping the marker node to the physical operator. */
  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, lts, rk, rts, tie) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, tie) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
      leftKey: Expression, leftTs: Expression,
      rightKey: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // hash-cluster both sides on the key; EnsureRequirements aligns the
    // two partitionings (and AQE's ValidateRequirements re-checks after
    // any coalescing), exactly as for a shuffled join
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey), false, None) ::
        ClusteredDistribution(Seq(rightKey), false, None) :: Nil

    // (key, ts) per side; right additionally by tiebreak so "last row
    // consumed" is deterministically the winner among equal timestamps
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

    // one output row per left row, in the left child's layout
    override def outputPartitioning = left.outputPartitioning

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyExprs = Seq(leftKey, leftTs)
      val rKeyExprs = Seq(rightKey, rightTs)
      val lOut = left.output
      // the merge substitutes an all-null row for unmatched lefts, so the
      // result projection must treat every right field as nullable — a
      // non-nullable binding would skip the isNullAt check and read 0s
      val rOut = right.output.map(_.withNullability(true))
      val allOut = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // projections are codegen'd per partition (never serialized)
        val lProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rProj = UnsafeProjection.create(rKeyExprs, rOut)
        val resultProj = UnsafeProjection.create(allOut, lOut ++ rOut)
        val nullRight = new GenericInternalRow(rOut.size)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rHead: InternalRow = null   // lookahead right row
          private var rk = 0L; private var rts = 0L
          private var carry: InternalRow = null   // last match, copied
          private var carryKey = 0L
          private def advanceRight(): Unit = {
            rHead = null
            while (rHead == null && rIter.hasNext) {
              val r = rIter.next()
              val kr = rProj(r)
              if (!kr.isNullAt(0) && !kr.isNullAt(1)) {
                rk = kr.getLong(0); rts = kr.getLong(1); rHead = r
              } // null key/ts right rows can never match: skip
            }
          }
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val kl = lProj(l)
            if (kl.isNullAt(0) || kl.isNullAt(1)) {
              resultProj(joined(l, nullRight))
            } else {
              val lk = kl.getLong(0); val lts = kl.getLong(1)
              // consume right rows at or before (lk, lts); the last one
              // with the matching key is the as-of row (right ordering
              // makes it max-(ts, tiebreak))
              while (rHead != null &&
                  (rk < lk || (rk == lk && rts <= lts))) {
                if (rk == lk) { carry = rHead.copy(); carryKey = lk }
                advanceRight()
              }
              if (carry != null && carryKey == lk) resultProj(joined(l, carry))
              else resultProj(joined(l, nullRight))
            }
          }
        }
      }
    }
  }

  /** Ensure the strategy is registered on this session (idempotent) —
    * works for sessions built without `spark.sql.extensions`.
    */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy

  /** DataFrame-facing builder. The right side is re-projected through
    * fresh aliases so a self-join (both sides off the same source) can't
    * leak duplicate expression ids into the output schema.
    *
    * @param rightPayload (rightCol, outputName) pairs carried to the
    *                     output (names must not collide with left's)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      tiebreak: String, rightPayload: Seq[(String, String)]): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val rAliased = right.select(
      (Seq((key, "__r_key"), (ts, "__r_ts"), (tiebreak, "__r_tie")) ++
        rightPayload).map { case (c, n) => col(c).as(n) }: _*)
    val lp = left.queryExecution.analyzed
    val rp = rAliased.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinNode(lp, rp,
      attr(lp, key), attr(lp, ts),
      attr(rp, "__r_key"), attr(rp, "__r_ts"), attr(rp, "__r_tie"))
    GraftSqlShim.ofRows(spark, node)
      .drop("__r_key", "__r_ts", "__r_tie")
  }
}
