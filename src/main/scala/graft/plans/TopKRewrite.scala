package graft.plans

import graft.functions.TopKByValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Optimizer rewrite: the window-rank top-k idiom
  *
  * {{{
  *   SELECT part…, v, id FROM (
  *     SELECT *, row_number() OVER (PARTITION BY part… ORDER BY v DESC, id) rn
  *   ) WHERE rn <= k
  * }}}
  *
  * becomes the bounded-heap aggregate ([[TopKByValue]]) + explode. The
  * window form shuffles every row of every group and SORTS each group in
  * one task — on few-key data that is a handful of single-reducer sorts
  * no matter the cluster size. The aggregate form ships at most
  * k·partitions rows per group and never sorts a group.
  *
  * Fires only when the rewrite is provably identical:
  *   - plain `row_number()` ranked by exactly (v DESC, id ASC), `v`
  *     DoubleType and NON-NULLABLE (a nullable v ranks NULLS LAST in the
  *     window form but is skipped by the heap — row counts could differ
  *     for groups with < k non-null rows), `id` LongType;
  *   - the rank attribute is used ONLY in the `rn <= k` / `rn < k+1`
  *     filter — the projection above must reference child columns only;
  *   - partition keys are plain attributes.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) — sessions
  * built without the extensions keep the window plan. Duplicate (v, id)
  * pairs are safe: both forms keep exactly k rows and any k-subset of
  * equal keys is the same multiset.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private object RankLimit {
    def unapply(e: Expression): Option[(AttributeReference, Int)] = e match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _)) =>
        Some((a, k))
      case LessThan(a: AttributeReference, Literal(k: Int, _)) =>
        Some((a, k - 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        Filter(RankLimit(rnAttr, k),
          Window(Seq(rnAlias @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, Seq(
                SortOrder(v: AttributeReference, Descending, NullsLast, _),
                SortOrder(id: AttributeReference, Ascending, NullsFirst, _)),
              _)), _)),
            _, _, child, _)))
        if k >= 1 &&
          rnAttr.exprId == rnAlias.exprId &&
          v.dataType == DoubleType && !v.nullable &&
          id.dataType == LongType &&
          part.forall(_.isInstanceOf[AttributeReference]) &&
          projList.forall(_.references.subsetOf(child.outputSet)) &&
          child.outputSet.contains(v) && child.outputSet.contains(id) =>
      val partAttrs = part.map(_.asInstanceOf[AttributeReference])
      val aggFn = TopKByValue(v, id, k)
      val topAlias = Alias(aggFn.toAggregateExpression(), "__topk")()
      val agg = Aggregate(partAttrs, partAttrs :+ topAlias, child)
      val elemType = aggFn.dataType.asInstanceOf[ArrayType].elementType
      val genOut = AttributeReference("__t", elemType, nullable = false)()
      val gen = Generate(Explode(topAlias.toAttribute),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(genOut), child = agg)
      // restore the ORIGINAL attribute ids so everything above the
      // rewrite keeps resolving
      val restoreV =
        Alias(GetStructField(genOut, 0, Some("v")), v.name)(exprId = v.exprId)
      val restoreId =
        Alias(GetStructField(genOut, 1, Some("id")), id.name)(exprId = id.exprId)
      val restore =
        Project((partAttrs: Seq[NamedExpression]) ++ Seq(restoreV, restoreId), gen)
      Project(projList, restore)
  }
}
