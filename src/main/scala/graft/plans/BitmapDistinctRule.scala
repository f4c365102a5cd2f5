package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite `COUNT(DISTINCT intcol)` into the
  * bitmap-aggregation form
  *
  *   Agg(g, count(distinct e))
  *   ⇒ Agg(g, sum(bitmap_count(bmp)))
  *        ← Agg(g ∪ bucket, bitmap_construct_agg(bit_pos(e)) AS bmp)
  *             ← Project(…, bucket = bitmap_bucket_number(e))
  *
  * so the distinct VALUES travel as fixed-size bitmap partials that OR
  * map-side, instead of as one shuffle row per (group, value) pair —
  * at 10⁹ distinct keys per group that is kilobytes of bitmaps vs
  * gigabytes of values through the exchange (the Doris/ClickHouse
  * bitmap-index trick, as a transparent Catalyst rewrite). Exactness is
  * free: a bitmap position either is or isn't set.
  *
  * Scope (anything else is left untouched):
  *  - gated off by default — `SET spark.graft.bitmapDistinct.enabled=true`;
  *  - exactly ONE aggregate function in the Aggregate, a non-FILTERed
  *    `Count(e)` with `isDistinct`, `e` integral (byte/short/int/long),
  *    deterministic, and built only from the child's output;
  *  - the remaining output columns are grouping expressions (their
  *    attributes pass through the two-level form unchanged).
  *
  * Null semantics match Count(distinct): BitmapConstructAgg skips null
  * positions, and a group whose `e` are all null yields an empty bitmap
  * → sum(bitmap_count)=0 (RuleSpec pins this against the unrewritten
  * twin). The global (no-grouping) empty-input case yields sum=NULL,
  * coalesced back to 0 to preserve Count's non-null contract — the
  * output Alias keeps the original exprId, so parents re-resolve
  * nothing.
  *
  * Fourth leg of the custom-Catalyst surface (Expression: DotF32,
  * Strategy: AsOfJoinStrategy, Rule: BandedRangeJoinRule + this),
  * injected via `GraftExtensions`.
  */
object BitmapDistinctRule extends Rule[LogicalPlan] {

  private val Flag = "spark.graft.bitmapDistinct.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(Flag, "false").equalsIgnoreCase("true")

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan transform {
      case agg @ Aggregate(grouping, aggExprs, child, _) if agg.resolved =>
        rewrite(agg, grouping, aggExprs, child).getOrElse(agg)
    }
  }

  private def rewrite(
      agg: Aggregate,
      grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    // collect every AggregateExpression in the output list
    val aggFns = aggExprs.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    aggFns match {
      case Seq(ae @ AggregateExpression(
            Count(Seq(e)), Complete, true, None, _))
          if isIntegral(e.dataType) && e.deterministic &&
             e.references.subsetOf(child.outputSet) &&
             // attribute-only groupings: the inner level re-groups by the
             // SAME exprs and must also pass them through as output —
             // sound for plain columns, surgery for computed keys
             grouping.forall(_.isInstanceOf[Attribute]) =>
        // the count column must be a direct Alias of the one agg fn —
        // an expression OVER the count (count+1) would need transform
        // surgery; keep the scope crisp
        val countAlias = aggExprs.collectFirst {
          case al @ Alias(`ae`, _) => al
        }
        val others = aggExprs.filterNot(
          ne => countAlias.exists(_.exprId == ne.exprId))
        // every non-count output must be (an alias of) a grouping expr
        val groupingSemantics = grouping.map(_.canonicalized).toSet
        val passThrough = others.forall {
          case a: Attribute => groupingSemantics.contains(a.canonicalized)
          case Alias(c, _)  => groupingSemantics.contains(c.canonicalized)
          case _            => false
        }
        if (countAlias.isEmpty || !passThrough) return None

        // the bitmap scalar expressions are RuntimeReplaceable and the
        // analyzer's ReplaceExpressions pass has ALREADY run by the time
        // an injected optimizer rule fires — insert their replacement
        // forms directly or codegen aborts on the placeholder
        def rt(x: Expression): Expression = x match {
          case r: RuntimeReplaceable => r.replacement
          case other                 => other
        }
        val eL = if (e.dataType == LongType) e else Cast(e, LongType)
        val bucket = Alias(rt(BitmapBucketNumber(eL)), "__graft_bm_bucket")()
        val pos = rt(BitmapBitPosition(eL))
        val proj = Project(child.output ++ Seq(bucket), child)

        val bmp = Alias(
          AggregateExpression(
            BitmapConstructAgg(pos), Complete, isDistinct = false),
          "__graft_bm")()
        // inner: group by (g ∪ bucket); carry the grouping ATTRS through
        val groupAttrs = grouping.flatMap(_.references).distinct
        val inner = Aggregate(
          grouping :+ bucket.toAttribute,
          (groupAttrs :+ bucket.toAttribute :+ bmp).distinct,
          proj, None)

        val summed = AggregateExpression(
          Sum(rt(BitmapCount(bmp.toAttribute))), Complete,
          isDistinct = false)
        val ca = countAlias.get
        val outCount = Alias(
          Coalesce(Seq(summed, Literal(0L))), ca.name)(exprId = ca.exprId)
        val outer = Aggregate(
          grouping, others :+ outCount, inner, None)
        Some(outer)
      case _ => None
    }
  }
}
