package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive bounded time-range join into the
  * BANDED equi-join `api.Events.bandedRangeJoin` builds by hand — so a
  * user can write the obvious
  *
  *   a.join(b, cond && b_ts > a_ts && b_ts <= a_ts + W)
  *
  * and the optimizer makes it scale. Without the rewrite that plan is a
  * BroadcastNestedLoopJoin when no equi conjunct exists (quadratic in
  * rows), or a per-key-quadratic residual when one does. The rewrite
  * adds `bucket(ts) = ts div W` to BOTH sides as a new equi key — the
  * probe side explodes ×2 (a match's bucket is the probe's or the next:
  * bucket is monotone with band spacing ≥ W, so any (a, a+W] window
  * crosses at most one boundary, under floor OR truncating division) —
  * and keeps the original condition as the exact residual. Results are
  * identical by construction; only the join's candidate set shrinks.
  *
  * The third leg of the custom-Catalyst surface (Expression: DotF32,
  * Strategy: AsOfJoinStrategy, Rule: this), injected via
  * `GraftExtensions` / `spark.experimental.extraOptimizations`.
  * Idempotence (the rule runs inside a fixed-point batch and transform
  * revisits rewritten children): rewritten joins are recognizable by
  * the reserved `__graft_bk` attribute prefix and skipped.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val Tag = "__graft_bk"

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(_, _, Inner, Some(cond), _)
        if j.resolved && !cond.references.exists(_.name.startsWith(Tag)) =>
      rewrite(j, cond).getOrElse(j)
  }

  /** (a, b) as (left-attr, right-attr) if the pair is long-typed and
    * sided correctly for `j`. */
  private def sided(j: Join, x: Expression, y: Expression)
      : Option[(Attribute, Attribute)] = (x, y) match {
    case (a: Attribute, b: Attribute)
        if a.dataType == LongType && b.dataType == LongType &&
           j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
      Some((a, b))
    case _ => None
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conj = splitConjunctivePredicates(cond)
    // strict lower bound: b > a (either spelling)
    val lowers: Seq[(Attribute, Attribute)] = conj.flatMap {
      case GreaterThan(b, a) => sided(j, a, b)
      case LessThan(a, b)    => sided(j, a, b)
      case _                 => None
    }
    // inclusive upper bound: b <= a + w (w a positive long literal)
    val uppers: Seq[((Attribute, Attribute), Long)] = conj.flatMap {
      case LessThanOrEqual(b, Add(a, Literal(w: Long, LongType), _)) =>
        sided(j, a, b).map((_, w))
      case LessThanOrEqual(b, Add(Literal(w: Long, LongType), a, _)) =>
        sided(j, a, b).map((_, w))
      case GreaterThanOrEqual(Add(a, Literal(w: Long, LongType), _), b) =>
        sided(j, a, b).map((_, w))
      case _ => None
    }
    val banded = for {
      ((a, b), w) <- uppers.find { case (ab, w) =>
        w > 0 && lowers.contains(ab) }
    } yield {
      val wl = Literal(w, LongType)
      val probe =
        AttributeReference(s"${Tag}_probe", LongType, nullable = false)()
      val gen = Generate(
        Explode(CreateArray(Seq(Literal(0L), Literal(1L)))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(probe), child = j.left)
      val bkA = Alias(
        Add(new IntegralDivide(a, wl), probe), s"${Tag}_a")()
      val bkB = Alias(new IntegralDivide(b, wl), s"${Tag}_b")()
      val pa = Project(j.left.output :+ bkA, gen)
      val pb = Project(j.right.output :+ bkB, j.right)
      val newCond = And(EqualTo(bkA.toAttribute, bkB.toAttribute), cond)
      // restore the original output (ids pass through untouched)
      Project(j.output,
        Join(pa, pb, Inner, Some(newCond), j.hint))
    }
    banded
  }
}
