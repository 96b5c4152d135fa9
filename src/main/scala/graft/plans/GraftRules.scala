package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.expr.SortedLongIntersectCount

/** Optimizer rule: PPJoin-style length pruning for set-similarity filters —
  * the `Rule[LogicalPlan]` tier of SURVEY.md §7.4's custom-Catalyst ladder
  * (alongside the `DoubleVectorDot`/`SortedLongIntersectCount` Expressions
  * and the AsOfJoin Plan/Strategy/Exec operator).
  *
  * A Jaccard threshold filter in canonical inclusion-exclusion form,
  *
  * {{{ cast(sic(a,b)) / cast((na + nb) - sic(a,b)) >= t }}}
  *
  * mathematically implies `min(na,nb) / max(na,nb) >= t` (|∩| <= min,
  * |∪| >= max). That implied predicate never touches the arrays — it is an
  * integer-compare prune that pushdown can evaluate BEFORE the O(n+m)
  * intersection runs on every candidate pair. Users write the plain
  * threshold filter; this rule injects the prune (with a 1e-9 slack so
  * double rounding can never drop a boundary pair — prunes slightly less,
  * never wrongly).
  *
  * Idempotent (required: user-provided optimizer batches run to fixed
  * point): the conjunct is only added while absent.
  */
object JaccardLengthPrune extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Match `cast(sic)/cast((na+nb)-sic') >= Literal(t)` with sic ≡ sic'. */
  private def matchJaccard(e: Expression): Option[(Expression, Expression, Double)] =
    e match {
      case GreaterThanOrEqual(
          Divide(
            Cast(sic @ SortedLongIntersectCount(_, _), DoubleType, _, _),
            Cast(Subtract(Add(na, nb, _), sic2, _), DoubleType, _, _), _),
          Literal(t: Double, DoubleType))
        if sic.semanticEquals(sic2) => Some((na, nb, t))
      case _ => None
    }

  private def lengthPrune(na: Expression, nb: Expression, t: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(na, nb)), DoubleType),
      Multiply(Literal(t - 1e-9), Cast(Greatest(Seq(na, nb)), DoubleType)))

  /** Add missing prune conjuncts to a predicate; None when nothing to do. */
  private def injectInto(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val prunes = conjuncts.flatMap(matchJaccard).flatMap { case (na, nb, t) =>
      val p = lengthPrune(na, nb, t)
      // idempotence: skip if an equivalent prune conjunct already exists
      if (conjuncts.exists(_.semanticEquals(p))) None else Some(p)
    }
    if (prunes.isEmpty) None
    // prepend: conjuncts evaluate left-to-right, and the prune is the
    // cheap one that should short-circuit the O(n+m) intersection
    else Some(prunes.foldRight(cond)(And(_, _)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // user-provided batches run AFTER the main optimizer, so by now
    // pushdown has usually moved the predicate into the Join condition —
    // match both homes
    case f @ Filter(cond, child) =>
      injectInto(cond).map(Filter(_, child)).getOrElse(f)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join if j.condition.isDefined =>
      injectInto(j.condition.get).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  /** Imperative registration for sessions built without GraftExtensions
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(JaccardLengthPrune))
      spark.experimental.extraOptimizations = cur :+ JaccardLengthPrune
  }
}
