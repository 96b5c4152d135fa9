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
object JaccardLengthPrune extends Rule[LogicalPlan] with PredicateHelper {

  /** `size(x)` with casts stripped, else None. */
  private def stripSize(e: Expression): Option[Expression] = e match {
    case Size(child, _) => Some(child)
    case Cast(inner, _, _, _) => stripSize(inner)
    case _ => None
  }

  /** Attribute → defining expression, from every Project below the
    * predicate's plan node — what lets the matcher see through
    * `withColumn("n", size(bg))`-style aliases. */
  private def aliasMap(plan: LogicalPlan): AttributeMap[Expression] =
    AttributeMap(plan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.collect { case a @ Alias(child, _) =>
          a.toAttribute -> child }
    }.flatten)

  /** Follow attribute→alias chains to the defining expression (bounded —
    * alias chains are shallow; a cycle cannot occur in a valid plan). */
  private def resolveAlias(e: Expression, m: AttributeMap[Expression],
      depth: Int = 0): Expression = e match {
    case a: Attribute if depth < 8 =>
      m.get(a).map(resolveAlias(_, m, depth + 1)).getOrElse(a)
    case other => other
  }

  /** na/nb are verifiably the CARDINALITIES of sic's argument arrays
    * (`size(a)`/`size(b)`, either order, possibly through column
    * aliases). This is what makes the prune an IMPLICATION:
    * `sic ≤ min(na,nb)` and `union ≥ max(na,nb)` hold only when na/nb
    * count exactly the intersected arrays — a syntactically similar
    * ratio over unrelated counts must NOT be pruned (r14 review: the
    * unverified match silently dropped qualifying rows for such
    * queries). Counts the matcher cannot trace to a size() stay
    * unmatched — such queries keep their semantics and simply miss the
    * optimization, the safe direction. */
  private def cardinalitiesOf(na: Expression, nb: Expression,
      a: Expression, b: Expression, m: AttributeMap[Expression]): Boolean = {
    def sizeArg(e: Expression): Option[Expression] =
      stripSize(resolveAlias(e, m)).map(resolveAlias(_, m))
    val (ra, rb) = (resolveAlias(a, m), resolveAlias(b, m))
    (sizeArg(na), sizeArg(nb)) match {
      case (Some(x), Some(y)) =>
        (x.semanticEquals(ra) && y.semanticEquals(rb)) ||
          (x.semanticEquals(rb) && y.semanticEquals(ra))
      case _ => false
    }
  }

  /** Match `cast(sic)/cast((na+nb)-sic') >= Literal(t)` with sic ≡ sic'
    * and na/nb the sizes of sic's arguments. */
  private def matchJaccard(e: Expression,
      m: AttributeMap[Expression]): Option[(Expression, Expression, Double)] =
    e match {
      case GreaterThanOrEqual(
          Divide(
            Cast(sic @ SortedLongIntersectCount(la, lb), DoubleType, _, _),
            Cast(Subtract(Add(na, nb, _), sic2, _), DoubleType, _, _), _),
          Literal(t: Double, DoubleType))
        if sic.semanticEquals(sic2) && cardinalitiesOf(na, nb, la, lb, m) =>
        Some((na, nb, t))
      case _ => None
    }

  private def lengthPrune(na: Expression, nb: Expression, t: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(na, nb)), DoubleType),
      Multiply(Literal(t - 1e-9), Cast(Greatest(Seq(na, nb)), DoubleType)))

  /** Add missing prune conjuncts to a predicate; None when nothing to do. */
  private def injectInto(cond: Expression,
      scope: LogicalPlan): Option[Expression] = {
    // cheap precheck before the subtree-wide alias collection: this rule
    // runs session-wide to fixed point over every Filter/Join of every
    // plan, and almost none contain the intersect expression — without
    // the gate each visit walks the whole subtree to build an alias map
    // it never uses (O(|nodes|·|filters+joins|) per pass, r15 review)
    if (!cond.exists(_.isInstanceOf[SortedLongIntersectCount])) return None
    val m = aliasMap(scope)
    val conjuncts = splitConjunctivePredicates(cond)
    val prunes = conjuncts.flatMap(matchJaccard(_, m)).flatMap { case (na, nb, t) =>
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
      injectInto(cond, child).map(Filter(_, child)).getOrElse(f)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join if j.condition.isDefined =>
      injectInto(j.condition.get, j)
        .map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  /** Imperative registration for sessions built without GraftExtensions
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(JaccardLengthPrune))
      spark.experimental.extraOptimizations = cur :+ JaccardLengthPrune
  }
}
