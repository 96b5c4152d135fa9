package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.expr.{DoubleVectorDot, LshCandidates, RandomHyperplanes}

/** Optimizer rule lowering the [[graft.expr.LshCandidates]] marker into a
  * sign-LSH bucket equi-join — SURVEY.md §4's "custom code we may actually
  * write" candidate (a): rewrite similarity-search pair generation to an
  * LSH join.
  *
  * Input shape (what the user writes):
  *
  * {{{ corpus.join(probes, lsh_candidates(e, qe) && <any other predicates>) }}}
  *
  * i.e. a join whose condition has no useful equi-key — as written, the
  * planner's only option is a nested-loop/cartesian evaluation of the full
  * pair space: O(N·M) at any scale. The rule rewrites the Join to
  *
  * {{{
  *   Project(original output,
  *     Join(Project(left  + sig(e)  AS _lsh_sig_l),
  *          Project(right + sig(qe) AS _lsh_sig_r),
  *          cond[marker := _lsh_sig_l = _lsh_sig_r]))
  * }}}
  *
  * where `sig(v)` is the 6-bit sign signature over the fixed
  * [[RandomHyperplanes]] (embedded as literals, evaluated by the codegen'd
  * [[DoubleVectorDot]]). The injected equality gives `ExtractEquiJoinKeys`
  * a real key, so physical planning produces a shuffle/broadcast HASH join
  * on the bucket: the signature is the shuffle key, the pair space shrinks
  * to same-bucket candidates (expected N·M/2^planes), and every remaining
  * predicate evaluates only on those. This is exactly the hand-written
  * sim3 plan, derived automatically from the declarative marker.
  *
  * Approximation is OPT-IN by the marker's contract (see
  * [[LshCandidates]]): without this rule the marker is literal `true` and
  * the query is exact; with it, recall follows the LSH collision curve.
  * The rule itself is result-stable for the pairs it keeps: it only
  * restricts the candidate set, never alters other predicates or output
  * columns.
  *
  * Idempotent (user-provided optimizer batches run to fixed point): each
  * application consumes its marker conjunct; a plan without markers is
  * untouched.
  */
object LshBucketRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** 6-bit sign signature of a vector expression, planes as literals —
    * bit-identical to the sim3 query's column-level formulation. */
  private def sigExpr(v: Expression): Expression =
    RandomHyperplanes.Planes.zipWithIndex.map { case (p, j) =>
      If(GreaterThanOrEqual(
           DoubleVectorDot(v, Literal.create(p.toSeq, ArrayType(DoubleType))),
           Literal(0.0)),
         Literal(1L << j), Literal(0L))
    }.reduce[Expression](Add(_, _))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if cond.exists(_.isInstanceOf[LshCandidates]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // one marker per application; fixed-point iteration consumes the rest
      conjuncts.collectFirst {
        case m @ LshCandidates(a, b)
            // sides must split cleanly across the join for an equi-key to
            // exist; a marker over same-side vectors is left as-is (it
            // evaluates true — the exact fallback)
            if (a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet)) ||
               (b.references.subsetOf(left.outputSet) &&
                a.references.subsetOf(right.outputSet)) =>
          // side assignment must agree with the guard for ARG PAIRS where
          // one side is reference-free (a literal query vector): an empty
          // reference set is a subset of EITHER side, so deciding by
          // a-is-left alone could project the column-bearing arg's
          // signature onto the wrong child (unresolvable at binding —
          // r15 review). Require the full (a-left, b-right) split; any
          // other guard-passing combination is (b, a).
          val (lv, rv) =
            if (a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet)) (a, b)
            else (b, a)
          val sigL = Alias(sigExpr(lv), "_lsh_sig_l")()
          val sigR = Alias(sigExpr(rv), "_lsh_sig_r")()
          val newCond = conjuncts.map {
            case c if c eq m => EqualTo(sigL.toAttribute, sigR.toAttribute)
            case c => c
          }.reduce(And(_, _))
          Project(j.output.toSeq,
            Join(Project(left.output :+ sigL, left),
              Project(right.output :+ sigR, right),
              j.joinType, Some(newCond), hint))
      }.getOrElse(j)
  }

  /** Imperative registration for sessions built without GraftExtensions
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(LshBucketRewrite))
      spark.experimental.extraOptimizations = cur :+ LshBucketRewrite
  }
}
