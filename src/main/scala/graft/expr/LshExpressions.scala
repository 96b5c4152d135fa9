package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** The engine's fixed random-hyperplane family for sign-LSH (SimHash over
  * real vectors), shared by the sim3 registered query, the
  * [[graft.plans.LshBucketRewrite]] optimizer rule, and the DuckDB oracle
  * builders.
  *
  * Deterministic by construction: plane j, component i is a fixed integer
  * LCG-style mix embedded as LITERALS wherever a signature is computed, so
  * the Spark plan and the oracle SQL agree bit-for-bit with no cross-engine
  * hash parity requirement. 6 planes ≈ 64 buckets: the signature is the
  * shuffle key and expected bucket size is N/64 — candidate generation is
  * an equi-join whose per-bucket fan-in shrinks as planes are added.
  */
object RandomHyperplanes {
  val NumPlanes = 6
  val Dim = 64
  def planeVal(j: Int, i: Int): Long =
    ((j * Dim + i + 1).toLong * 2654435761L % 2147483647L) % 2001L - 1000L
  val Planes: Seq[Array[Double]] =
    (0 until NumPlanes).map(j => Array.tabulate(Dim)(i => planeVal(j, i).toDouble))

  /** Banded family for MULTI-band sign-LSH (sim12): [[NumBands]] bands of
    * [[BandBits]] planes each, drawn from the same deterministic generator
    * with the global plane index running on past the single-probe family —
    * so band 0 IS the sim3/sim4 signature (planes 0-5) and sim12's
    * candidate set is a SUPERSET of sim3's by construction, while bands 1
    * and 2 are fresh independent projections. A vector pair is a candidate
    * if ANY band signature matches (the dd3 MinHash banding pattern applied
    * to sign-LSH): per-band collision keeps sim3's N/64 selectivity, and
    * the OR over 3 bands triples recall at ≤3x the candidates. */
  val NumBands = 3
  val BandBits = 6
  /** All banded planes, global index j in [0, NumBands*BandBits); band(j) =
    * j / BandBits, bit(j) = j % BandBits. */
  val BandedPlanes: Seq[Array[Double]] =
    (0 until NumBands * BandBits).map(j => Array.tabulate(Dim)(i => planeVal(j, i).toDouble))
}

/** Opt-in LSH candidate-generation MARKER: `lsh_candidates(a, b)` in a join
  * condition declares "restrict this pair space to approximate-neighbor
  * candidates".
  *
  * Semantics are deliberately two-level:
  *   - UNOPTIMIZED (no [[graft.plans.LshBucketRewrite]] in the session):
  *     the expression evaluates to literal `true` — the query is the EXACT
  *     all-pairs computation, just slower. Correctness never depends on the
  *     rewrite firing.
  *   - With the rule registered, the marker conjunct is REPLACED by an
  *     equality of injected sign-LSH signature columns
  *     ([[RandomHyperplanes]]), turning the cross/theta join into a plain
  *     equi-join on the bucket — the candidate set the user opted into.
  *
  * This is the approximation-by-explicit-opt-in contract: a rewrite that
  * silently bucketed every cosine-threshold query would change exact
  * results (recall < 1), so the trigger is a marker the user writes, not a
  * pattern the optimizer guesses at. Modeled as a non-foldable expression
  * so constant folding cannot erase it before the rule sees it.
  */
case class LshCandidates(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_candidates requires two array<double> args, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  // never constant-folded away, even under foldable children: the marker
  // must survive until the optimizer rule looks for it
  override def foldable: Boolean = false
  override def prettyName: String = "lsh_candidates"

  // exact-superset fallback: every pair is a candidate
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ExprCode.forNonNullValue(org.apache.spark.sql.catalyst.expressions.codegen
      .JavaCode.literal("true", BooleanType))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
