package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Morton (Z-order) interleave of two 16-bit coordinates.
  *
  * Input: two BIGINT coordinates already scaled into [0, 65535] (the
  * caller owns the min-max scaling — it is data-dependent and belongs in
  * the query, not the kernel). Output: the 32-bit Morton code as BIGINT —
  * bit i of `left` lands at output bit 2i, bit i of `right` at 2i+1, so
  * sorting by the code yields the Z-space-filling curve over the
  * (left, right) plane: points close in BOTH dimensions are close in the
  * sort order, which is what makes per-file min/max stats selective on
  * EITHER dimension after a range-partitioned write (x31).
  *
  * The spread uses the branch-free mask-shift cascade (each step doubles
  * the gap between occupied bits) rather than a 16-iteration loop — five
  * straight-line ops per side inside whole-stage codegen. Coordinates
  * outside [0, 65535] are masked to their low 16 bits rather than raising:
  * the kernel is total, and the caller's scaling already guarantees the
  * range (a mask is free; a range check would put a branch in the hot
  * loop).
  *
  * This is the (b)-tier custom-operator path (SURVEY.md §7.4): the same
  * value is expressible as a 16-term shiftleft/bitwise-or chain of
  * built-ins, but that plans as a 60-node expression tree evaluated per
  * row; here it is one fused kernel.
  */
case class ZOrderInterleave(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_interleave requires two bigint args, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_interleave"

  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx"); val y = ctx.freshName("zy")
      def cascade(v: String): String =
        s"""$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = $a & 0xFFFFL;
         |${cascade(x)}
         |long $y = $b & 0xFFFFL;
         |${cascade(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
