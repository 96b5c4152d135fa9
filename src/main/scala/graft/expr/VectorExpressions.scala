package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd sequential dot product of two double arrays.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)` — a
  * strict left-to-right fold, so results stay bit-identical to the DuckDB
  * oracle's ordered list fold — but evaluated as a single fused loop inside
  * whole-stage codegen instead of three interpreted higher-order functions
  * allocating an intermediate array per row. This is the (b)-tier custom
  * operator path from SURVEY.md §7.4: a native `Expression` where the
  * built-in combinators can't hit codegen.
  *
  * Null handling matches the fold it replaces exactly: NULL if either array
  * is null, if the lengths differ (zip_with null-pads the shorter side), or
  * if any element is null (null propagates through the sum).
  */
case class DoubleVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fold-equivalent semantics: length mismatch or any null element → NULL
    // (zip_with null-pads the shorter side; null * x propagates to the sum)
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Register `vec_dot` in the session's function registry (idempotent);
    * callers then use `expr("vec_dot(a, b)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DoubleVectorDot(exprs(0), exprs(1)), "built-in")
}
