package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued function (Catalyst `Generator`): whitespace
  * tokenization of a string column into (pos, tok) rows — the UDTF tier of
  * the §2D UDF/UDAF/Generator row, complementing the scalar Expressions and
  * the typed Aggregator.
  *
  * Semantics are EXACTLY `Text.tokens` (lower, trim, split on the pinned
  * `[ \t\n\r\f]+` class, drop empties) so the DuckDB oracle mirror is the
  * shared one. One input row
  * expands to 0..n output rows inside the scan stage (`GenerateExec` is
  * pipelined — no shuffle, same scale shape as posexplode).
  */
case class TokenizeGenerator(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokens requires a string argument, got ${child.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("tok", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      // NOT String.trim/toLowerCase: Java trim strips every char <= 0x20
      // (incl. control chars SQL trim keeps), and default-locale lowercase
      // breaks under tr-TR ('I' -> dotless ı). split+filter makes trim
      // redundant; Locale.ROOT matches SQL lower for this corpus. The split
      // class is the EXPLICIT [ \t\n\r\f] (not \s): Java's \s matches \x0B
      // where the oracle's RE2 \s does not — same pin as Text.tokens.
      val toks = raw.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT).split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
      toks.iterator.zipWithIndex.map { case (t, i) =>
        val row = new GenericInternalRow(2)
        row.update(0, i)
        row.update(1, UTF8String.fromString(t))
        row
      }
    }
  }

  override def prettyName: String = "graft_tokens"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Generators {
  /** Register `graft_tokens` (idempotent); usable via LATERAL VIEW in SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokens", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"graft_tokens expects 1 argument, got ${exprs.length}")
        TokenizeGenerator(exprs.head)
      }, "built-in")
}
