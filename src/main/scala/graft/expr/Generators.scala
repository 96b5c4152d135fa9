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
      // Lowercase via Spark's OWN UTF8String.toLowerCase — bit-identical
      // to SQL lower() in EVERY locale (ASCII fast path; any slow-path
      // locale behavior is then exactly what Text.tokens' lower() does
      // too, instead of diverging under tr-TR where Locale.ROOT and the
      // default locale disagree on 'I'). NOT String.trim: Java trim
      // strips every char <= 0x20 (incl. control chars SQL trim keeps) —
      // split+filter makes trim redundant. The split class is the
      // EXPLICIT [ \t\n\r\f] (not \s): Java's \s matches \x0B where
      // the oracle's RE2 \s does not — same pin as Text.tokens.
      val toks = raw.asInstanceOf[UTF8String].toLowerCase.toString
        .split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
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
      "graft_tokens",
      graft.expr.VectorExpressions.unaryBuilder("graft_tokens",
        TokenizeGenerator), "built-in")
}
