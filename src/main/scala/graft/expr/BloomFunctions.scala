package graft.expr

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration of Spark's bloom-filter expression pair —
  * `BloomFilterAggregate` (build a sketch over the creation side's join
  * keys) and `BloomFilterMightContain` (probe it on the application side).
  *
  * These are the exact expressions Spark's own `InjectRuntimeFilter` rule
  * plants when it decides a shuffle join deserves a row-level runtime
  * filter; they are not in the public function registry, so the engine
  * registers them per-session (the [[VectorExpressions.register]] pattern)
  * for the MANUAL formulation: at 100 TB the decision "this dimension
  * filter is selective enough that pruning the fact-side shuffle pays for
  * a bloom build" is a pipeline-design choice, not something to leave to
  * optimizer-threshold luck — x26 writes it explicitly, and the sketch has
  * no false negatives, so an exact semi join downstream keeps the result
  * deterministic while the shuffle only carries surviving rows.
  *
  * Both functions take the key PRE-HASHED with `xxhash64(key)` (the same
  * contract InjectRuntimeFilter uses): the sketch stores 64-bit hashes, so
  * build and probe must agree on the hash family by construction.
  */
object BloomFunctions {

  private def need(name: String, expected: String, exprs: Seq[Expression]): Nothing =
    throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name, "expectedNum" -> expected,
        "actualNum" -> exprs.length.toString, "docroot" -> ""))

  /** Register `graft_bloom_agg(xxhash64(k)[, estItems[, numBits]])` and
    * `graft_might_contain(bf, xxhash64(k))` (idempotent). The analyzer
    * wraps the returned AggregateFunction in its AggregateExpression. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, est) => new BloomFilterAggregate(child, est)
        case Seq(child, est, bits) => new BloomFilterAggregate(child, est, bits)
        case _ => need("graft_bloom_agg", "1, 2 or 3", exprs)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bf, value) => BloomFilterMightContain(bf, value)
        case _ => need("graft_might_contain", "2", exprs)
      }, "built-in")
  }
}
