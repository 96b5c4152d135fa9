package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers shared by every registered query.
  *
  * The driver verifies each query by hash-comparing Spark's result against
  * DuckDB running the `oracleSql` text. Floating-point SUM is
  * order-dependent, and Spark's aggregation order differs run-to-run (and
  * from DuckDB's), so every money/measure aggregate goes through an exact
  * decimal: cast input to DECIMAL(12,2) (inputs are 2-decimal doubles),
  * aggregate exactly, cast the final result back to DOUBLE. The double
  * conversion is deterministic, so both engines produce bit-identical
  * float64 columns. Computed integers are widened to BIGINT on both sides
  * (DuckDB SUM(int) yields INT128, Spark row_number yields INT32 — either
  * would break the hash compare).
  */
object Sql {
  /** Exact money type: TPC-H prices < 1e10 with 2 decimals. */
  val Money: DecimalType = DecimalType(12, 2)

  def dec(c: Column): Column = c.cast(Money)

  /** Order-independent exact SUM of a 2-decimal double, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact revenue term: price * (1 - discount), in decimal. */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(Money) - dec(discount))

  /** SQL twin of [[revenue]] — the oracle-side spelling of the engine's
    * core determinism invariant. ONE definition: every oracle that sums
    * revenue interpolates this (or [[SumRevSql]]), so a precision change
    * edits one line instead of N hand-copied string literals. */
  val RevSql: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  /** SQL twin of [[dsumRevenue]]: exact-decimal revenue sum, cast DOUBLE. */
  val SumRevSql: String = s"CAST(SUM($RevSql) AS DOUBLE)"

  def dsumRevenue(price: Column, discount: Column): Column =
    sum(revenue(price, discount)).cast(DoubleType)

  /** Deterministic AVG = exact decimal sum (as double) / count. */
  def davg(c: Column): Column = (sum(dec(c)).cast(DoubleType) / count(c)).cast(DoubleType)

  def ts(s: String): Column = lit(s).cast(TimestampType)

  def asLong(c: Column): Column = c.cast(LongType)
}
