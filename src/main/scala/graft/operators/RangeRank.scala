package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Exact GLOBAL rank / running total as a reusable two-pass operator — the
  * scale-safe replacement for `Window.orderBy(...)` with no partition clause
  * (which funnels all N rows through one task, the plan that dies first at
  * 100x).
  * Generalized from t9's decile binning so future exact-rank needs
  * (percentile tables, curriculum ordering, exact top-p sampling cutoffs)
  * reuse one audited implementation instead of re-deriving the pattern.
  *
  *   pass 1: `repartitionByRange` + `sortWithinPartitions` on the rank
  *           order — a DISTRIBUTED sort (range partition i's keys all
  *           precede partition i+1's; every partition sorts in parallel) —
  *           then one row-count per partition. The driver sees only those
  *           P counts (control flow, the dd8 pattern) and scans them into
  *           per-partition rank offsets.
  *   pass 2: each partition assigns global rank = offset + local position
  *           map-side via a running counter — genuine imperative
  *           per-partition logic, the one place `mapPartitionsWithIndex`
  *           is the right tool.
  *
  * The sorted frame is persisted so pass 2 reuses pass 1's sort; callers
  * MUST call [[Ranked.release]] once the downstream result is materialized
  * (the Dedup.scala persist/release lifecycle — nothing is left for a
  * harness-level clearCache to find). */
object RangeRank {

  /** Handle returned by [[withGlobalRank]]: `df` carries the input schema
    * plus the 0-based rank column; `total` is the global row count (free —
    * the last pass-1 offset); `sortedFrame` is the pinned pass-1 sort,
    * exposed so plan/partitioning specs can audit the distributed-sort
    * claim directly. */
  final case class Ranked(df: DataFrame, total: Long, sortedFrame: DataFrame) {
    def release(): Unit = { sortedFrame.unpersist(): Unit }
  }

  /** Rank every row of `df` in the total order given by `sortCols`
    * (callers include a unique tiebreaker for determinism), appending the
    * 0-based rank as `rankCol`. */
  def withGlobalRank(df: DataFrame, rankCol: String, sortCols: Column*): Ranked =
    scan(df, rankCol, sortCols)(_ => 1L)

  /** Exclusive global prefix sum of the non-null LongType column `valueCol`
    * over the total order given by `sortCols`, appended as `cumCol` (the sum
    * of all PRECEDING rows' values; `base` for the global first row).
    * `Ranked.total` is `base` + the grand total — the last offset, free.
    *
    * `base` is the INCREMENTAL entry point: a stored fill level (e.g. the
    * token total behind an already-packed corpus) lets a new batch continue
    * the running total without rescanning history — the scan then costs
    * O(batch), not O(corpus) (p7's contract).
    *
    * This is the scale-safe replacement for
    * `sum(v).over(Window.orderBy(...))` (an unpartitioned running-sum
    * window is the same single-task funnel as an unpartitioned rank):
    * the identical two-pass structure as [[withGlobalRank]], with
    * per-partition VALUE SUMS instead of row counts flowing to the driver. */
  def withRunningTotal(df: DataFrame, valueCol: String, cumCol: String,
      base: Long, sortCols: Column*): Ranked = {
    // type guard, same philosophy as the null guard below: a non-Long
    // valueCol (size() returns Int) otherwise dies inside the shuffle
    // stage as an opaque executor ClassCastException naming no column
    require(df.schema(valueCol).dataType == LongType,
      s"RangeRank.withRunningTotal: column '$valueCol' is " +
        s"${df.schema(valueCol).dataType}, not LongType — cast it first")
    val idx = df.schema.fieldIndex(valueCol)
    // fail loudly on a NULL value (e.g. size(tokens) of a NULL text) —
    // a bare getLong would surface as an opaque executor NPE instead
    scan(df, cumCol, sortCols, base) { row =>
      require(!row.isNullAt(idx),
        s"RangeRank.withRunningTotal: column '$valueCol' is NULL for row $row; " +
          "coalesce or filter nulls before the scan")
      row.getLong(idx)
    }
  }

  def withRunningTotal(df: DataFrame, valueCol: String, cumCol: String,
      sortCols: Column*): Ranked =
    withRunningTotal(df, valueCol, cumCol, 0L, sortCols: _*)

  /** Shared two-pass scan: range-partition + sort, per-partition totals of
    * `weight` to the driver (P longs — control flow, the dd8 pattern),
    * scanLeft into offsets, then a map-side running accumulation appending
    * the EXCLUSIVE prefix as `outCol`. weight = 1 gives rank; weight =
    * row value gives a running total. */
  private def scan(df: DataFrame, outCol: String, sortCols: Seq[Column],
      base: Long = 0L)(weight: Row => Long): Ranked = {
    val spark = df.sparkSession
    val parts = math.max(graft.Engine.shufflePartitions(spark), 2)
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist()
    val totals = sorted.rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.map(weight).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(base)(_ + _)
    val scanned = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row => val out = Row.fromSeq(row.toSeq :+ acc); acc += weight(row); out }
    }
    // a duplicate name would only surface downstream as an
    // AMBIGUOUS_REFERENCE naming no culprit — fail here instead
    require(!sorted.columns.contains(outCol),
      s"RangeRank: input already has a column named '$outCol'")
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    Ranked(spark.createDataFrame(scanned, schema), offsets.last, sorted)
  }
}
