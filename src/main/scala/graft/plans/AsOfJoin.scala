package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN as a first-class operator — logical node, planner strategy and
  * physical sort-merge execution (the (c)-tier custom-operator path of
  * SURVEY.md §7.4; the reference has no relational operators at all, and
  * vanilla Spark SQL has no as-of join).
  *
  * Semantics: for every left row, attach the LAST right row of the same key
  * group whose time is <= the left row's time (ties broken by the right
  * tiebreak expression's order); null-extended when no such row exists.
  *
  * Scale design: both sides hash-cluster on the key (`ClusteredDistribution`
  * — EnsureRequirements inserts co-aligned exchanges) and sort within
  * partitions by (key, time[, tiebreak]). The merge walks each partition
  * pair ONCE with O(1) state (one buffered right row) — the same cost shape
  * as a sort-merge join, no window materialization of the right side, no
  * per-key state accumulation. At 100 TB that is two shuffles + linear
  * merge, and AQE still handles skewed keys upstream.
  *
  * v1 restrictions (enforced in AsOfJoin.join): key and tiebreak columns
  * must be long-typed, time columns timestamp- or long-typed. Null
  * semantics follow SQL joins: a null key/time on the left null-extends;
  * null-keyed right rows match nothing.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftTime: Expression, rightTime: Expression,
    leftKey: Expression, rightKey: Expression,
    rightTieBreak: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lt, rt, lk, rk, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lt, rt, lk, rk, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftTime: Expression, rightTime: Expression,
    leftKey: Expression, rightKey: Expression,
    rightTieBreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  // ADVERTISE what the merge preserves: output rows are the left child's
  // rows in order (right columns attached), so the left side's
  // hash-clustering and (key, time) sort survive. Without these
  // overrides the node reported UnknownPartitioning/unordered and every
  // downstream per-key operator (the asofCustom groupBy/window pattern)
  // paid a SECOND full shuffle+sort on the key this operator just
  // clustered and sorted by — the r15 review's redundant-Exchange
  // finding; SortMergeJoinExec's left-outer contract, mirrored.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rWidth = right.output.length
    val outSchema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outSchema, outSchema)
      // SQL null semantics: right rows with null key/time can never match —
      // drop them up front (they sort first under Ascending anyway)
      val rBuf = rIter.filter(r =>
        rKeyB.eval(r) != null && rTimeB.eval(r) != null).buffered
      // one-row carry state: last right row still satisfying rts <= lts for
      // the current key; rows arrive key-sorted so state resets per key
      var carry: InternalRow = null
      var carryKey = 0L
      lIter.map { l =>
        val lkRaw = lKeyB.eval(l)
        val ltRaw = lTimeB.eval(l)
        if (lkRaw == null || ltRaw == null) {
          // null key/time matches nothing: null-extend, keep carry state
          project(joined(l, nullRight))
        } else {
          val lk = lkRaw.asInstanceOf[Long]
          val lt = ltRaw.asInstanceOf[Long]
          if (carry != null && carryKey != lk) carry = null
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head).asInstanceOf[Long]
            if (rk < lk) { rBuf.next() } // behind: discard
            else if (rk == lk && rTimeB.eval(rBuf.head).asInstanceOf[Long] <= lt) {
              carry = rBuf.next().copy() // iterator rows are reused — copy
              carryKey = rk
            } else advance = false
          }
          val r = if (carry != null && carryKey == lk) carry else nullRight
          project(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoin {
  /** Install the planner strategy (idempotent per session). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** left AS-OF right: latest right row per key with rightTime <= leftTime.
    * Column names must be unambiguous across the two sides. */
  def join(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      leftKey: String, rightKey: String,
      rightTieBreak: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    // Joining a frame with itself (or an unaliased derivative) would put the
    // same exprIds on both sides of the BinaryNode, making output-attribute
    // resolution ambiguous — re-alias the right side with fresh exprIds when
    // any overlap exists (the analyzed-plan analogue of Dataset.join's
    // self-join dedup).
    val rPlan0 = right.queryExecution.analyzed
    val leftIds = lPlan.output.map(_.exprId).toSet
    val rPlan: LogicalPlan =
      if (rPlan0.output.exists(a => leftIds.contains(a.exprId)))
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlan0.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          rPlan0)
      else rPlan0
    def attr(p: LogicalPlan, name: String): Attribute = {
      val matches = p.output.filter(_.name == name)
      // a WITHIN-side duplicate (e.g. a prior join that kept both sides'
      // ts) must throw, not silently bind the first occurrence — the
      // as-of join would otherwise run on the wrong time column
      require(matches.length <= 1,
        s"column '$name' is ambiguous on this side (${matches.length} " +
          "occurrences) — disambiguate with a select/alias first")
      matches.headOption.getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found in [${p.output.map(_.name).mkString(", ")}]"))
    }
    def requireType(a: Attribute, ok: org.apache.spark.sql.types.DataType => Boolean,
        what: String, accepted: String): Attribute = {
      require(ok(a.dataType),
        s"as-of $what column '${a.name}' must be $accepted, got ${a.dataType}")
      a
    }
    import org.apache.spark.sql.types.{LongType, TimestampType}
    def keyOk(t: org.apache.spark.sql.types.DataType) = t == LongType
    def timeOk(t: org.apache.spark.sql.types.DataType) = t == LongType || t == TimestampType
    val lt = requireType(attr(lPlan, leftTime), timeOk, "time", "long- or timestamp-typed")
    val rt = requireType(attr(rPlan, rightTime), timeOk, "time", "long- or timestamp-typed")
    // both sides must share one time representation: TimestampType holds
    // microseconds internally while a raw long may be any unit (this repo
    // has ns-long and µs-timestamp forms of the same column) — comparing
    // across representations silently mismatches everything
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share a type, got ${lt.dataType} vs ${rt.dataType}")
    val plan = AsOfJoinPlan(lPlan, rPlan,
      lt, rt,
      requireType(attr(lPlan, leftKey), keyOk, "key", "long-typed"),
      requireType(attr(rPlan, rightKey), keyOk, "key", "long-typed"),
      requireType(attr(rPlan, rightTieBreak), keyOk, "tiebreak", "long-typed"))
    GraftSqlBridge.ofRows(spark, plan)
  }
}
