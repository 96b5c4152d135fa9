package graft

import graft.operators.Extended
import graft.plans.AsOfJoin
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("custom as-of operator ≡ window composition on real data") {
    val custom = Extended.asofCustom(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("asof_value"))).toMap
    val windowed = Extended.asofJoin(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("last_purchase_value"))).toMap
    assert(custom.keySet == windowed.keySet)
    custom.foreach { case (id, v) => assert(v == windowed(id), s"event $id") }
  }

  test("as-of with empty right side null-extends every row") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, Timestamp, Double, Long)]
      .toDF("p_user", "p_ts", "p_value", "p_eid")
    val out = AsOfJoin.join(left, right, "ts", "p_ts", "user_id", "p_user", "p_eid").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("p_value")))
  }

  test("as-of picks latest ≤, not just any match") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 7L, ts("2024-01-01 12:00:00")),
      (2L, 7L, ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 08:00:00"), 1.0, 100L),
      (7L, ts("2024-01-01 11:00:00"), 2.0, 101L),
      (7L, ts("2024-01-01 13:00:00"), 3.0, 102L)).toDF("p_user", "p_ts", "p_value", "p_eid")
    val out = AsOfJoin.join(left, right, "ts", "p_ts", "user_id", "p_user", "p_eid")
      .select(col("event_id"), col("p_value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 2.0) // 11:00 is latest ≤ 12:00; 13:00 excluded
    assert(out(2L) == 1.0) // only 08:00 ≤ 09:00
  }

  test("null left key/time null-extends; null right keys never match") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, Some(7L), Some(ts("2024-01-01 12:00:00"))),
      (2L, None, Some(ts("2024-01-01 12:00:00"))),       // null key
      (3L, Some(7L), Option.empty[Timestamp]))           // null time
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(7L), ts("2024-01-01 08:00:00"), 1.0, 100L),
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 9.0, 101L)) // null key: unmatchable
      .toDF("p_user", "p_ts", "p_value", "p_eid")
    val out = AsOfJoin.join(left, right, "ts", "p_ts", "user_id", "p_user", "p_eid")
      .select(col("event_id"), col("p_value")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
  }

  test("downstream per-key aggregation reuses the as-of join's " +
      "clustering: no second Exchange on the key") {
    // AsOfJoinExec advertises left.outputPartitioning/outputOrdering
    // (r15: without the overrides it reported UnknownPartitioning and a
    // groupBy on the very key the merge just clustered by paid a second
    // full shuffle — the redundant-Exchange class at 100 TB)
    def ts(s: String) = Timestamp.valueOf(s)
    val left = (1L to 40L).map(i =>
        (i, i % 4, ts(s"2024-01-01 10:00:${10 + i % 40}")))
      .toDF("event_id", "user_id", "ts")
    val right = (1L to 12L).map(i =>
        (i % 4, ts(s"2024-01-01 10:00:${5 + i}"), i * 1.5, i))
      .toDF("p_user", "p_ts", "p_value", "p_eid")
    val agg = AsOfJoin.join(left, right, "ts", "p_ts", "user_id", "p_user",
        "p_eid")
      .groupBy("user_id").agg(sum("p_value").as("total"))
    agg.collect() // force the AQE-final plan (r12 gotcha)
    // AQE's toString prints the Final AND Initial plans — count
    // exchanges in the final section only
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // exactly the two exchanges the as-of's children need — none between
    // the as-of node and the aggregate
    assert(exchanges <= 2,
      s"downstream groupBy re-shuffled the as-of output:\n$plan")
  }

  test("non-long key type fails fast at construction") {
    val left = Seq(("k", 1L)).toDF("key", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.join(left, left, "ts", "ts", "key", "key", "ts")
    }
    assert(e.getMessage.contains("must be"))
  }

  test("unknown column name raises a clear error") {
    val left = Seq((1L, 1L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.join(left, left, "nope", "a", "b", "a", "b")
    }
    assert(e.getMessage.contains("nope"))
  }
}
