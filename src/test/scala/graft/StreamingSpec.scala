package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window with watermark drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_test").start()
    // batch 1: events at 10:01 and 10:03, then watermark pushed to 10:50
    input.addData((ts("2024-01-01 10:01:00"), 1.0), (ts("2024-01-01 10:03:00"), 2.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 11:00:00"), 3.0)) // advances watermark to 10:50
    q.processAllAvailable()
    // batch 3: a LATE event at 10:02 — before the 10:50 watermark — must be dropped
    input.addData((ts("2024-01-01 10:02:00"), 9.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 12:00:00"), 4.0)) // close the 11:00 window too
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_test")
      .select(col("window.start").cast("string").as("w"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 10:00 window emitted with 2 events; the late 10:02 never re-emitted
    assert(out("2024-01-01 10:00:00") == 2L)
    assert(out.get("2024-01-01 11:00:00").contains(1L))
  }

  test("registered streaming queries produce consistent totals") {
    val s4 = graft.streaming.StreamingOps.statefulTotals(spark, sf).collect()
    val batch = Catalog.eventsNorm(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(s4.nonEmpty)
    s4.foreach { r =>
      assert(r.getAs[Long]("n_events") == batch(r.getAs[Long]("user_id")))
    }
  }

  test("watermark-keyed streaming dedup drops late duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("user_id", "hour_bucket")
      .withWatermark("hour_bucket", "1 hour")
      .dropDuplicates("user_id", "hour_bucket")
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_test").start()
    input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    input.addData((2L, ts("2024-01-01 15:00:00"))) // watermark → 14:00
    q.processAllAvailable()
    // duplicate key from 10:00 arrives late (< 14:00 watermark): dropped,
    // not re-emitted even though its dedup state was evicted
    input.addData((1L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_test").collect()
    assert(rows.length == 2) // (1, 10:00) once + (2, 15:00)
  }

  test("session window gap boundary: exactly-gap split, just-under merge") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:29:59")), // merges (< 30 min)
      (1L, ts("2024-01-01 10:59:59")), // merges with previous (< 30 min)
      (1L, ts("2024-01-01 11:29:59")), // merges
      (2L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:30:00")), // exactly 30 min → MERGES (Spark: split only when diff > gap)
      (3L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-01 10:30:01"))) // 30 min 1 s → new session
      .toDF("user_id", "ts")
    val sessions = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sessions.count(_._1 == 1L) == 1) // one merged session of 4
    assert(sessions.filter(_._1 == 1L).head._2 == 4L)
    assert(sessions.count(_._1 == 2L) == 1) // exactly-gap pair merges
    assert(sessions.count(_._1 == 3L) == 2) // gap exceeded → two sessions
  }
}
