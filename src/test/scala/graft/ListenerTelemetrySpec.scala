package graft

import org.apache.spark.sql.functions._

/** The per-query task-metrics listener behind bench.json's
  * shuffle_read/shuffle_write/spill maps ([[BenchTaskMetricsListener]] —
  * the Spark-native analogue of the reference's listener bus for
  * block/shuffle events, `scheduler/ScacheListener.scala:24-106`). Two
  * contracts pinned: a genuine shuffle's bytes land in the window that
  * ran it (after draining the async event bus — the boundary discipline
  * Bench applies per query), and a shuffle-free window stays at zero, so
  * the per-query deltas are attributable, not smeared. */
class ListenerTelemetrySpec extends SparkSpec {

  test("shuffle bytes attribute to their window; shuffle-free windows add zero") {
    val tm = new BenchTaskMetricsListener
    spark.sparkContext.addSparkListener(tm)
    try {
      def drain(): Unit = org.apache.spark.GraftListenerBridge
        .drainListenerEvents(spark.sparkContext)
      drain()
      val (r0, w0) = (tm.shuffleRead.get, tm.shuffleWrite.get)
      // a genuine shuffle: explicit hash repartition + aggregation
      Catalog.table(spark, sf, "documents")
        .repartition(8, col("lang"))
        .groupBy(col("lang")).count()
        .write.mode("overwrite").format("noop").save()
      drain()
      val (r1, w1) = (tm.shuffleRead.get, tm.shuffleWrite.get)
      assert(w1 > w0, "shuffle write bytes must be captured")
      assert(r1 > r0, "shuffle read bytes must be captured")
      // a scan-only job (no exchange) must add nothing to either counter
      Catalog.table(spark, sf, "documents")
        .filter(col("n_chars") > 0).select(col("doc_id"))
        .write.mode("overwrite").format("noop").save()
      drain()
      assert(tm.shuffleRead.get == r1 && tm.shuffleWrite.get == w1,
        "a shuffle-free window must not move the shuffle counters")
    } finally spark.sparkContext.removeSparkListener(tm)
  }
}
