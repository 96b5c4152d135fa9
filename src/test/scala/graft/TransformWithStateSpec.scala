package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.{Encoders => E}

/** s16 (`transformWithState`) semantics:
  *
  *   1. the event-closed arm is BIT-IDENTICAL to s8's
  *      flatMapGroupsWithState output — the successor API reproduces the
  *      predecessor exactly where their expressible semantics overlap;
  *   2. the timer arm emits ONLY users' final sessions, each expired
  *      against the final watermark — the part s8 could not express;
  *   3. state TTL actually EVICTS: a counter processor whose ValueState
  *      carries a 1 ms TTL starts from zero in every micro-batch of a
  *      4-batch replay, while the identical processor under TTLConfig.NONE
  *      accumulates across all 4 — proving the TTL facility works, not
  *      just parses (the production use: state for keys that stop
  *      arriving is reclaimed without hand-written timer bookkeeping).
  */
class TransformWithStateSpec extends SparkSpec {

  test("s16 event-closed sessions == s8; timer arm only closes final sessions") {
    val s16 = streaming.StreamingOps.closedSessionsTws(spark, sf)
    val s8 = streaming.StreamingOps.closedSessions(spark, sf)
    val eventArm = s16.filter(col("closed_by") === "event")
      .drop("closed_by").collect().map(_.toSeq).toSeq
    assert(eventArm == s8.collect().map(_.toSeq).toSeq,
      "transformWithState event-closed sessions must equal s8 exactly")
    val timers = s16.filter(col("closed_by") === "timer").collect()
    assert(timers.nonEmpty, "some final sessions must expire by timer")
    // a timer row is its user's LAST session: nothing in the full output
    // starts at-or-after it for the same user
    val lastStart = s16.groupBy("user_id")
      .agg(max(col("session_start_s")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    timers.foreach { r =>
      assert(r.getLong(1) == lastStart(r.getLong(0)),
        s"timer closed a non-final session: $r")
    }
  }

  test("s17 list-state buffer is trimmed at K and ranks newest-first") {
    val k = streaming.StreamingOps.LatestK
    val rows = streaming.StreamingOps.latestKEvents(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    val eventCounts = Catalog.eventsNorm(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every user flushes exactly min(K, its event count) rows — the buffer
    // really trims (users with > K events exist on the fixture)
    assert(eventCounts.exists(_._2 > k), "fixture must exercise the trim path")
    assert(byUser.keySet == eventCounts.keySet)
    byUser.foreach { case (uid, rs) =>
      assert(rs.length.toLong == math.min(k.toLong, eventCounts(uid)))
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to rs.length).toSeq)
      // event times non-increasing down the ranks
      val times = ranked.map(_.getLong(3)).toSeq
      assert(times == times.sorted(Ordering[Long].reverse))
    }
  }

  test("s18 map-state tallies partition each user's events exactly") {
    val rows = streaming.StreamingOps.typeTalliesTws(spark, sf).collect()
    val eventCounts = Catalog.eventsNorm(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = rows.groupBy(_.getLong(0))
    assert(byUser.keySet == eventCounts.keySet)
    byUser.foreach { case (uid, rs) =>
      // the map's per-type counts sum back to the user's event count, and
      // types are distinct (one map entry each)
      assert(rs.map(_.getLong(2)).sum == eventCounts(uid))
      val types = rs.map(_.getString(1))
      assert(types.distinct.length == types.length)
    }
  }

  test("value-state TTL evicts between micro-batches; TTLConfig.NONE persists") {
    // 4-file replay with maxFilesPerTrigger=1 → 4 sequential micro-batches
    // with real wall-time between commits (orders of magnitude > the 1 ms
    // TTL). Each batch emits the state found on entry: TTL'd state must
    // always read as absent; un-TTL'd state must accumulate.
    //
    // TTL state REQUIRES TimeMode.ProcessingTime (the handle rejects any
    // other mode), and in ProcessingTime mode the operator's
    // shouldRunAnotherBatch is unconditionally true — Trigger.AvailableNow
    // would loop no-data batches forever (verified against
    // TransformWithStateExecBase bytecode). So this test drives a plain
    // ProcessingTime trigger and stops the query once the sink holds all
    // 4 batches' rows.
    val base = java.nio.file.Files.createTempDirectory("graft-tws-ttl")
    try {
      val src = s"$base/src"
      spark.range(0, 40)
        .repartitionByRange(4, col("id"))
        .select((col("id") % 10).as("k"), lit(1L).as("v"))
        .write.mode("overwrite").parquet(src)
      def run(ttl: TTLConfig, tag: String): Map[Long, Long] = {
        val stream = spark.readStream
          .schema("k LONG, v LONG")
          .option("maxFilesPerTrigger", "1").parquet(src)
        import spark.implicits._
        val prev = spark.conf.getOption(streaming.StreamingOps.ProviderKnob)
        spark.conf.set(streaming.StreamingOps.ProviderKnob,
          streaming.StreamingOps.RocksDbProvider)
        try {
          val out = stream.as[(Long, Long)].groupByKey(_._1)
            .transformWithState(new TtlCountProcessor(ttl),
              TimeMode.ProcessingTime(), OutputMode.Append())
          val q = out.toDF("k", "prior")
            .writeStream.outputMode(OutputMode.Append()).format("memory")
            .queryName(s"ttl_$tag")
            .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
          // 4 files × 10 keys → 40 appended rows once all batches committed
          val deadline = System.currentTimeMillis() + 120000
          while (spark.table(s"ttl_$tag").count() < 40 &&
              System.currentTimeMillis() < deadline) Thread.sleep(100)
          q.stop()
          q.awaitTermination()
          assert(spark.table(s"ttl_$tag").count() == 40,
            "all 4 micro-batches must commit before the deadline")
          // max prior-count each key ever observed across the batches
          spark.table(s"ttl_$tag").groupBy("k").agg(max("prior").as("m"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        } finally {
          prev match {
            case Some(v) => spark.conf.set(streaming.StreamingOps.ProviderKnob, v)
            case None    => spark.conf.unset(streaming.StreamingOps.ProviderKnob)
          }
          try spark.catalog.dropTempView(s"ttl_$tag") catch { case _: Exception => }
        }
      }
      val persisted = run(TTLConfig.NONE, "none")
      val evicted = run(new TTLConfig(java.time.Duration.ofMillis(1)), "1ms")
      // without TTL, later batches see accumulated counts (>0 somewhere)
      assert(persisted.values.max > 0,
        s"un-TTL'd state never accumulated: $persisted")
      // with a 1 ms TTL every batch starts fresh — prior is always 0
      assert(evicted.values.forall(_ == 0),
        s"TTL'd state survived across batches: $evicted")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(base.toFile)
    }
  }
}

/** Counting processor for the TTL test: emits the state found on entry
  * (0 if absent/expired), then adds this batch's row count. */
private class TtlCountProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var n: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    n = getHandle.getValueState[Long]("n", E.scalaLong, ttl)
  override def handleInputRows(k: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[(Long, Long)] = {
    val prior = if (n.exists) n.get else 0L
    n.update(prior + rows.size)
    Iterator((k, prior))
  }
  override def handleExpiredTimer(k: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long)] = Iterator.empty
}
