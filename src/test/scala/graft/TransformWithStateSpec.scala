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

  test("s19 snapshot+tail run is bit-identical to s17's full-history run") {
    // the migration guarantee: bootstrapping from the batch snapshot and
    // replaying only the tail must be indistinguishable from having run
    // the stream over all history
    val full = streaming.StreamingOps.latestKEvents(spark, sf)
      .collect().map(_.toSeq).toSeq
    val boot = streaming.StreamingOps.latestKBootstrap(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(boot == full, "bootstrap run diverged from the full-history run")
    // the fixture really exercises BOTH arms: events exist on each side of
    // the mid-range cut (otherwise the test proves nothing about merging)
    val ev = Catalog.eventsNorm(spark, sf)
      .select(unix_micros(col("ts")).as("us"))
    val b = ev.agg(min(col("us")), max(col("us"))).head()
    val cut = (b.getLong(0) + b.getLong(1)) / 2
    assert(ev.filter(col("us") < cut).count() > 0, "empty history side")
    assert(ev.filter(col("us") >= cut).count() > 0, "empty tail side")
  }

  test("s20 streaming dedup matches a driver recompute and hits all three statuses") {
    import graft.functions.Text
    // independent driver-side recompute: fingerprint every doc, index
    // canon = min landed id, stream canon = min incoming id
    val dig = Text.withTokens(Catalog.table(spark, sf, "documents"))
      .select(col("doc_id"), Text.contentFingerprint(col("_toks")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val idxCanon = dig.filter(_._1 % 5 != 0).groupBy(_._2)
      .map { case (fp, xs) => fp -> xs.map(_._1).min }
    val streamMin = dig.filter(_._1 % 5 == 0).groupBy(_._2)
      .map { case (fp, xs) => fp -> xs.map(_._1).min }
    val expected = dig.filter(_._1 % 5 == 0).map { case (id, fp) =>
      val canon = idxCanon.getOrElse(fp, streamMin(fp))
      val status =
        if (canon == id) "new"
        else if (canon % 5 != 0) "dup_index"
        else "dup_stream"
      (id, canon, status)
    }.sortBy(_._1).toSeq
    val got = streaming.StreamingOps.streamDedupBootstrap(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected, "streaming classification diverged from recompute")
    // the fixture must exercise every branch or the test proves nothing
    // about one of them (dup_stream in particular needs an unindexed
    // fingerprint shared by two incoming docs)
    val statuses = got.map(_._3).toSet
    assert(statuses == Set("new", "dup_index", "dup_stream"),
      s"fixture covers only $statuses")
  }

  test("state schema EVOLVES across a checkpoint restart (avro encoding)") {
    // operational completeness for the s16-s18 family: a deployed processor
    // gets a new feature → its state case class grows a field. Under the
    // default unsaferow encoding a state schema change on restart is
    // rejected; with spark.sql.streaming.stateStore.encodingFormat=avro the
    // store evolves the schema (new OPTIONAL field, read as absent for
    // pre-evolution rows). Drive it end-to-end: run V1 (state = CountV1),
    // stop, restart the SAME checkpoint with V2 (state = CountV2 adding an
    // Option[Long] field), feed a second batch, and assert the totals
    // CONTINUE from V1's state — evolution, not a reset.
    val base = java.nio.file.Files.createTempDirectory("graft-tws-evo")
    val provPrev = spark.conf.getOption(streaming.StreamingOps.ProviderKnob)
    val encKnob = "spark.sql.streaming.stateStore.encodingFormat"
    val encPrev = spark.conf.getOption(encKnob)
    try {
      val src = s"$base/src"
      val cp = s"$base/cp"
      // the memory sink cannot recover from a checkpoint (the restart is
      // the whole point here) — use the recoverable parquet FILE sink and
      // read results back through its commit log (the s10 pattern)
      val out = s"$base/out"
      spark.conf.set(streaming.StreamingOps.ProviderKnob,
        streaming.StreamingOps.RocksDbProvider)
      spark.conf.set(encKnob, "avro")
      import spark.implicits._
      def run(mkOut: org.apache.spark.sql.Dataset[(Long, Long)]
          => org.apache.spark.sql.DataFrame): Map[Long, Long] = {
        val stream = spark.readStream.schema("k LONG, v LONG").parquet(src)
        val q = mkOut(stream.as[(Long, Long)])
          .writeStream.outputMode(OutputMode.Append()).format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.read.parquet(out).groupBy("k").agg(max("n").as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      // batch 1: 3 rows for key 0, 1 row for key 1
      Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 1L)).toDF("k", "v")
        .write.mode("append").parquet(src)
      val v1 = run(_.groupByKey(_._1)
        .transformWithState(new EvoV1Processor, TimeMode.None(), OutputMode.Append())
        .toDF("k", "n"))
      assert(v1 == Map(0L -> 3L, 1L -> 1L), s"V1 totals wrong: $v1")
      // batch 2 lands AFTER the stop; the file source's checkpoint replays
      // only these new files into the restarted query
      Seq((0L, 1L), (1L, 1L), (2L, 1L)).toDF("k", "v")
        .write.mode("append").parquet(src)
      val v2 = run(_.groupByKey(_._1)
        .transformWithState(new EvoV2Processor, TimeMode.None(), OutputMode.Append())
        .toDF("k", "n"))
      // continuation across the schema change: key 0 = 3+1, key 1 = 1+1,
      // and the brand-new key 2 starts fresh at 1
      assert(v2 == Map(0L -> 4L, 1L -> 2L, 2L -> 1L),
        s"state did not survive the schema evolution: $v2")
    } finally {
      provPrev match {
        case Some(v) => spark.conf.set(streaming.StreamingOps.ProviderKnob, v)
        case None    => spark.conf.unset(streaming.StreamingOps.ProviderKnob)
      }
      encPrev match {
        case Some(v) => spark.conf.set(encKnob, v)
        case None    => spark.conf.unset(encKnob)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(base.toFile)
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

/** V1 state for the schema-evolution test: the original deployment. */
private case class CountV1(n: Long)
/** V2 state: the SAME record grown by one optional field — the avro-legal
  * evolution (new field, nullable, absent in pre-evolution rows). */
private case class CountV2(n: Long, extra: Option[Long])

/** Evolution test, original processor: running count in `CountV1`. */
private class EvoV1Processor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var st: ValueState[CountV1] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CountV1]("count", E.product[CountV1], TTLConfig.NONE)
  override def handleInputRows(k: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[(Long, Long)] = {
    val total = (if (st.exists) st.get.n else 0L) + rows.size
    st.update(CountV1(total))
    Iterator((k, total))
  }
  override def handleExpiredTimer(k: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long)] = Iterator.empty
}

/** Evolution test, redeployed processor: same state name, `CountV2` schema.
  * Reads V1-written rows (extra decodes as None) and keeps counting. */
private class EvoV2Processor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var st: ValueState[CountV2] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CountV2]("count", E.product[CountV2], TTLConfig.NONE)
  override def handleInputRows(k: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[(Long, Long)] = {
    val total = (if (st.exists) st.get.n else 0L) + rows.size
    st.update(CountV2(total, Some(total)))
    Iterator((k, total))
  }
  override def handleExpiredTimer(k: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long)] = Iterator.empty
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
