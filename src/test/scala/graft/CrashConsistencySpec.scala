package graft.sources

import graft.{Catalog, SparkSpec}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Crash consistency of the staged-commit write path: at 100 TB a writer
  * dying BETWEEN task-level staging (putBlock) and the driver's job commit
  * is routine, and the store must (a) keep serving the pre-crash version,
  * (b) accept a fresh writer immediately, and (c) account + reclaim the
  * dead writer's orphaned staging blocks. The "death" is driven through
  * the REAL write components ([[BlockBatchWrite]] → factory →
  * [[BlockDataWriter]] task commits) which simply never reach the job
  * commit or abort — exactly what a driver crash leaves behind — with the
  * heartbeat lease expiry a cluster deployment would detect modeled by
  * [[BlockStore.expireWriteLease]]. */
class CrashConsistencySpec extends SparkSpec {

  private def connector(name: String) = spark.read
    .format("graft.sources.BlockStoreSource").option("store", name).load()

  private def ids(name: String): Vector[Long] =
    connector(name).select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted.toVector

  private def docRow(id: Long): InternalRow =
    InternalRow(id, UTF8String.fromString(s"text-$id"),
      UTF8String.fromString("en"), UTF8String.fromString("crash-src"),
      id % 97)

  /** Drive the real task-level half of a batch write and "crash" before
    * the job commit: returns the dead job's staging key. */
  private def crashWriterInto(name: String, idLo: Long,
      nPartitions: Int): String = {
    val bw = new BlockWrite(name, Catalog.documents, doTruncate = true)
      .toBatch.asInstanceOf[BlockBatchWrite]
    val factory = bw.createBatchWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = nPartitions
    })
    (0 until nPartitions).foreach { pid =>
      val w = factory.createWriter(pid, pid.toLong)
      (0 until 10).foreach(i => w.write(docRow(idLo + pid * 10 + i)))
      w.commit(): Unit // task-level: blocks stage on the "daemon"
      w.close()
    }
    // ...and the driver dies here: neither commit nor abort ever runs.
    // In-JVM the lease object survives the simulated death, so expire it
    // the way a heartbeat timeout would on a cluster.
    BlockStore.expireWriteLease(bw.jobKey)
    bw.jobKey
  }

  test("writer death between staging and commit: pre-crash version served, " +
      "fresh writer succeeds, orphan accounted and vacuumed") {
    val name = "crash-batch"
    BlockStore.dropStore(name)
    Catalog.table(spark, sf, "documents").limit(40)
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val before = ids(name)
    val versionBefore = BlockStore.currentVersion(name)
    assert(before.nonEmpty)

    val deadKey = crashWriterInto(name, idLo = 1000000L, nPartitions = 3)

    // (a) the visible store is byte-for-byte the pre-crash version — the
    // crashed TRUNCATING write neither replaced nor leaked anything
    assert(ids(name) == before, "crashed writer's blocks leaked into reads")
    assert(BlockStore.currentVersion(name) == versionBefore,
      "crashed writer moved the version history")
    // ...and the orphan is visible to accounting, not silently held
    assert(BlockStore.stagedCount(deadKey) == 3)
    assert(BlockStore.stagedOrphans(name, 0).toMap.get(deadKey).contains(3),
      "dead job's staging not reported as orphaned")

    // (b) a fresh writer succeeds immediately (its own staging key — no
    // collision with the orphan) and its data lands exactly
    val fresh = Catalog.table(spark, sf, "documents")
      .limit(60).where(not(col("doc_id").isin(before: _*)))
    val freshIds = fresh.select(col("doc_id")).collect().map(_.getLong(0))
    fresh.write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("append").save()
    assert(ids(name) == (before ++ freshIds).sorted,
      "fresh append after a crashed writer lost or invented rows")
    assert(BlockStore.stagedCount(deadKey) == 3,
      "fresh writer's commit must not touch the dead job's staging")

    // (c) vacuum reclaims exactly the orphan; the visible store and the
    // live store's staging accounting are untouched
    assert(BlockStore.vacuumStagedOrphans(name, 0) == 3)
    assert(BlockStore.stagedCount(deadKey) == 0, "orphan not reclaimed")
    assert(BlockStore.stagedOrphans(name, 0).isEmpty)
    assert(ids(name) == (before ++ freshIds).sorted)
    BlockStore.dropStore(name)
  }

  test("age retention: in-flight (leased or young) staging is never " +
      "reclaimed; dropStore sweeps only orphans") {
    val name = "crash-retention"
    BlockStore.dropStore(name)
    def blk(id: Long) = BlockStore.Block(id, id, Array((id, s"t$id", "en",
      "s", 1L)))
    // a dead STREAM's epoch staging (task-committed, epoch never
    // committed) — no lease exists for epochs, so age decides
    BlockStore.stage(BlockStore.epochKey(name, 7L), 0, blk(1L))
    // a live batch job mid-write: lease held
    val liveKey = s"$name##job-live"
    BlockStore.beginWriteLease(liveKey)
    BlockStore.stage(liveKey, 0, blk(2L))

    // the epoch orphan is visible at zero retention, the leased key never
    assert(BlockStore.stagedOrphans(name, 0).map(_._1) ==
      Seq(BlockStore.epochKey(name, 7L)))
    // a retention window longer than the staging's age shields the epoch
    // too — the guard that keeps a LIVE stream's seconds-old staging safe
    assert(BlockStore.vacuumStagedOrphans(name, minAgeMs = 3600000L) == 0)
    assert(BlockStore.stagedCount(BlockStore.epochKey(name, 7L)) == 1)

    // dropStore sweeps the orphan but leaves the leased in-flight write
    // (whose commit keeps its recreate-the-store semantics)
    BlockStore.dropStore(name)
    assert(BlockStore.stagedCount(BlockStore.epochKey(name, 7L)) == 0,
      "dropStore must reclaim orphaned staging")
    assert(BlockStore.stagedCount(liveKey) == 1,
      "dropStore must not steal a live writer's staging")
    // the live job then aborts: everything drains
    BlockStore.discardStaged(liveKey)
    assert(BlockStore.stagedOrphans(name, 0).isEmpty)
    BlockStore.dropStore(name)
  }

  test("orphan vacuum racing LIVE writers steals nothing: every leased " +
      "job commits complete; unleased staging is reclaimed") {
    val name = "crash-race"
    BlockStore.dropStore(name)
    def blk(id: Long) = BlockStore.Block(id, id,
      Array((id, s"t$id", "en", "s", 1L)))
    val nWriters = 8
    val blocksPerWriter = 20
    @volatile var stop = false
    @volatile var vacError: Throwable = null
    @volatile var vacPasses = 0L
    // aggressive vacuum loop with ZERO retention — only the lease
    // protects in-flight staging. The loop's health is ASSERTED below:
    // a vacuum that throws on iteration 1 would otherwise leave the
    // writers unraced and the test vacuously green (r15 review).
    val vac = new Thread(() => {
      try while (!stop) {
        BlockStore.vacuumStagedOrphans(name, 0): Unit
        vacPasses += 1
        Thread.`yield`()
      } catch { case t: Throwable => vacError = t }
    })
    vac.start()
    val writers = (0 until nWriters).map { w =>
      new Thread(() => {
        val key = s"$name##job-race-$w"
        BlockStore.beginWriteLease(key)
        (0 until blocksPerWriter).foreach { pid =>
          BlockStore.stage(key, pid, blk(w * 1000L + pid))
          if (pid % 5 == 0) Thread.`yield`()
        }
        BlockStore.promoteInto(key, name, 0 until blocksPerWriter,
          truncate = false)
      })
    }
    // plus a perpetual ORPHAN staged with no lease — the vacuum's prey
    BlockStore.stage(s"$name##job-dead", 0, blk(999999L))
    writers.foreach(_.start())
    writers.foreach(_.join(30000))
    assert(writers.forall(!_.isAlive),
      "a writer thread hung past its join timeout")
    stop = true
    vac.join(10000)
    assert(vacError == null, s"vacuum loop died mid-race: $vacError")
    assert(vacPasses > 0, "vacuum loop never completed a pass")
    val ids = BlockStore.blocks(name).flatMap(_.rows).map(_._1).sorted
    val want = (for (w <- 0 until nWriters; p <- 0 until blocksPerWriter)
      yield w * 1000L + p).sorted
    assert(ids.toSeq == want,
      s"racing vacuum lost committed blocks: got ${ids.length} of ${want.length}")
    // the unleased orphan was reclaimed by one of the vacuum passes
    BlockStore.vacuumStagedOrphans(name, 0): Unit
    assert(BlockStore.stagedCount(s"$name##job-dead") == 0)
    assert(BlockStore.stagedOrphans(name, 0).isEmpty)
    BlockStore.dropStore(name)
  }

  test("a failing write job aborts cleanly: store untouched, no staging " +
      "residue, no orphan report") {
    val name = "crash-abort"
    BlockStore.dropStore(name)
    Catalog.table(spark, sf, "documents").limit(30)
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val before = ids(name)
    val failing = Catalog.table(spark, sf, "documents").limit(30)
      .withColumn("n_chars",
        when(col("doc_id") === before.head, raise_error(lit("boom")))
          .otherwise(col("n_chars")).cast("long"))
    intercept[Exception] {
      failing.write.format("graft.sources.BlockStoreSource")
        .option("store", name).mode("overwrite").save()
    }
    // Spark called BatchWrite.abort: staging discarded, lease released,
    // visible store still the previous version
    assert(ids(name) == before, "failed overwrite mutated the store")
    assert(BlockStore.stagedOrphans(name, 0).isEmpty,
      "aborted job left staging residue")
    BlockStore.dropStore(name)
  }

  /** Stage (task-commit) `rows` ids into `store`'s epoch staging under
    * `epoch`, spread over `nPartitions`, through the REAL streaming write
    * components — and do NOT call the epoch commit: exactly what a query
    * killed between task staging and the sink's commit(epochId) leaves
    * behind. Returns the commit messages a restart-or-commit would use. */
  private def stageEpoch(store: String, epoch: Long, idLo: Long,
      nPartitions: Int, rowsPerPartition: Int): Seq[WriterCommitMessage] = {
    val sw = new BlockWrite(store, Catalog.documents, doTruncate = false)
      .toStreaming
    val factory = sw.createStreamingWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = nPartitions
    })
    (0 until nPartitions).map { pid =>
      val w = factory.createWriter(pid, pid.toLong, epoch)
      (0 until rowsPerPartition).foreach(i =>
        w.write(docRow(idLo + pid * rowsPerPartition + i)))
      val msg = w.commit()
      w.close()
      msg
    }
  }

  test("streaming epoch killed between stage and commit: replay commits " +
      "exactly-once, watermark discards re-commits, dead staging vacuums") {
    val name = "crash-stream"
    BlockStore.dropStore(name)
    Catalog.table(spark, sf, "documents").limit(20)
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val before = ids(name)
    val epochKey5 = BlockStore.epochKey(name, 5)

    // epoch 5 stages over 4 partitions... and the query dies before the
    // sink's commit(5) — streaming epochs carry NO lease (the epoch id
    // first surfaces executor-side), so this staging is immediately the
    // age-distinguished kind
    stageEpoch(name, epoch = 5, idLo = 2000000L,
      nPartitions = 4, rowsPerPartition = 5)
    assert(ids(name) == before, "uncommitted epoch leaked into reads")
    assert(BlockStore.stagedCount(epochKey5) == 4)

    // RESTART from the checkpoint: the offset log replays the same epoch
    // id, recomputing the batch — here under a DIFFERENT partitioning
    // (2 tasks), the realistic post-restart shape. The commit must
    // promote exactly the replaying attempt's partitions: per-partition
    // staging is last-write-wins, and promote drains the whole epoch key
    // (the dead attempt's pids 2-3 must neither append nor linger).
    val replayMsgs = stageEpoch(name, epoch = 5, idLo = 2000000L,
      nPartitions = 2, rowsPerPartition = 5)
    val sw = new BlockWrite(name, Catalog.documents, doTruncate = false)
      .toStreaming
    sw.commit(5, replayMsgs.toArray)
    val replayIds = (0 until 10).map(2000000L + _)
    assert(ids(name) == (before ++ replayIds).sorted,
      "epoch replay after a stage-window kill must append exactly once")
    assert(BlockStore.stagedCount(epochKey5) == 0,
      "promote left staging residue under the epoch key")
    assert(BlockStore.stagedOrphans(name, 0).isEmpty)

    // the s24 idempotence watermark: a SECOND commit of epoch 5 (the
    // crash-after-commit-before-commit-log case — the engine re-runs the
    // epoch even though the sink already applied it) re-stages and is
    // DISCARDED, not double-appended
    val dupMsgs = stageEpoch(name, epoch = 5, idLo = 2000000L,
      nPartitions = 2, rowsPerPartition = 5)
    sw.commit(5, dupMsgs.toArray)
    assert(ids(name) == (before ++ replayIds).sorted,
      "watermark failed: replayed epoch double-appended")
    assert(BlockStore.stagedCount(epochKey5) == 0,
      "discarded replay left staging residue")

    // an ABANDONED epoch (killed stream, checkpoint never resumed): its
    // staging ages into the orphan report and vacuums away with zero
    // effect on the served store
    val epochKey6 = BlockStore.epochKey(name, 6)
    stageEpoch(name, epoch = 6, idLo = 3000000L,
      nPartitions = 3, rowsPerPartition = 4)
    assert(BlockStore.stagedOrphans(name, 0).toMap.get(epochKey6).contains(3),
      "abandoned epoch staging not reported as orphaned")
    assert(BlockStore.stagedOrphans(name, Long.MaxValue).isEmpty,
      "young staging must be invisible under the retention window")
    assert(BlockStore.vacuumStagedOrphans(name, 0) == 3)
    assert(BlockStore.stagedCount(epochKey6) == 0)
    assert(ids(name) == (before ++ replayIds).sorted,
      "vacuum of an abandoned epoch touched served data")
    BlockStore.dropStore(name)
  }
}
