package graft.sources

import graft.{Catalog, SparkSpec}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.PhysicalWriteInfo
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
}
