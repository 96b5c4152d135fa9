package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fault-tolerance mapping for the reference's replication machinery
  * (SURVEY.md §1.5/§4.6): SCache replicates every cached shuffle block to
  * backup peers synchronously (reference
  * `src/main/scala/org/scache/storage/BlockManager.scala:1181-1281`,
  * backups chosen in `MapOutputTracker.scala:204-208`), because a lost
  * block there means a failed job — its blocks have no recompute story.
  *
  * Spark needs neither a custom protocol nor an always-on copy: the SAME
  * durability knob is `StorageLevel.*_2` (peer replication handled by
  * Spark's own BlockManager), and the deeper mechanism is LINEAGE — a lost
  * or evicted block is recomputed from its deterministic plan, so
  * replication is an optimization (avoid recompute latency), not a
  * correctness requirement. This spec exercises both halves on a registry
  * query:
  *
  *  1. `MEMORY_AND_DISK_2` is accepted end-to-end (the replication factor
  *     reaches the RDD's storage level; in `local[*]` there is no peer to
  *     copy to — Spark stores one replica and proceeds, which is exactly
  *     the degrade-don't-fail semantics the reference's best-effort backup
  *     list also has).
  *  2. Lineage recompute: after the cached blocks are dropped entirely
  *     (the worst "lost every replica" case), re-running the same frame
  *     reproduces the identical result from the plan.
  */
class ReplicationSpec extends SparkSpec {

  test("MEMORY_AND_DISK_2 persist carries replication=2 and serves the query") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    val unpersisted = df.collect()
    df.persist(StorageLevel.MEMORY_AND_DISK_2)
    try {
      val cached = df.collect() // materializes the cache
      // Dataset.storageLevel reads the cache manager's entry for this plan
      // (df.rdd would manufacture a NEW uncached RDD and always report NONE)
      val level = df.storageLevel
      assert(level.replication == 2,
        s"expected replication 2 on the cached plan, got $level")
      assert(level.useDisk, s"expected a disk-backed level, got $level")
      assert(cached.toSeq == unpersisted.toSeq,
        "cached result diverged from the uncached plan")
    } finally df.unpersist(blocking = true)
  }

  test("lineage recomputes a dropped cache to the identical result") {
    val df = operators.Relational.queries("q3_top_revenue")(spark, sf)
    df.persist(StorageLevel.MEMORY_AND_DISK_2)
    val first =
      try df.collect()
      // blocking unpersist = every replica of every cached block is gone
      // before the next action — the "all copies lost" scenario the
      // reference's synchronous backup protocol exists to prevent
      finally df.unpersist(blocking = true)
    val recomputed = df.collect()
    assert(recomputed.toSeq == first.toSeq,
      "recompute-from-lineage diverged from the originally cached result")
  }
}
