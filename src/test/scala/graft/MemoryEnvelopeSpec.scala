package graft

import graft.sources.BlockStore

/** The block store's MEMORY ENVELOPE (the reference's defining storage
  * behavior: a bounded memory tier with LRU eviction to disk —
  * `storage/memory/MemoryStore.scala:466-542` `evictBlocksToFreeSpace`,
  * budget fractions `UnifiedMemoryManager.scala:146-176`):
  *
  *   1. overfilling the budget demotes payloads to the disk tier in LRU
  *      order — recently-read blocks survive, stale ones go;
  *   2. the memory tier ends at-or-under budget;
  *   3. reads stay CORRECT through both tiers (a demoted block serves the
  *      same rows; the DSv2 scan over a mixed-tier store is lossless);
  *   4. metadata (min/max stats, dictionaries) stays memory-resident in
  *      both tiers, so block pruning never touches a demoted payload.
  *
  * Budget is restored in a finally — later suites see the default
  * envelope (demoted blocks remain demoted; reads still work, which is
  * itself the two-tier contract).
  */
class MemoryEnvelopeSpec extends SparkSpec {

  test("overfill demotes LRU payloads to disk; reads correct in both tiers") {
    // re-land the store so its payloads START in the memory tier: another
    // suite's budget experiment may already have demoted every resident
    // payload JVM-wide (reads never re-promote by design), and this test's
    // premise is a memory-resident fixture — order independence over luck
    BlockStore.dropStore(s"documents:$sf")
    val name = BlockStore.ensureLoaded(spark, sf)
    val blocks = BlockStore.blocks(name)
    assert(blocks.length > 4, "fixture must span multiple blocks")
    try {
      // Expected row set captured BEFORE any demotion.
      val expect = blocks.flatMap(_.rows.map(_._1)).sorted

      // Touch a "hot" half (freshest LRU stamps). The other half — and any
      // blocks other suites left in other stores — is colder than these.
      val (hot, cold) = blocks.splitAt(blocks.length / 2)
      hot.foreach { b => b.rows; () }

      // Budget = exactly the hot half's bytes. The hot blocks carry the
      // freshest stamps in the whole JVM (suites run sequentially), so
      // enforcement must demote every colder payload — this store's cold
      // half and any other suite's leftovers — and stop at the hot set.
      val target = hot.map(_.bytes).sum
      val demotedBefore = BlockStore.demotions.get()
      BlockStore.setMemoryBudget(target)

      assert(BlockStore.memoryUsed <= target,
        s"memory tier ${BlockStore.memoryUsed} over budget $target")
      assert(BlockStore.demotions.get() > demotedBefore, "nothing demoted")
      assert(cold.forall(!_.isInMemory), "a cold block stayed in memory")
      // LRU selection: every hot block outlived every cold one.
      assert(hot.forall(_.isInMemory),
        "a recently-read block was evicted before stale ones — not LRU")

      // Correct reads through the disk tier, and the metric moves.
      val reads0 = BlockStore.diskReads.get()
      val demoted = cold.head
      val viaDisk = demoted.rows
      assert(BlockStore.diskReads.get() > reads0, "disk tier not exercised")
      assert(viaDisk.length.toLong == demoted.numRows &&
        viaDisk.iterator.map(_._1).min == demoted.minId &&
        viaDisk.iterator.map(_._1).max == demoted.maxId,
        "demoted payload round-trip lost rows or order stats")

      // Mixed-tier scan through the connector is lossless.
      val got = spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).load()
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(expect), "mixed-tier scan diverged")

      // Metadata stays resident: stats pruning on a demoted-heavy store
      // still opens only the surviving blocks (no payload faulted in for
      // pruning itself).
      val lo = demoted.minId
      val before = BlockStore.readersOpened.get()
      val n = spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).load()
        .filter(org.apache.spark.sql.functions.col("doc_id") === lo).count()
      val opened = BlockStore.readersOpened.get() - before
      assert(n >= 1, "point lookup lost a row after demotion")
      assert(opened < blocks.length,
        "stats pruning stopped working on a demoted store")
    } finally BlockStore.resetMemoryBudget()
  }
}
