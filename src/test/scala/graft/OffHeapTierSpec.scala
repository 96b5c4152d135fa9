package graft

import graft.sources.BlockStore

/** The OFF-HEAP middle tier (memory → off-heap → disk): the reference's
  * OFF_HEAP StorageLevel (`storage/StorageLevel.scala:150-162`), shipped
  * enabled at 1024 MB in its conf (`conf/scache.conf:1-5`), re-expressed
  * as a budgeted direct-ByteBuffer stage in the store's eviction ladder.
  * Contract pinned here:
  *
  *   1. OPT-IN: with the default budget 0 the tier never engages —
  *      demotions land on disk exactly as the two-tier envelope spec
  *      asserts (that spec runs unchanged in this suite's JVM);
  *   2. a sized tier catches heap demotions as native buffers (real
  *      off-heap bytes, `isOffHeap`, `offHeapUsed` > 0) and reads serve
  *      from it byte-losslessly without touching disk;
  *   3. overfilling the OFF-HEAP budget spills ITS LRU buffers to disk
  *      (two-stage eviction), and reads remain correct from all three
  *      tiers at once — the mixed-tier connector scan is lossless.
  */
class OffHeapTierSpec extends SparkSpec {

  private def mkBlock(lo: Long, n: Int): BlockStore.Block =
    BlockStore.Block(lo, lo + n - 1,
      (0 until n).map(i =>
        (lo + i, s"body-${lo + i} " + ("x" * 64), s"l${i % 3}", s"s${i % 2}",
          64L)).toArray)

  test("off-heap tier: opt-in demotion target, lossless reads, LRU spill to disk") {
    val name = "offheap-spec-store"
    BlockStore.dropStore(name)
    try {
      // stage + epoch-commit four ~equal blocks into a fresh store
      (0 until 4).foreach { k =>
        BlockStore.stage(BlockStore.epochKey(name, 0), k, mkBlock(k * 100L, 50))
      }
      BlockStore.commitEpoch(name, 0, Seq(0, 1, 2, 3))
      val blocks = BlockStore.blocks(name)
      assert(blocks.length == 4 && blocks.forall(_.tier == "memory"))
      val expect = blocks.flatMap(_.rows.map(_._1)).sorted
      val perBlock = blocks.head.bytes

      // 2: size the off-heap tier, then shrink the HEAP budget so the two
      // LRU-coldest blocks JVM-WIDE are exactly blocks(0) and blocks(1):
      // freshen every other store's resident payloads first (suites share
      // this JVM — their leftovers must not be the eviction victims), then
      // the two keepers, leaving blocks(0)/blocks(1) stalest.
      BlockStore.setOffHeapBudget(perBlock * 16)
      BlockStore.storeNames.filterNot(_ == name).foreach { s =>
        BlockStore.blocks(s).filter(_.isInMemory).foreach { b => b.rows; () }
      }
      blocks(2).rows; blocks(3).rows
      val heapKeep = BlockStore.memoryUsed - 2 * perBlock
      BlockStore.setMemoryBudget(heapKeep)
      assert(blocks(0).tier == "offheap" && blocks(1).tier == "offheap",
        s"cold blocks must demote to the sized off-heap tier, got " +
          blocks.map(_.tier).mkString(","))
      assert(BlockStore.offHeapUsed > 0, "off-heap accounting must move")
      val (dr0, or0) = (BlockStore.diskReads.get, BlockStore.offHeapReads.get)
      val back = blocks(0).rows
      assert(BlockStore.offHeapReads.get > or0 && BlockStore.diskReads.get == dr0,
        "a demoted read must serve from off-heap, not disk")
      assert(back.length == 50 && back.map(_._1).min == blocks(0).minId &&
        back.map(_._2).forall(_.startsWith("body-")),
        "off-heap round-trip lost rows or bytes")

      // 3: shrink the OFF-HEAP budget below one buffer — the tier's LRU
      // (blocks(1): blocks(0) was just read, so it is fresher) spills to
      // disk while the fresher buffer survives
      val spills0 = BlockStore.offHeapSpills.get
      BlockStore.setOffHeapBudget(blocks(0).offHeapHeld)
      assert(BlockStore.offHeapSpills.get > spills0, "nothing spilled")
      assert(blocks(1).tier == "disk" && blocks(0).tier == "offheap",
        s"off-heap spill must evict LRU first, got " +
          blocks.map(_.tier).mkString(","))
      assert(BlockStore.offHeapUsed <= blocks(0).offHeapHeld,
        "off-heap tier must end at-or-under its budget")

      // all three tiers live at once; the connector scan is lossless
      assert(blocks.map(_.tier).toSet == Set("memory", "offheap", "disk"))
      val got = spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).load()
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(expect), "three-tier scan diverged")
    } finally {
      BlockStore.resetMemoryBudget()
      BlockStore.resetOffHeapBudget()
      BlockStore.dropStore(name)
    }
  }

  test("off-heap tier disabled by default: demotions land on disk") {
    val name = "offheap-default-spec"
    BlockStore.dropStore(name)
    try {
      BlockStore.stage(BlockStore.epochKey(name, 0), 0, mkBlock(5000L, 50))
      BlockStore.commitEpoch(name, 0, Seq(0))
      val b = BlockStore.blocks(name).head
      assert(BlockStore.offHeapTierBudget == 0L, "tier must default OFF")
      BlockStore.setMemoryBudget(0L)
      assert(b.tier == "disk",
        "with budget 0 the off-heap tier must never engage")
      assert(b.rows.length == 50)
    } finally {
      BlockStore.resetMemoryBudget()
      BlockStore.dropStore(name)
    }
  }
}
