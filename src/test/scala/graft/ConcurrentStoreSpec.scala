package graft

import graft.sources.BlockStore
import org.apache.spark.sql.functions.col

/** CONCURRENT store semantics (r12 verdict ask #5): the pin and
  * generation-fence machinery was only ever exercised sequentially —
  * these properties race live threads over ONE store and assert the
  * invariants the sequential specs take for granted:
  *
  *   1. LINEARIZED commits, no torn reads: every concurrent reader
  *      observes exactly some committed version's row set (mutators are
  *      serialized by the fence lock; the visible array swaps atomically;
  *      planning pins the array it indexed).
  *   2. The DELETE/OPTIMIZE fence vs a LIVE stream is loud under racing
  *      attempts — after the stream's first processed batch every rewrite
  *      attempt throws the fence refusal; after stop() they succeed.
  *   3. Pin EXPIRY (the 256-pin LRU) falls back safely: an expired pin
  *      under an UNCHANGED layout generation re-resolves positionally
  *      (append-only array ⇒ same blocks), while an expired pin over a
  *      REWRITTEN store fails loudly instead of serving shifted blocks
  *      (the r12 ADVICE recompute-after-eviction scenario).
  *
  * Schedules are seeded and re-shuffled per trial; failures print the
  * seed via the assertion context. */
class ConcurrentStoreSpec extends SparkSpec {

  private def mkRows(lo: Long, n: Int): Array[BlockStore.DocRow] =
    Array.tabulate(n)(i => (lo + i, s"t${lo + i}",
      s"l${(lo + i) % 3}", s"s${(lo + i) % 4}", (lo + i) % 11))

  private def stageCommit(name: String, epoch: Long,
      rows: Array[BlockStore.DocRow]): Unit = {
    BlockStore.stage(BlockStore.epochKey(name, epoch), 0,
      BlockStore.Block(rows.map(_._1).min, rows.map(_._1).max, rows))
    BlockStore.commitEpoch(name, epoch, Seq(0))
  }

  private def readIds(name: String, version: Option[Int] = None): Vector[Long] = {
    val r = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name)
    version.foreach(v => r.option("versionAsOf", v.toString): Unit)
    r.load().select(col("doc_id")).collect().map(_.getLong(0))
      .sorted.toVector
  }

  test("racing appends/DELETE/OPTIMIZE vs readers: every observed read " +
    "IS a committed version (no torn, no shifted reads)") {
    val name = "conc-race"
    BlockStore.dropStore(name)
    stageCommit(name, 0L, mkRows(0L, 50))
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Vector[Long]]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(seed: Long)(body: scala.util.Random => Unit): Thread = {
      val t = new Thread(() => {
        val rnd = new scala.util.Random(seed)
        try body(rnd) catch { case e: Throwable => errors.add(e): Unit }
      })
      t.start(); t
    }
    val threads = Seq(
      // two appenders on disjoint id ranges / epoch namespaces
      thread(1L) { rnd =>
        (1 to 6).foreach { e =>
          stageCommit(name, 100L + e, mkRows(1000L + e * 100, 10 + rnd.nextInt(20)))
          Thread.sleep(rnd.nextInt(30).toLong)
        }
      },
      thread(2L) { rnd =>
        (1 to 6).foreach { e =>
          stageCommit(name, 200L + e, mkRows(5000L + e * 100, 10 + rnd.nextInt(20)))
          Thread.sleep(rnd.nextInt(30).toLong)
        }
      },
      thread(3L) { rnd =>
        (1 to 4).foreach { i =>
          Thread.sleep(rnd.nextInt(60).toLong)
          BlockStore.deleteWhere(name, _ => true, _._1 % (3 + i) == 0): Unit
        }
      },
      thread(4L) { rnd =>
        (1 to 3).foreach { _ =>
          Thread.sleep(rnd.nextInt(80).toLong)
          BlockStore.optimize(name, 64L): Unit
        }
      }) ++ (5 to 7).map(s => thread(s.toLong) { rnd =>
        (1 to 8).foreach { _ =>
          observed.add(readIds(name)): Unit
          Thread.sleep(rnd.nextInt(25).toLong)
        }
      })
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive),
      "a racing thread is still alive after the join timeout — the " +
        "assertions below would race it (host stall, not a store bug)")
    assert(errors.isEmpty, s"concurrent op failed: ${errors.peek()}")
    // legal states = every transactionally committed version's row set
    val legal = (1 to BlockStore.currentVersion(name))
      .map(v => readIds(name, Some(v))).toSet
    import scala.jdk.CollectionConverters._
    observed.asScala.foreach { o =>
      assert(legal.contains(o),
        s"reader observed a row set that matches NO committed version " +
          s"(${o.take(8)}... size=${o.size}; ${legal.size} versions)")
    }
    BlockStore.dropStore(name)
  }

  test("stream fence under racing rewrites: refusals are loud while the " +
    "stream is live; rewrites succeed after stop; gen bumps exactly then") {
    val name = "conc-fence"
    BlockStore.dropStore(name)
    stageCommit(name, 0L, mkRows(0L, 40))
    val gen0 = BlockStore.layoutGeneration(name)
    val q = spark.readStream.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
      .writeStream.format("memory").queryName("conc_fence_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable() // first batch processed ⇒ fence registered
      assert(BlockStore.liveStreamReaders(name) == 1,
        "fence must be registered once the stream has been driven")
      val rnd = new scala.util.Random(99L)
      (1 to 10).foreach { i =>
        Thread.sleep(rnd.nextInt(20).toLong)
        val e = intercept[IllegalArgumentException] {
          if (i % 2 == 0) BlockStore.deleteWhere(name, _ => true, _._1 % 2 == 0)
          else BlockStore.optimize(name, 64L)
        }
        assert(e.getMessage.contains("streaming reader"),
          s"rewrite attempt $i did not hit the fence: ${e.getMessage}")
      }
      // appends stay allowed under the fence and flow into the stream
      stageCommit(name, 1L, mkRows(500L, 10))
      q.processAllAvailable()
      val streamed = spark.table("conc_fence_sink")
        .select(col("doc_id")).collect().map(_.getLong(0)).toVector
      assert(streamed.distinct.size == streamed.size,
        "streamed rows duplicated — positional offsets re-numbered?")
      assert(streamed.toSet == (0L until 40L).toSet ++ (500L until 510L).toSet,
        "streamed rows diverged from the committed appends")
      assert(BlockStore.layoutGeneration(name) == gen0,
        "no rewrite committed ⇒ the layout generation must not move")
    } finally q.stop()
    // fence released exactly once (idempotent stop)
    q.stop()
    assert(BlockStore.liveStreamReaders(name) == 0,
      "stop must release the fence (once, even if called twice)")
    val del = BlockStore.deleteWhere(name, _ => true, _._1 % 2 == 0)
    assert(del > 0, "post-stop DELETE must succeed")
    assert(BlockStore.layoutGeneration(name) == gen0 + 2,
      "the DELETE rewrite must bump the layout generation by exactly one " +
        "parity pair (pre-swap + post-swap)")
    BlockStore.dropStore(name)
  }

  test("OPTIMIZE vs a COLUMNAR scan: planned partitions resolve their " +
    "pinned snapshot; expired pins over the rewrite fail loudly") {
    val name = "conc-columnar"
    BlockStore.dropStore(name)
    // production-sized blocks (≥ ColumnarMinRows) so the scan answers
    // columnar — the race must exercise createColumnarReader's
    // pinnedOrCurrent resolution, not the row path's
    (0 until 4).foreach(k => stageCommit(name, k.toLong, mkRows(k * 1000L, 600)))
    def scan() = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load().select(col("doc_id"))
    val probe = scan()
    val expected = probe.collect().map(_.getLong(0)).sorted.toVector
    // assert on the FINAL plan after execution (AQE wraps the initial one)
    assert(probe.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "store must plan columnar — otherwise this race exercises the row path")
    // 1) plan → OPTIMIZE lands → execute: the pinned pre-rewrite snapshot
    //    serves the exact planned rows (no error, no shifted positions)
    val rdd1 = scan().rdd
    rdd1.getNumPartitions // force partition planning: pins NOW
    BlockStore.optimize(name, 5000L): Unit // merges all four blocks
    assert(rdd1.map(_.getLong(0)).collect().sorted.toVector == expected,
      "a planned columnar scan must serve its pinned snapshot across OPTIMIZE")
    // 2) racing OPTIMIZEs vs fresh columnar readers: OPTIMIZE never
    //    changes the row set, so every read must observe exactly it
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(seed: Long)(body: scala.util.Random => Unit): Thread = {
      val t = new Thread(() => {
        val rnd = new scala.util.Random(seed)
        try body(rnd) catch { case e: Throwable => errors.add(e): Unit }
      })
      t.start(); t
    }
    val threads = Seq(
      thread(11L) { rnd =>
        Seq(1200L, 2400L, 900L).foreach { target =>
          Thread.sleep(rnd.nextInt(40).toLong)
          BlockStore.optimize(name, target): Unit // bumps gen every time
        }
      }) ++ (12 to 13).map(s => thread(s.toLong) { rnd =>
        (1 to 6).foreach { _ =>
          val got = scan().collect().map(_.getLong(0)).sorted.toVector
          assert(got == expected,
            s"columnar reader observed a torn/shifted row set under OPTIMIZE " +
              s"(size=${got.size}, expected ${expected.size})")
          Thread.sleep(rnd.nextInt(20).toLong)
        }
      })
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive),
      "a racing thread is still alive after the join timeout — the " +
        "assertions below would race it (host stall, not a store bug)")
    assert(errors.isEmpty, s"racing columnar read failed: ${errors.peek()}")
    // 3) expired pin + a rewrite since planning → loud re-plan refusal
    val rdd2 = scan().rdd
    rdd2.getNumPartitions
    (0 until 300).foreach { _ =>
      spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).load().rdd.getNumPartitions: Unit
    }
    BlockStore.optimize(name, 700L): Unit // bumps gen (even merging nothing)
    val e = intercept[org.apache.spark.SparkException] {
      rdd2.map(_.getLong(0)).collect(): Unit
    }
    assert(e.getMessage.contains("re-plan") ||
      Option(e.getCause).exists(_.getMessage.contains("re-plan")),
      s"expired columnar pin over a rewritten store must fail loudly: " +
        s"${e.getMessage.take(300)}")
    BlockStore.dropStore(name)
  }

  test("DELETE racing the SPJ join: planned ShardBlockPartitions resolve " +
    "their pinned snapshot; expired pins over the rewrite fail loudly") {
    val dir = "/root/testdata/sf0.001"
    val (cur, prev) = BlockStore.ensureShardedSnapshots(spark, dir)
    try {
      def ids(rows: Array[org.apache.spark.sql.Row]): Vector[Long] =
        rows.map(_.getLong(0)).sorted.toVector
      // the registered x37 query ends in a global orderBy — a RANGE
      // exchange, so under AQE the join stage (the store reads) executes
      // EAGERLY when the final plan is forced, leaving no plan→read race
      // window. Race the exchange-FREE core instead: the co-located SMJ
      // over the two sharded scans, whose single stage plans partitions
      // (pins) at getNumPartitions and reads the store only at collect.
      def spjCore() = spark.table(s"graftblocks.`$cur`")
        .hint("merge")
        .join(spark.table(s"graftblocks.`$prev`")
          .select(col("doc_id"), col("n_chars").as("prev_chars")),
          Seq("doc_id"))
        .filter(col("n_chars") > 300)
        .select(col("doc_id"))
      val expected = ids(spjCore().collect())
      assert(expected.nonEmpty, "SPJ fixture must produce rows")
      assert(expected.exists(_ % 7 == 3),
        "fixture drift: the racing DELETE below would not change the join")
      // 1) plan the join (pins BOTH sharded scans), DELETE from the
      //    current snapshot mid-flight, execute: the ShardBlockPartitions
      //    must resolve the pinned pre-delete arrays — exact planned rows
      val rdd1 = spjCore().rdd
      rdd1.getNumPartitions // force planning: pins NOW
      val del = BlockStore.deleteWhere(cur, _ => true, _._1 % 7 == 3)
      assert(del > 0, "the racing DELETE must remove rows")
      assert(ids(rdd1.collect()) == expected,
        "a planned SPJ join must serve its pinned snapshots across DELETE")
      // 2) a FRESH plan sees exactly the post-delete store
      val fresh = ids(spjCore().collect())
      assert(fresh == expected.filterNot(_ % 7 == 3),
        "a fresh SPJ plan must observe exactly the post-delete row set")
      // 3) expired pins + another rewrite → loud re-plan refusal through
      //    the ShardBlockPartition path
      val rdd2 = spjCore().rdd
      rdd2.getNumPartitions
      (0 until 300).foreach { _ =>
        spark.read.format("graft.sources.BlockStoreSource")
          .option("store", cur).load().rdd.getNumPartitions: Unit
      }
      BlockStore.deleteWhere(cur, _ => true, _._1 % 11 == 5): Unit
      val e = intercept[org.apache.spark.SparkException] {
        rdd2.collect(): Unit
      }
      assert(e.getMessage.contains("re-plan") ||
        Option(e.getCause).exists(_.getMessage.contains("re-plan")),
        s"expired SPJ pin over a rewritten store must fail loudly: " +
          s"${e.getMessage.take(300)}")
    } finally {
      // the snapshots are now rewritten — drop both so any later consumer
      // (x37 via ensureShardedSnapshots) re-lands clean fixtures
      BlockStore.dropStore(cur)
      BlockStore.dropStore(prev)
    }
  }

  test("a stale stream's stop() cannot steal a successor stream's fence " +
    "(registration tokens survive dropStore)") {
    val name = "conc-fence-theft"
    BlockStore.dropStore(name)
    val tokenA = BlockStore.registerStreamReader(name)
    assert(BlockStore.liveStreamReaders(name) == 1)
    // dropStore clears the counter while A is still registered (the
    // deliberate re-run-starts-clean semantics) ...
    BlockStore.dropStore(name)
    // ... and a successor stream registers on the recreated store
    val tokenB = BlockStore.registerStreamReader(name)
    assert(BlockStore.liveStreamReaders(name) == 1)
    // A's late teardown must not decrement B's fence: a DELETE would
    // otherwise pass the liveStreamReaders==0 require under live B
    BlockStore.unregisterStreamReader(name, tokenA)
    assert(BlockStore.liveStreamReaders(name) == 1,
      "a stale stream's stop stole the successor's fence")
    BlockStore.unregisterStreamReader(name, tokenB)
    assert(BlockStore.liveStreamReaders(name) == 0)
    BlockStore.dropStore(name)
  }

  test("pin expiry: unchanged generation re-resolves positionally; a " +
    "rewritten store fails loudly (never silently shifted blocks)") {
    val name = "conc-pin"
    BlockStore.dropStore(name)
    stageCommit(name, 0L, mkRows(0L, 30))
    def planRdd() = {
      val rdd = spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).load().select(col("doc_id")).rdd
      rdd.getNumPartitions // force partition planning: pins NOW
      rdd
    }
    def churnPins(n: Int): Unit = (0 until n).foreach { _ =>
      // each planning call takes one pin slot; 300 > the 256-pin LRU
      spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).load().rdd.getNumPartitions: Unit
    }
    // 1) expired pin, UNCHANGED layout (appends only) → safe fallback
    val rdd1 = planRdd()
    stageCommit(name, 1L, mkRows(100L, 10)) // append: positions stable
    churnPins(300)
    assert(rdd1.map(_.getLong(0)).collect().sorted.toVector ==
      (0L until 30L).toVector,
      "expired pin under an unchanged generation must re-resolve to the " +
        "exact planned blocks (append-only prefix)")
    // 2) expired pin + REWRITE (delete bumps the generation) → loud
    val rdd2 = planRdd()
    churnPins(300)
    BlockStore.deleteWhere(name, _ => true, _._1 < 10L): Unit
    val e = intercept[org.apache.spark.SparkException] {
      rdd2.map(_.getLong(0)).collect(): Unit
    }
    assert(e.getMessage.contains("re-plan") ||
      Option(e.getCause).exists(_.getMessage.contains("re-plan")),
      s"expired pin over a rewritten store must fail loudly, got: " +
        s"${e.getMessage.take(300)}")
    BlockStore.dropStore(name)
  }
}
