package graft

import graft.sources.BlockStore
import org.apache.spark.sql.functions._

/** The DSv2 connector's three contracts (x32): lossless read, block
  * pruning from pushed bounds + min/max stats, and column pruning down to
  * the materialized fields — each observed from the OUTSIDE (results,
  * reader-open counts, scan description), not by trusting internals. */
class BlockStoreSpec extends SparkSpec {

  private def store: String = BlockStore.ensureLoaded(spark, sf)

  private def viaConnector = spark.read
    .format("graft.sources.BlockStoreSource").option("store", store).load()

  test("connector read is lossless vs the parquet table") {
    val viaParquet = Catalog.table(spark, sf, "documents")
      .collect().map(_.toSeq.toVector).toSet
    val got = viaConnector.collect().map(_.toSeq.toVector).toSet
    assert(got == viaParquet, "block-store read diverged from parquet")
  }

  test("pushed doc_id bounds prune whole blocks (reader-open count)") {
    val n = BlockStore.blockCount(store)
    assert(n > 1, "fixture must span multiple blocks for pruning to show")
    def opens(body: => Any): Long = {
      val before = BlockStore.readersOpened.get()
      body
      BlockStore.readersOpened.get() - before
    }
    // sum(n_chars) cannot be stats-served (x34 would answer a bare
    // count() from metadata with zero readers), so it drives a REAL scan
    val full = opens(viaConnector.agg(sum(col("n_chars"))).head())
    assert(full == n, s"unfiltered scan should open every block ($full of $n)")
    // bound inside the first block's range: only blocks whose min <= cut
    // survive planInputPartitions
    val cut = Catalog.table(spark, sf, "documents")
      .agg(min(col("doc_id"))).head().getLong(0)
    val pruned = opens {
      viaConnector.filter(col("doc_id") <= cut).agg(sum(col("n_chars"))).head()
    }
    assert(pruned < full,
      s"bounded scan should skip blocks: opened $pruned of $full")
    // and the residual discipline holds: the pruned scan still returns
    // exactly the matching rows
    val nRows = viaConnector.filter(col("doc_id") <= cut).count()
    val expected = Catalog.table(spark, sf, "documents")
      .filter(col("doc_id") <= cut).count()
    assert(nRows == expected)
  }

  test("V2 write: sink-demanded clustering lands disjoint blocks; commit is atomic") {
    val name = s"spec-write:$sf"
    def writeOnce(): Unit = Catalog.table(spark, sf, "documents")
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    writeOnce()
    // nothing left half-visible: staging drained by the job commit
    assert(BlockStore.stagedCount(name) == 0, "staging not drained")
    // lossless write -> read roundtrip
    val viaParquet = Catalog.table(spark, sf, "documents")
      .collect().map(_.toSeq.toVector).toSet
    val readBack = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
    assert(readBack.collect().map(_.toSeq.toVector).toSet == viaParquet,
      "write -> read roundtrip lost rows")
    // RequiresDistributionAndOrdering honored: the CALLER never
    // repartitioned, yet the landed blocks carry tight pairwise-DISJOINT
    // doc_id ranges — proof Spark planned the sink's range shuffle
    val boxes = BlockStore.blockStats(name).sortBy(_._1)
    assert(boxes.size > 1, "fixture must land multiple blocks")
    boxes.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"block ranges overlap: $boxes")
      case _ =>
    }
    // overwrite truncate-promote: a second write replaces, never appends
    val n1 = BlockStore.blockCount(name)
    writeOnce()
    assert(BlockStore.blockCount(name) == n1,
      "overwrite must replace the store, not append to it")
  }

  test("count/min/max are served from block stats with ZERO readers opened") {
    store // ensure loaded before the counter snapshot
    val before = BlockStore.readersOpened.get()
    val row = viaConnector
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
      .head()
    val opened = BlockStore.readersOpened.get() - before
    assert(opened == 0,
      s"stats-served aggregation opened $opened block readers")
    // and the metadata answers are the table-scan truth
    val truth = Catalog.table(spark, sf, "documents")
      .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (truth.getLong(0), truth.getLong(1), truth.getLong(2)))
    // a grouped aggregate the stats CANNOT answer (sum of a payload
    // column) is refused and falls back to a real scan — correctness
    // over cleverness (grouped COUNT(*) by lang/source, which the
    // dictionary value counts CAN answer, is covered by the x42 spec)
    val before2 = BlockStore.readersOpened.get()
    val grouped = viaConnector.groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("s")).collect()
    assert(BlockStore.readersOpened.get() - before2 > 0,
      "non-stats-answerable grouped agg must fall back to scanning")
    assert(grouped.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Catalog.table(spark, sf, "documents").groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("scan statistics are bounds-aware (pruned scan reports smaller size)") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    def scanSize(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
      }.head
    val cut = Catalog.table(spark, sf, "documents")
      .agg(min(col("doc_id"))).head().getLong(0)
    val full = scanSize(viaConnector.select(col("doc_id"), col("text")))
    val pruned = scanSize(viaConnector.filter(col("doc_id") <= cut)
      .select(col("doc_id"), col("text")))
    assert(pruned < full,
      s"bounds-aware stats should shrink the estimate: $pruned vs $full")
  }

  test("runtime join keys prune blocks before any reader opens (DPP contract)") {
    store // loaded before the counter snapshot
    val dim = Catalog.table(spark, sf, "documents")
      .filter(col("source") === "src3" && col("n_chars") % 10 === 3)
      .select(col("doc_id"))
    val expectedKeys = dim.collect().map(_.getLong(0)).toSet
    assert(expectedKeys.nonEmpty, "fixture predicate selects nothing")
    val joined = viaConnector.join(broadcast(dim), Seq("doc_id"))
      .select(col("doc_id"), col("lang"))
    val before = BlockStore.readersOpened.get()
    val rows = joined.collect()
    val opened = BlockStore.readersOpened.get() - before
    val n = BlockStore.blockCount(store)
    // the keys cluster into few of the n blocks; the scan must have
    // consulted the runtime In-filter, not read the whole store
    assert(opened < n, s"runtime filter pruned nothing: opened $opened of $n")
    assert(opened > 0, "some block must contain the matching keys")
    assert(rows.map(_.getLong(0)).toSet == expectedKeys,
      "pruning changed the join result")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"runtime filter missing from the executed plan:\n$plan")
  }

  test("streaming drain: admission control yields bounded multi-batch progress") {
    val name = s"spec-stream:$sf"
    Catalog.table(spark, sf, "documents")
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val nBlocks = BlockStore.blockCount(name)
    val cap = 4
    assert(nBlocks > cap, s"fixture must exceed the trigger cap ($nBlocks)")
    val q = spark.readStream.format("graft.sources.BlockStoreSource")
      .option("store", name).option("maxBlocksPerTrigger", cap.toString).load()
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("spec_bs_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      // ceil(nBlocks / cap) data batches, each within the admission cap
      val data = q.recentProgress.filter(_.numInputRows > 0)
      val expectBatches = (nBlocks + cap - 1) / cap
      assert(data.length == expectBatches,
        s"expected $expectBatches bounded batches, saw ${data.length}")
      val totalRows = data.map(_.numInputRows).sum
      val expectRows = Catalog.table(spark, sf, "documents").count()
      assert(totalRows == expectRows,
        s"drained $totalRows rows, table has $expectRows")
      val sunk = spark.table("spec_bs_stream")
        .agg(sum(col("n_docs"))).head().getLong(0)
      assert(sunk == expectRows, "final totals diverge from the drain")
    } finally {
      try spark.catalog.dropTempView("spec_bs_stream")
      catch { case _: Exception => }
    }
  }

  test("streaming tail: blocks appended after start are picked up live") {
    val name = s"spec-tail:$sf"
    val docs = Catalog.table(spark, sf, "documents")
    val (lo, hi) = {
      val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val half = lo + (hi - lo) / 2
    docs.filter(col("doc_id") <= half)
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val firstRows = docs.filter(col("doc_id") <= half).count()
    val allRows = docs.count()
    val q = spark.readStream.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
      .select(col("doc_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("spec_bs_tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()
    def sunkCount: Long =
      spark.table("spec_bs_tail").count()
    def waitFor(target: Long): Unit = {
      val deadline = System.nanoTime() + 30_000_000_000L
      while (sunkCount < target && System.nanoTime() < deadline)
        Thread.sleep(100)
    }
    try {
      waitFor(firstRows)
      assert(sunkCount == firstRows,
        s"initial drain: sunk $sunkCount of $firstRows")
      // a SECOND writer appends while the stream is live (no truncate)
      docs.filter(col("doc_id") > half)
        .write.format("graft.sources.BlockStoreSource")
        .option("store", name).mode("append").save()
      waitFor(allRows)
      assert(sunkCount == allRows,
        s"live tail missed appended blocks: sunk $sunkCount of $allRows")
    } finally {
      try q.stop() catch { case _: Exception => }
      try spark.catalog.dropTempView("spec_bs_tail")
      catch { case _: Exception => }
    }
  }

  test("SQL DDL/DML: CREATE TABLE + INSERT OVERWRITE + SELECT, no DataFrame code") {
    val name = s"spec-sql:$sf"
    Catalog.table(spark, sf, "documents").createOrReplaceTempView("spec_docs")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS spec_block_table
                 |USING graft.sources.BlockStoreSource
                 |OPTIONS (store '$name')""".stripMargin)
    try {
      spark.sql("INSERT OVERWRITE spec_block_table SELECT * FROM spec_docs")
      // the SQL write drove the staged-commit path and drained staging
      assert(BlockStore.stagedCount(name) == 0, "staging not drained")
      assert(BlockStore.blockCount(name) > 0, "no blocks landed")
      val viaSql = spark.sql(
        "SELECT count(*), sum(n_chars) FROM spec_block_table").head()
      val direct = Catalog.table(spark, sf, "documents")
        .agg(count(lit(1)), sum(col("n_chars"))).head()
      assert(viaSql.getLong(0) == direct.getLong(0) &&
        viaSql.getLong(1) == direct.getLong(1),
        "SQL read diverged from the parquet table")
      // the catalog table plans the same pruning-capable scan: a doc_id
      // bound reaches the connector (visible in the scan description)
      val plan = spark.sql(
        "SELECT lang FROM spec_block_table WHERE doc_id <= 10")
        .queryExecution.executedPlan.toString
      assert(plan.contains("graft-blocks") && plan.contains("bounds="),
        s"catalog scan lost the connector pushdown:\n$plan")
    } finally {
      try spark.sql("DROP TABLE IF EXISTS spec_block_table")
      catch { case _: Exception => }
      try spark.catalog.dropTempView("spec_docs")
      catch { case _: Exception => }
    }
  }

  test("lang equality predicate prunes blocks via dictionary stats") {
    val name = BlockStore.ensureLangClustered(spark, sf)
    val total = BlockStore.blockCount(name).toLong
    assert(total > 1, "fixture must span multiple blocks for pruning to show")
    val df = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
    def opens(body: => Any): Long = {
      val before = BlockStore.readersOpened.get()
      body
      BlockStore.readersOpened.get() - before
    }
    // baseline: a non-prunable predicate touches every block
    val all = opens(df.filter(col("n_chars") >= 0)
      .agg(sum(col("n_chars"))).collect())
    assert(all == total, s"baseline should open all $total blocks, got $all")
    val en = opens(df.filter(col("lang") === "en")
      .agg(sum(col("n_chars"))).collect())
    assert(en < total,
      s"lang='en' must skip blocks whose dictionary lacks 'en' ($en of $total)")
    // sound: rows match the parquet truth exactly (residual re-applies)
    val got = df.filter(col("lang") === "en").count()
    val want = Catalog.table(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(got == want, "dictionary pruning must never change results")
    // the pushed dictionary is visible in the scan description
    val plan = df.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("dict[lang in {en}]"),
      s"scan description must surface the dictionary filter:\n$plan")
  }

  test("lang-keyed broadcast join runtime-prunes blocks via dictionary stats") {
    // The r10 dictionary stats served only STATIC pushed predicates; the
    // runtime-filtering path (x35's DPP shape) now also carries lang /
    // source join keys: the broadcast build side materializes first, its
    // actual key values arrive as In("lang", ...), and blocks whose
    // dictionaries are disjoint are never opened.
    val name = BlockStore.ensureLangClustered(spark, sf)
    val total = BlockStore.blockCount(name).toLong
    assert(total > 1, "fixture must span multiple blocks for pruning to show")
    val dim = Catalog.table(spark, sf, "documents")
      .filter(col("lang") === "de").select(col("lang")).distinct()
    val joined = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
      .join(broadcast(dim), Seq("lang"))
    val before = BlockStore.readersOpened.get()
    val got = joined.count()
    val opened = BlockStore.readersOpened.get() - before
    val want = Catalog.table(spark, sf, "documents")
      .filter(col("lang") === "de").count()
    assert(got == want, "runtime dictionary pruning must never change results")
    assert(opened < total,
      s"a lang-keyed broadcast join must skip dictionary-disjoint blocks " +
        s"(opened $opened of $total)")
  }

  test("storage-partitioned join plans with no Exchange above either scan") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // belt and braces with the merge hint: at spec scale AQE would
      // otherwise broadcast and the assertion would go vacuous
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = operators.Extended.blockStoreSpjJoin(spark, sf)
      val rows = df.collect()
      assert(rows.length > 0, "SPJ join returned no rows")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      // the query's global orderBy legitimately range-partitions ABOVE the
      // join; what SPJ must elide is the hash Exchange under either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-sharded stores must join with NO Exchange on either side:\n$plan")
      // both sides really are the connector, not some fallback scan
      assert("graft-blocks".r.findAllIn(plan).length >= 2,
        s"expected two block-store scans:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SPJ composes with doc_id pushdown: pruned shards keep alignment") {
    // a pushed range empties some shards' block lists, but every shard
    // still emits its partition (possibly empty) — both sides keep the
    // identical 16-value key set and the join still plans exchange-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (cur, prv) = BlockStore.ensureShardedSnapshots(spark, sf)
      val cut = Catalog.table(spark, sf, "documents")
        .agg(max(col("doc_id"))).head.getLong(0) / 4
      val a = spark.table(s"graftblocks.`$cur`").filter(col("doc_id") <= cut)
      val b = spark.table(s"graftblocks.`$prv`").filter(col("doc_id") <= cut)
        .select(col("doc_id"), col("n_chars").as("prev_chars"))
      val joined = a.hint("merge").join(b, Seq("doc_id"))
        .select(col("doc_id"), col("n_chars"), col("prev_chars"))
      val rows = joined.collect()
      val want = Catalog.table(spark, sf, "documents")
        .filter(col("doc_id") <= cut && col("doc_id") % 3 =!= 0).count()
      assert(rows.length.toLong == want, "pushed SPJ join lost or grew rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") &&
        !plan.contains("Exchange hashpartitioning"),
        s"bounded SPJ join must stay exchange-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SPJ results match the same join straight over parquet") {
    val viaStore = operators.Extended.blockStoreSpjJoin(spark, sf)
      .collect().map(_.toSeq.toVector).toVector
    val docs = Catalog.table(spark, sf, "documents")
    val prev = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("n_chars").as("prev_chars"))
    val want = docs.join(prev, Seq("doc_id")).filter(col("n_chars") > 300)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("prev_chars"))
      .orderBy("doc_id").collect().map(_.toSeq.toVector).toVector
    assert(viaStore == want, "SPJ join diverged from the parquet join")
  }

  test("scan description shows pushed bounds and pruned columns (no text)") {
    val df = viaConnector.filter(col("doc_id") <= 100L)
      .select(col("lang"), col("n_chars"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=["), s"pushed bounds missing:\n$plan")
    assert(plan.contains("bounds=[-9223372036854775808,100]"),
      s"doc_id <= 100 should push hi=100:\n$plan")
    val colsLine = plan.linesIterator.find(_.contains("cols=")).getOrElse("")
    assert(!colsLine.contains("text"),
      s"projection should prune text from the scan:\n$colsLine")
    assert(colsLine.contains("lang") && colsLine.contains("n_chars"),
      s"required columns missing from the scan:\n$colsLine")
  }

  test("SQL DELETE: metadata fast path stats-pruned; residual predicate " +
    "falls back to the row-level copy-on-write rewrite") {
    // a THROWAWAY lang-clustered store (DELETE mutates it — the shared
    // ensureLangClustered fixture must stay pristine for other tests)
    val name = s"delete-spec:$sf"
    Catalog.table(spark, sf, "documents")
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).option("clusterBy", "lang")
      .mode("overwrite").save()
    val total = BlockStore.blockCount(name).toLong
    assert(total > 1, "fixture must span multiple blocks")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS spec_del_table
                 |USING graft.sources.BlockStoreSource
                 |OPTIONS (store '$name')""".stripMargin)
    try {
      val langBlocks = BlockStore.blocks(name).count(_.langs.contains("de")).toLong
      assert(langBlocks < total, "clustering must isolate 'de' into few blocks")
      val (p0, s0) = (BlockStore.deletePruned.get(), BlockStore.deleteScanned.get())
      spark.sql("DELETE FROM spec_del_table WHERE lang = 'de'")
      val pruned = BlockStore.deletePruned.get() - p0
      val scanned = BlockStore.deleteScanned.get() - s0
      assert(scanned == langBlocks,
        s"only the $langBlocks 'de'-dictionary blocks may rewrite, scanned $scanned")
      assert(pruned == total - langBlocks,
        s"stats must exonerate the other ${total - langBlocks} blocks unread")
      // result correctness through the connector read-back
      val got = spark.sql("SELECT count(*) FROM spec_del_table").collect()(0).getLong(0)
      val want = Catalog.table(spark, sf, "documents")
        .filter(col("lang") =!= "de").count()
      assert(got == want, "post-delete row count diverged from filter truth")
      // an un-translatable predicate used to be REFUSED at analysis; since
      // the table declares row-level operations (x46) it plans a group-based
      // copy-on-write rewrite instead — assert the UPGRADED behavior, with
      // correctness through the connector read-back (the refusal-path
      // coverage lives on in RowLevelOpsSpec's sharded/stale-gen refusals)
      spark.sql("DELETE FROM spec_del_table WHERE text LIKE '%table%'")
      val after = spark.sql("SELECT count(*) FROM spec_del_table").collect()(0).getLong(0)
      val wantAfter = Catalog.table(spark, sf, "documents")
        .filter(col("lang") =!= "de")
        .filter(!col("text").like("%table%")).count()
      assert(after == wantAfter,
        "residual-predicate DELETE (COW rewrite) diverged from filter truth")
    } finally {
      try spark.sql("DROP TABLE IF EXISTS spec_del_table")
      catch { case _: Exception => }
    }
  }

  test("streaming sink epoch commit is idempotent (replay never double-appends)") {
    val dst = "epoch-spec-store"
    BlockStore.dropStore(dst)
    def mk(lo: Long): BlockStore.Block =
      BlockStore.Block(lo, lo + 1, Array((lo, "a", "en", "s", 1L), (lo + 1, "b", "en", "s", 1L)))
    // epoch 0 lands
    BlockStore.stage(BlockStore.epochKey(dst, 0), 0, mk(0))
    BlockStore.commitEpoch(dst, 0, Seq(0))
    assert(BlockStore.blockCount(dst) == 1)
    // epoch 1 lands
    BlockStore.stage(BlockStore.epochKey(dst, 1), 0, mk(10))
    BlockStore.commitEpoch(dst, 1, Seq(0))
    assert(BlockStore.blockCount(dst) == 2)
    // REPLAY of epoch 1 (post-recovery re-commit): staged again, but the
    // watermark discards it — the store must not grow
    BlockStore.stage(BlockStore.epochKey(dst, 1), 0, mk(10))
    BlockStore.commitEpoch(dst, 1, Seq(0))
    assert(BlockStore.blockCount(dst) == 2, "replayed epoch double-appended")
    assert(BlockStore.stagedCount(BlockStore.epochKey(dst, 1)) == 0,
      "replayed epoch must drain its staging area")
    // dropStore resets the watermark: a fresh epoch 0 appends again
    BlockStore.dropStore(dst)
    BlockStore.stage(BlockStore.epochKey(dst, 0), 0, mk(0))
    BlockStore.commitEpoch(dst, 0, Seq(0))
    assert(BlockStore.blockCount(dst) == 1,
      "dropStore must reset the epoch watermark for fresh checkpoints")
    BlockStore.dropStore(dst)
  }

  test("metadata columns: hidden from SELECT *, row-exact vs the shard function") {
    val (cur, _) = BlockStore.ensureShardedSnapshots(spark, sf)
    val df = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", cur).load()
    // hidden: a plain star never surfaces them
    assert(!df.columns.contains("_block_shard") && !df.columns.contains("_block_rows"))
    val width = BlockStore.shardingOf(cur).get._2
    val rows = df.select(col("doc_id"), col("_block_shard"), col("_block_rows")).collect()
    assert(rows.nonEmpty)
    val perShard = rows.groupBy(_.getInt(1))
    rows.foreach { r =>
      assert(r.getInt(1) == (r.getLong(0) / width).toInt,
        s"doc ${r.getLong(0)}: _block_shard diverges from doc_id div width")
      assert(r.getLong(2) == perShard(r.getInt(1)).length.toLong,
        s"shard ${r.getInt(1)}: _block_rows diverges from the shard's row count")
    }
  }

  test("time travel: versions at every commit kind, shared blocks, loud failure") {
    val name = "tt-spec-store"
    BlockStore.dropStore(name)
    assert(BlockStore.currentVersion(name) == 0)
    val docs = Catalog.table(spark, sf, "documents")
    // commit 1: batch overwrite
    docs.write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    assert(BlockStore.currentVersion(name) == 1)
    // commit 2: batch append (doubles the corpus)
    docs.write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("append").save()
    assert(BlockStore.currentVersion(name) == 2)
    // commit 3: streaming epoch
    BlockStore.stage(BlockStore.epochKey(name, 0), 0,
      BlockStore.Block(9000, 9001, Array((9000L, "x", "en", "s", 1L), (9001L, "y", "en", "s", 1L))))
    BlockStore.commitEpoch(name, 0, Seq(0))
    assert(BlockStore.currentVersion(name) == 3)
    def countAt(v: Int): Long = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).option("versionAsOf", v.toString).load().count()
    val n = docs.count()
    assert(countAt(1) == n && countAt(2) == 2 * n && countAt(3) == 2 * n + 2,
      "versioned reads must reproduce each commit's visible state")
    // current read still serves the latest state
    assert(spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load().count() == 2 * n + 2)
    // out-of-range and unrecorded histories fail loudly
    intercept[Exception] { countAt(4) }
    intercept[Exception] {
      spark.read.format("graft.sources.BlockStoreSource")
        .option("store", BlockStore.ensureLoaded(spark, sf))
        .option("versionAsOf", "1").load().count()
    }
    BlockStore.dropStore(name)
  }

  test("grouped COUNT(*) pushdown is stats-served: zero readers, pushed plan") {
    val df = viaConnector.groupBy(col("lang"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("grouped-count[lang]"),
      s"grouped count must plan as the stats-served scan:\n$plan")
    val before = BlockStore.readersOpened.get()
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(BlockStore.readersOpened.get() == before,
      "grouped pushdown must open zero block readers")
    val want = Catalog.table(spark, sf, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "stats-served grouped count diverged from the data")
    // a FILTERED grouped count must NOT be stats-served (residual filters
    // block aggregate pushdown) and must still be correct
    val filtered = viaConnector.filter(col("doc_id") < 100)
      .groupBy(col("lang")).agg(count(org.apache.spark.sql.functions.lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("grouped-count"),
      "a filtered grouped count must fall back to a real scan")
    assert(filtered.collect().map(_.getLong(1)).sum == 100L)
  }

  test("columnar reads: vectorized for big blocks, row path for tiny ones") {
    // tiny blocks (the shared fixture, ~30 rows each) stay on the row
    // path — per-batch vector allocation would cost more than it saves
    val small = viaConnector
    assert(!small.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "tiny-block scan should not go columnar")
    // a store of production-sized blocks goes columnar
    val name = "columnar-spec-store"
    BlockStore.dropStore(name)
    val rows = (0 until 3000).map(i =>
      (i.toLong, s"text body $i", s"l${i % 3}", s"s${i % 5}", (i % 97).toLong)).toArray
    Seq(0, 1, 2).foreach { k =>
      BlockStore.stage(BlockStore.epochKey(name, 0), k,
        BlockStore.Block(k * 1000L, k * 1000L + 999,
          rows.slice(k * 1000, (k + 1) * 1000)))
    }
    BlockStore.commitEpoch(name, 0, Seq(0, 1, 2))
    val big = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"big-block scan should feed Spark's vectorized ColumnarToRow:\n$plan")
    // columnar path is byte-lossless, including UTF8 text and metadata cols
    val got = big.collect().map(_.toSeq.toVector).toSet
    assert(got == rows.map(r => Vector(r._1, r._2, r._3, r._4, r._5)).toSet,
      "columnar read diverged from the staged rows")
    val m = big.select(col("doc_id"), col("_block_rows"), col("_block_shard")).collect()
    assert(m.length == 3000 && m.forall(r => r.getLong(1) == 1000L && r.getInt(2) == -1))
    BlockStore.dropStore(name)
  }

  test("x44 plans COLUMNAR: ColumnarToRow over the connector scan on the registry query") {
    // sf0.01 is the driver's verify SF: 60k lineitem rows land ~3.8k-row
    // blocks, so the REGISTRY query itself (not just a synthetic store)
    // takes the vectorized path there
    val dir = "/root/testdata/sf0.01"
    val df = operators.Extended.queries("x44_columnar_scan")(spark, dir)
    // execute FIRST: the query aggregates (AQE-wrapped), and AQE inserts
    // the columnar transitions at stage creation — the final plan is the
    // one that shows them
    val got = df.collect().map(_.toSeq.toVector)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow") && plan.contains("graft-blocks"),
      s"x44 must plan the vectorized path over the connector scan:\n$plan")
    // and the scan prunes text: only the three aggregated columns decode
    assert(plan.contains("cols=lang,source,n_chars"),
      s"x44 scan must prune to the aggregated columns:\n$plan")
    val want = Catalog.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("lang"), col("l_linestatus").as("source"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("lang", "source").collect().map(_.toSeq.toVector)
    assert(got.sameElements(want), "columnar aggregate diverged from parquet")
  }

  test("planned scan pins its snapshot: a DELETE between plan and read cannot re-number blocks") {
    val name = "pin-spec-store"
    BlockStore.dropStore(name)
    Catalog.table(spark, sf, "documents")
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val n = Catalog.table(spark, sf, "documents").count()
    val df = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
    // force physical planning: planInputPartitions runs here and pins the
    // block array the partition indices refer to
    val rdd = df.queryExecution.toRdd
    assert(rdd.partitions.nonEmpty)
    // now a DELETE rewrites the visible array copy-on-write (positions shift)
    val deleted = BlockStore.deleteWhere(name,
      _ => true, (r: BlockStore.DocRow) => r._1 % 2 == 0)
    assert(deleted > 0, "fixture delete must remove rows")
    // the already-planned scan must still serve the blocks it indexed at
    // planning time — the pre-delete snapshot, not the rewritten array
    assert(rdd.count() == n,
      "planned partitions must resolve against the pinned snapshot")
    // a FRESH plan sees the post-delete state
    assert(spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load().count() == n - deleted)
    BlockStore.dropStore(name)
  }

  test("live streaming reader fences DELETE and truncating overwrite; stop lifts the fence") {
    val name = "fence-spec-store"
    BlockStore.dropStore(name)
    val docs = Catalog.table(spark, sf, "documents")
    docs.write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val ckpt = java.nio.file.Files
      .createTempDirectory("fence-spec-ckpt").toString
    val q = spark.readStream.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
      .writeStream.format("noop").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(BlockStore.liveStreamReaders(name) >= 1,
        "an active streaming query must register as a live reader")
      // positional offsets are checkpointed: a rewrite/re-number must refuse
      val exDel = intercept[Exception] {
        BlockStore.deleteWhere(name, _ => true,
          (r: BlockStore.DocRow) => r._1 % 2 == 0)
      }
      assert(exDel.getMessage.contains("streaming reader"),
        s"DELETE refusal must name the live stream: ${exDel.getMessage}")
      val exTrunc = intercept[Exception] {
        docs.limit(5).write.format("graft.sources.BlockStoreSource")
          .option("store", name).mode("overwrite").save()
      }
      assert(exTrunc.getMessage.contains("streaming reader") ||
        Option(exTrunc.getCause).exists(_.getMessage.contains("streaming reader")),
        s"overwrite refusal must name the live stream: ${exTrunc.getMessage}")
      // APPEND stays allowed — it only grows the tail, offsets stay sound
      docs.limit(5).write.format("graft.sources.BlockStoreSource")
        .option("store", name).mode("append").save()
      q.processAllAvailable()
    } finally q.stop()
    assert(BlockStore.liveStreamReaders(name) == 0,
      "stopping the query must deregister the live reader")
    // fence lifted: the same DELETE now succeeds
    assert(BlockStore.deleteWhere(name, _ => true,
      (r: BlockStore.DocRow) => r._1 % 2 == 0) > 0)
    BlockStore.dropStore(name)
  }

  test("OPTIMIZE bin-packs small blocks: fewer blocks, clustering kept, history intact") {
    val name = "optimize-spec-store"
    BlockStore.dropStore(name)
    val docs = Catalog.table(spark, sf, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val step = maxId / 8 + 1
    (0 until 8).foreach { k =>
      docs.filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
        .write.format("graft.sources.BlockStoreSource")
        .option("store", name).mode("append").save()
    }
    val fragmented = BlockStore.blockCount(name)
    assert(fragmented >= 32, s"fixture must fragment (got $fragmented blocks)")
    val versionBefore = BlockStore.currentVersion(name)
    val n = docs.count()
    val bigRows = 100L
    val (before, after) = BlockStore.optimize(name, targetRows = bigRows)
    assert(before == fragmented && after < before / 2,
      s"optimize must coalesce substantially ($before -> $after)")
    val blocks = BlockStore.blocks(name)
    // content identical, range clustering preserved: blocks sorted by
    // minId have non-overlapping [min,max] ranges and bound their rows
    assert(blocks.map(_.numRows).sum == n, "optimize changed the row count")
    val sorted = blocks.sortBy(_.minId)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxId < b.minId,
        "optimized blocks must keep disjoint key ranges (pruning relies on it)")
      case _ => ()
    }
    sorted.foreach(b => assert(b.rows.forall(r => r._1 >= b.minId && r._1 <= b.maxId)))
    // all-but-last packed to at least the target (bin-packing, not churn)
    assert(sorted.init.forall(_.numRows >= bigRows),
      "packed blocks must reach the target size")
    // a NEW version was recorded; the fragmented layout is still readable
    assert(BlockStore.currentVersion(name) == versionBefore + 1)
    val pre = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).option("versionAsOf", versionBefore.toString)
      .load().count()
    assert(pre == n, "pre-optimize version must stay time-travelable")
    // sharded stores refuse (SPJ co-location) and a live stream fences
    val (cur, _) = BlockStore.ensureShardedSnapshots(spark, sf)
    intercept[IllegalArgumentException] { BlockStore.optimize(cur, 100L) }
    BlockStore.dropStore(name)
  }

  test("a checkpointed stream refuses to replay a store rewritten while stopped") {
    // the live-reader fence cannot protect a STOPPED stream's persisted
    // checkpoint: a rewrite between stop and restart re-numbers positions.
    // Offsets embed the layout generation — the restart must fail loudly,
    // never silently serve re-numbered blocks.
    val name = "genfence-spec-store"
    BlockStore.dropStore(name)
    val base = java.nio.file.Files.createTempDirectory("genfence-spec")
    val docs = Catalog.table(spark, sf, "documents")
    docs.write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.BlockStoreSource")
        .option("store", name).load()
        .select(org.apache.spark.sql.functions.col("doc_id"))
        .writeStream.format("parquet").option("path", s"$base/data")
        .option("checkpointLocation", s"$base/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // run 1 drains and stops; the checkpoint persists
    // APPEND while stopped: positions stable, the restart must succeed
    docs.limit(5).write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("append").save()
    run()
    // REWRITE while stopped (no live readers — allowed, bumps generation):
    // the next restart over the same checkpoint must fail loudly
    BlockStore.optimize(name, targetRows = 10000L): Unit
    val ex = intercept[Exception] { run() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("layout generation")),
      s"restart over a rewritten store must name the generation fence: $ex")
    BlockStore.dropStore(name)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(base.toFile)
  }

  test("time-travel aliases stay out of storeNames and memory accounting") {
    val name = "alias-spec-store"
    BlockStore.dropStore(name)
    Catalog.table(spark, sf, "documents")
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("overwrite").save()
    val usedBefore = BlockStore.memoryUsed
    val namesBefore = BlockStore.storeNames.toSet
    // materialize a versioned read: the alias shares every Block reference
    val n = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).option("versionAsOf", "1").load().count()
    assert(n > 0)
    assert(BlockStore.storeNames.forall(!_.contains("@@v")),
      "snapshot aliases must not surface as catalog tables")
    assert(BlockStore.storeNames.toSet == namesBefore,
      "a versioned read must not add visible stores")
    assert(BlockStore.memoryUsed == usedBefore,
      "alias blocks are SHARED references — usage must not double-count them")
    BlockStore.dropStore(name)
  }

  test("concurrent batch writes stage under distinct job keys: both land " +
    "exactly once (no interleaved or lost commits)") {
    val name = "spec-conc-write"
    BlockStore.dropStore(name)
    def part(lo: Long) = spark.range(lo, lo + 500).selectExpr(
      "id as doc_id", "concat('t', id) as text", "'en' as lang",
      "'s0' as source", "id % 7 as n_chars")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(0L, 100000L).map { lo =>
      val t = new Thread(() => {
        try part(lo).write.format("graft.sources.BlockStoreSource")
          .option("store", name).mode("append").save()
        catch { case e: Throwable => errors.add(e): Unit }
      })
      t.start(); t
    }
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive) && errors.isEmpty,
      s"concurrent write failed: ${Option(errors.peek())}")
    val got = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toVector
    val expected = ((0L until 500L) ++ (100000L until 100500L)).toVector
    assert(got == expected,
      s"concurrent batch writes interleaved or lost rows: got ${got.size} " +
        s"rows, expected ${expected.size}")
    BlockStore.dropStore(name)
  }

  test("V2 write into an SPJ-sharded store is refused loudly") {
    val (cur, _) = BlockStore.ensureShardedSnapshots(spark, sf)
    val e = intercept[Exception] {
      spark.range(0, 5).selectExpr("id as doc_id", "'x' as text",
          "'en' as lang", "'s0' as source", "id as n_chars")
        .write.format("graft.sources.BlockStoreSource")
        .option("store", cur).mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("SPJ-sharded")),
      s"sharded-store write must refuse loudly, got: ${msgs(e).take(3)}")
    // the refused write must not have mutated the fixture
    val n = spark.table(s"graftblocks.`$cur`").count()
    assert(n > 0 && BlockStore.stagedCount(cur) == 0)
  }

  test("MIN/MAX over an emptied store declines the stats pushdown and " +
    "returns SQL's NULL") {
    val name = "spec-empty-agg"
    BlockStore.dropStore(name)
    spark.range(0, 50).selectExpr("id as doc_id", "'x' as text",
        "'en' as lang", "'s0' as source", "id as n_chars")
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("append").save()
    assert(BlockStore.deleteWhere(name, _ => true, _ => true) == 50L)
    def table = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).load()
    val agg = table.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    assert(!agg.queryExecution.executedPlan.toString.contains("STATS-ONLY"),
      "an empty store must decline the metadata-agg pushdown")
    val row = agg.head()
    assert(row.isNullAt(0) && row.isNullAt(1),
      s"MIN/MAX over an empty store must be NULL, got $row")
    // COUNT(*) = 0 keeps working (with or without the pushdown)
    assert(table.count() == 0L)
    BlockStore.dropStore(name)
  }

  test("partial drop of the SPJ fixture rebuilds BOTH snapshots without " +
    "duplicating the survivor") {
    val (cur, prev) = BlockStore.ensureShardedSnapshots(spark, sf)
    val (nCur, nPrev) = (spark.table(s"graftblocks.`$cur`").count(),
      spark.table(s"graftblocks.`$prev`").count())
    assert(nCur > 0 && nPrev > 0)
    // drop only the PREVIOUS snapshot: the old guard (on spj_cur alone)
    // would never rebuild it -> empty store with no error
    BlockStore.dropStore(prev)
    BlockStore.ensureShardedSnapshots(spark, sf)
    assert(spark.table(s"graftblocks.`$prev`").count() == nPrev,
      "dropped snapshot must be rebuilt to its exact row count")
    // and the surviving half must NOT have been double-loaded
    assert(spark.table(s"graftblocks.`$cur`").count() == nCur,
      "surviving snapshot must not be re-appended (doubled rows)")
    val ids = spark.table(s"graftblocks.`$cur`")
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate doc_ids after rebuild")
  }

  test("history-retained blocks are budget-visible: a rewritten-away " +
    "version can demote and still serves time travel") {
    val name = "spec-history-budget"
    BlockStore.dropStore(name)
    spark.range(0, 400).selectExpr("id as doc_id",
        "repeat('x', 200) as text", "'en' as lang", "'s0' as source",
        "id as n_chars")
      .write.format("graft.sources.BlockStoreSource")
      .option("store", name).mode("append").save()
    val v1 = BlockStore.currentVersion(name)
    // rewrite: v1's blocks survive ONLY through history
    assert(BlockStore.deleteWhere(name, _ => true, _._1 < 300L) == 300L)
    try {
      BlockStore.setMemoryBudget(1L) // force demotion of everything visible
      val used = BlockStore.memoryUsed
      assert(used <= 4096L,
        s"history-retained payloads must be demotable under budget " +
          s"(memoryUsed=$used after budget 1)")
      // the demoted historical version still reads back exactly
      val old = spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).option("versionAsOf", v1.toString).load()
        .count()
      assert(old == 400L, s"time-travel read after demotion lost rows: $old")
    } finally BlockStore.resetMemoryBudget()
    BlockStore.dropStore(name)
  }
}
