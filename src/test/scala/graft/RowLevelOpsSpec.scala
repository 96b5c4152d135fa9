package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row-level MERGE / UPDATE / rewrite-DELETE on the block store (x46):
  * group-based copy-on-write at BLOCK granularity. The load-bearing
  * properties, each asserted here:
  *   - untouched blocks survive a merge as the SAME objects (reference
  *     identity) — runtime group filtering + min/max stats keep the
  *     rewrite from touching blocks the statement cannot affect;
  *   - the commit is one atomic layout rewrite: generation advances by
  *     exactly 2 (the parity seqlock), one new time-travel version, and
  *     the pre-merge version still serves the old rows;
  *   - a stale planned generation refuses the commit (optimistic
  *     validate-and-swap), and sharded stores refuse rewrites outright;
  *   - statements the store previously could not run at all (MERGE,
  *     UPDATE, residual-predicate DELETE) produce exactly the declarative
  *     expected state, while metadata-translatable DELETEs keep the x39
  *     fast path (no block payload scans). */
class RowLevelOpsSpec extends SparkSpec {

  private def connector(name: String) = spark.read
    .format("graft.sources.BlockStoreSource").option("store", name).load()

  /** Land EXACTLY one block per doc_id range through the staging API (the
    * V2 writer's RequiresDistributionAndOrdering fans every job out to its
    * fixed 16 partitions — the r11 lesson — so block-identity tests build
    * their layout below it). Content deterministic off the id; `langOf`
    * lets a test control each block's dictionary. */
  private def landBlocks(name: String, ranges: Seq[(Long, Long)],
      langOf: Long => String =
        id => if (id % 2 == 0) "en" else "de"): Unit = {
    BlockStore.dropStore(name)
    ranges.zipWithIndex.foreach { case ((s, e), i) =>
      val rows = (s until e).map(id =>
        (id, s"t-$id", langOf(id), "spec", id % 97): BlockStore.DocRow).toArray
      BlockStore.stage(s"$name##land", i, BlockStore.Block(s, e - 1, rows))
    }
    BlockStore.promoteInto(s"$name##land", name, ranges.indices,
      truncate = false)
  }

  private def withTable(table: String, store: String)(body: => Unit): Unit = {
    spark.sql(s"""CREATE TABLE IF NOT EXISTS $table
                 |USING graft.sources.BlockStoreSource
                 |OPTIONS (store '$store')""".stripMargin)
    try body
    finally {
      try spark.sql(s"DROP TABLE IF EXISTS $table") catch { case _: Exception => }
      BlockStore.dropStore(store)
    }
  }

  test("MERGE rewrites only the blocks its keys can touch; commit is one " +
    "versioned generation bump; pre-merge version time-travels") {
    val store = "rlo-merge"
    landBlocks(store, Seq((0L, 100L), (100L, 200L), (200L, 300L), (300L, 400L)))
    withTable("spec_cow_merge", store) {
      val before = BlockStore.blocks(store).toArray
      assert(before.length == 4)
      val genBefore = BlockStore.stableLayoutGeneration(store)
      val verBefore = BlockStore.currentVersion(store)
      // source touches ONLY ids inside block 2's [200, 300) range, plus
      // one brand-new id far outside every block
      spark.createDataFrame(Seq(
        (205L, "u-205", "xx", "spec", 1000L),
        (287L, "u-287", "xx", "spec", 1000L),
        (9999L, "new-9999", "new", "spec", 7L)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .createOrReplaceTempView("cow_upd")
      try {
        spark.sql(
          """MERGE INTO spec_cow_merge t USING cow_upd s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars, lang = s.lang
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      } finally spark.catalog.dropTempView("cow_upd")

      val after = BlockStore.blocks(store).toArray
      // blocks 0, 1, 3 never matched a source key: same OBJECTS, not
      // equal copies — the copy-on-write granularity claim
      Seq(0, 1, 3).foreach { i =>
        assert(after.exists(_ eq before(i)),
          s"untouched block $i was rewritten — group filtering failed " +
            s"(before=${before.length} blocks, after=${after.length})")
      }
      assert(!after.exists(_ eq before(2)), "matched block 2 must be replaced")
      // one atomic rewrite: parity seqlock moved by exactly 2, one new
      // time-travel version
      assert(BlockStore.stableLayoutGeneration(store) == genBefore + 2,
        "MERGE must bump the layout generation exactly once (by 2)")
      assert(BlockStore.currentVersion(store) == verBefore + 1)
      // post-merge content: two updates applied, one insert appended
      val got = connector(store)
        .filter(col("doc_id").isin(205L, 287L, 9999L, 206L))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      assert(got(205L) == (("xx", 1000L)) && got(287L) == (("xx", 1000L)))
      assert(got(9999L) == (("new", 7L)))
      assert(got(206L) == (("en", 206L % 97)), "carried-over row changed")
      assert(connector(store).count() == 401)
      // snapshot isolation half: the pre-merge version still serves the
      // old rows (blocks shared between versions, never copied)
      val oldRead = spark.read.format("graft.sources.BlockStoreSource")
        .option("store", store).option("versionAsOf", verBefore.toString).load()
      assert(oldRead.count() == 400)
      assert(oldRead.filter(col("doc_id") === 205L).head().getAs[Long]("n_chars")
        == 205L % 97, "pre-merge version must serve the pre-merge row")
    }
  }

  test("insert-only MERGE appends without rewriting any existing block") {
    val store = "rlo-insert"
    landBlocks(store, Seq((0L, 50L), (50L, 100L)))
    withTable("spec_cow_insert", store) {
      val before = BlockStore.blocks(store).toArray
      spark.createDataFrame(Seq((5000L, "n", "new", "spec", 1L)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .createOrReplaceTempView("cow_ins")
      try {
        spark.sql(
          """MERGE INTO spec_cow_insert t USING cow_ins s
            |ON t.doc_id = s.doc_id
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      } finally spark.catalog.dropTempView("cow_ins")
      val after = BlockStore.blocks(store).toArray
      before.foreach(b => assert(after.exists(_ eq b),
        "insert-only merge rewrote an existing block"))
      assert(connector(store).count() == 101)
    }
  }

  test("UPDATE plans the same copy-on-write rewrite with static pruning") {
    val store = "rlo-update"
    // block 1 is all-'en' rows, block 0 mixed — an UPDATE on lang='de'
    // must leave the all-'en' block untouched (dictionary stats)
    landBlocks(store, Seq((0L, 100L), (100L, 200L)),
      langOf = id => if (id >= 100 || id % 2 == 0) "en" else "de")
    withTable("spec_cow_update", store) {
      val before = BlockStore.blocks(store).toArray
      spark.sql(
        "UPDATE spec_cow_update SET n_chars = n_chars + 1000 WHERE lang = 'de'")
      val after = BlockStore.blocks(store).toArray
      assert(after.exists(_ eq before(1)),
        "all-'en' block rewritten by a lang='de' UPDATE — dictionary " +
          "pruning failed on the COW scan")
      assert(!after.exists(_ eq before(0)), "mixed block must be replaced")
      val sums = connector(store).groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("s")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val deWant = (1L until 100L by 2).map(id => id % 97 + 1000L).sum
      val enWant = (0L until 100L by 2).map(_ % 97).sum +
        (100L until 200L).map(_ % 97).sum
      assert(sums == Map("de" -> deWant, "en" -> enWant))
    }
  }

  test("residual-predicate DELETE (previously refused) runs copy-on-write; " +
    "translatable DELETE keeps the metadata fast path") {
    val store = "rlo-delete"
    landBlocks(store, Seq((0L, 100L), (100L, 200L)))
    withTable("spec_cow_delete", store) {
      // n_chars % 2 = 1 does not translate to block stats: the old
      // SupportsDelete-only table failed this statement at analysis; with
      // row-level operations it now plans a group-based rewrite
      val odd = connector(store).filter(col("n_chars") % 2 === 1).count()
      spark.sql("DELETE FROM spec_cow_delete WHERE n_chars % 2 = 1")
      assert(connector(store).count() == 200 - odd)
      // translatable DELETE still routes to deleteWhere (the x39 path):
      // generation bumps, and the scanned-blocks counter moves while no
      // COW write job runs (no new version from a replaceBlocks commit
      // carrying staged blocks — deleteWhere versions too, so count the
      // evidence on the delete counters instead)
      val scannedBefore = BlockStore.deleteScanned.get()
      spark.sql("DELETE FROM spec_cow_delete WHERE doc_id >= 150")
      assert(BlockStore.deleteScanned.get() > scannedBefore,
        "translatable DELETE bypassed the metadata deleteWhere path")
      assert(connector(store).filter(col("doc_id") >= 150).count() == 0)
    }
  }

  test("appends between rewrite plan and commit survive it (snapshot " +
    "semantics: appends don't bump the generation, rewrites validate it)") {
    val store = "rlo-snap"
    landBlocks(store, Seq((0L, 10L), (10L, 20L)))
    try {
      val victims = Array(BlockStore.blocks(store).head) // "plan": block 0
      val gen = BlockStore.stableLayoutGeneration(store)
      // a concurrent APPEND lands between plan and commit — appends keep
      // positional stream offsets sound, so they must NOT bump the
      // generation, and the rewrite must neither refuse nor eat them
      BlockStore.stage(s"$store##late", 0,
        BlockStore.Block(100L, 100L, Array((100L, "late", "en", "spec", 1L))))
      BlockStore.promoteInto(s"$store##late", store, Seq(0), truncate = false)
      assert(BlockStore.stableLayoutGeneration(store) == gen,
        "appends must not bump the layout generation")
      BlockStore.stage(s"$store##cow-z", 0, BlockStore.Block(0L, 4L,
        (0L until 5L).map(id =>
          (id, s"r-$id", "en", "spec", 0L): BlockStore.DocRow).toArray))
      BlockStore.replaceBlocks(s"$store##cow-z", store, Seq(0), victims, gen)
      val ids = connector(store).select(col("doc_id")).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(ids == ((0L until 5L) ++ (10L until 20L) :+ 100L).sorted,
        "the concurrent append must survive the commit; victims replaced")
    } finally BlockStore.dropStore(store)
  }

  test("a stale planned generation refuses the rewrite commit (optimistic " +
    "validate-and-swap); sharded stores refuse rewrites outright") {
    val store = "rlo-stale"
    landBlocks(store, Seq((0L, 10L)))
    try {
      val victims = BlockStore.blocks(store).toArray
      val gen = BlockStore.stableLayoutGeneration(store)
      // a concurrent rewrite lands between plan and commit
      BlockStore.deleteWhere(store, _ => true, _._1 == 0L): Unit
      val ex = intercept[IllegalArgumentException] {
        BlockStore.replaceBlocks("rlo-stale##cow-x", store, Seq.empty,
          victims, gen)
      }
      assert(ex.getMessage.contains("concurrent layout rewrite"))
      // victims without a planned generation is a contract violation
      val ex2 = intercept[IllegalArgumentException] {
        BlockStore.replaceBlocks("rlo-stale##cow-y", store, Seq.empty,
          BlockStore.blocks(store).toArray, -1L)
      }
      assert(ex2.getMessage.contains("no planned generation"))
      // SPJ-sharded stores refuse rewrites outright: rewritten blocks carry
      // no shard assignment, so they'd be invisible to key-grouped scans —
      // and the sharded scan branch never records a plan, so without this
      // require the commit would take the pure-append path and DUPLICATE
      // every matched row (refusal checked before any staging mutation; the
      // shared x37 fixture stays pristine)
      val (sharded, _) = BlockStore.ensureShardedSnapshots(spark, sf)
      val ex3 = intercept[IllegalArgumentException] {
        BlockStore.replaceBlocks("rlo-shard##cow", sharded, Seq.empty,
          Array.empty, BlockStore.stableLayoutGeneration(sharded))
      }
      assert(ex3.getMessage.contains("SPJ-sharded"))
    } finally BlockStore.dropStore(store)
  }

  test("MERGE with WHEN NOT MATCHED BY SOURCE deletes unmatched target " +
    "rows — and the rewrite must scan (and replace) EVERY block") {
    val store = "rlo-nmbs"
    landBlocks(store, Seq((0L, 100L), (100L, 200L), (200L, 300L)))
    withTable("spec_cow_nmbs", store) {
      val before = BlockStore.blocks(store).toArray
      assert(before.length == 3)
      // source touches only block 1's range plus one new id — but the
      // NOT MATCHED BY SOURCE clause makes every target row a participant
      // (any block may hold rows with no source match), so runtime group
      // filtering cannot exonerate anything: the price of the third
      // clause is a full-store rewrite, asserted below by reference.
      spark.createDataFrame(Seq(
        (150L, "u-150", "xx", "spec", 1000L),
        (9000L, "new-9000", "new", "spec", 7L)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .createOrReplaceTempView("cow_nmbs")
      try {
        spark.sql(
          """MERGE INTO spec_cow_nmbs t USING cow_nmbs s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars, lang = s.lang
            |WHEN NOT MATCHED THEN INSERT *
            |WHEN NOT MATCHED BY SOURCE AND t.doc_id % 10 = 3 THEN DELETE
            |""".stripMargin)
      } finally spark.catalog.dropTempView("cow_nmbs")
      val after = BlockStore.blocks(store).toArray
      before.zipWithIndex.foreach { case (b, i) =>
        assert(!after.exists(_ eq b),
          s"block $i survived a NOT-MATCHED-BY-SOURCE merge by reference — " +
            "the clause requires scanning every block")
      }
      // declarative post-state: 30 deletions (doc_id % 10 == 3 in [0,300)),
      // one update, one insert
      assert(connector(store).count() == 300 - 30 + 1)
      assert(connector(store).filter(col("doc_id") % 10 === 3).count() == 0)
      val got = connector(store).filter(col("doc_id").isin(150L, 9000L))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("lang"), r.getAs[Long]("n_chars")))).toMap
      assert(got(150L) == (("xx", 1000L)) && got(9000L) == (("new", 7L)))
    }
  }

  test("duplicate source matches per target row fail the MERGE " +
    "cardinality guard and leave the store untouched") {
    val store = "rlo-card"
    landBlocks(store, Seq((0L, 50L)))
    withTable("spec_cow_card", store) {
      val genBefore = BlockStore.stableLayoutGeneration(store)
      val verBefore = BlockStore.currentVersion(store)
      // two source rows match target doc_id 42: SQL MERGE requires this
      // to FAIL (a target row may be updated by at most one source row)
      spark.createDataFrame(Seq(
        (42L, "a", "xx", "spec", 1L), (42L, "b", "yy", "spec", 2L)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .createOrReplaceTempView("cow_card")
      try {
        val ex = intercept[Exception] {
          spark.sql(
            """MERGE INTO spec_cow_card t USING cow_card s
              |ON t.doc_id = s.doc_id
              |WHEN MATCHED THEN UPDATE SET lang = s.lang
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        def chain(e: Throwable): Seq[Throwable] =
          Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq
        assert(chain(ex).exists(c =>
          String.valueOf(c.getMessage).contains("MERGE_CARDINALITY_VIOLATION")),
          s"expected the SQL cardinality violation, got: $ex")
      } finally spark.catalog.dropTempView("cow_card")
      // the failed rewrite must abort cleanly: no layout change, no new
      // version, no row changed, no leaked staging
      assert(BlockStore.stableLayoutGeneration(store) == genBefore)
      assert(BlockStore.currentVersion(store) == verBefore)
      assert(connector(store).count() == 50)
      assert(connector(store).filter(col("doc_id") === 42L)
        .head().getAs[String]("lang") == "en")
    }
  }
}
