package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import graft.Catalog
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col

/** The in-memory BLOCK STORE behind [[BlockStoreSource]] — the engine's
  * analogue of the reference daemon's put/get surface
  * (`deploy/Daemon.scala:45-75`: `putBlock` → memory store, `getBlock` →
  * serve bytes to a later reader), re-expressed as the storage half of a
  * Spark DataSourceV2 connector instead of a bespoke RPC protocol.
  *
  * Blocks are written EXECUTOR-SIDE (`ensureLoaded` runs a
  * `foreachPartition` job — each task puts its own partition's rows, no
  * driver funnel, matching the daemon's "map task pushes its block"
  * shape) and carry min/max key stats, the `getShuffleStatus` metadata
  * the read side prunes on. The store is JVM-local: exactly the
  * reference's deployment assumption (a daemon co-resident with the
  * executors holding blocks in memory), which `local[32]` satisfies with
  * executors and driver in one JVM. On a multi-node cluster this object
  * is the piece that becomes a per-node service; the CONNECTOR half
  * ([[BlockStoreSource]]) is deployment-independent — `planInputPartitions`
  * / `PartitionReader` would fetch from the local daemon instance the
  * same way.
  *
  * Rows are held as plain Scala tuples, not `InternalRow`: the read path
  * materializes `UTF8String`s only for the columns the scan actually
  * requires, so column pruning saves real decode work per row — the same
  * economics as parquet's column skipping, observable in the spec.
  */
object BlockStore {

  /** (doc_id, text, lang, source, n_chars) — [[graft.Catalog.documents]]
    * field order. */
  type DocRow = (Long, String, String, String, Long)

  final case class Block(minId: Long, maxId: Long, rows: Array[DocRow],
      shard: Int = -1) {
    def numRows: Long = rows.length.toLong
    /** Approximate in-memory payload size — computed once at put time (the
      * daemon knows its block sizes without re-reading payloads). */
    val bytes: Long =
      rows.iterator.map(r => 24L + r._2.length + r._3.length + r._4.length).sum
    /** Per-block DICTIONARY stats for the low-cardinality columns —
      * parquet's dictionary-page trick on the daemon's metadata surface:
      * computed once at put time, consulted by the scan to skip whole
      * blocks for lang/source equality predicates. Both columns are
      * bounded-cardinality by construction (languages, crawl sources), so
      * the sets cost a few dozen bytes per block at any corpus size. */
    val langs: Set[String] = rows.iterator.map(_._3).toSet
    val sources: Set[String] = rows.iterator.map(_._4).toSet
  }

  private val stores = new ConcurrentHashMap[String, Array[Block]]()

  /** Readers opened since JVM start — the pruning spec diffs this around
    * scans to count how many blocks a query actually touched. */
  val readersOpened = new AtomicLong(0)

  private[sources] def put(name: String, block: Block): Unit = {
    stores.compute(name, (_, v) =>
      if (v == null) Array(block) else v :+ block): Unit
  }

  // ---- write-path staging (the putBlock → commit visibility protocol) ----
  //
  // A task's DataWriter stages its block here at TASK commit (the block
  // lands on the "daemon" immediately, executor-side — the reference's
  // putBlock); the block becomes VISIBLE to readers only when the driver's
  // JOB commit promotes the staged set atomically. An aborted job leaves
  // the visible store untouched and the staging area is discarded — the
  // exactly-once story every V2 sink owes its readers.

  private val staged =
    new ConcurrentHashMap[String, ConcurrentHashMap[Int, Block]]()

  private[sources] def stage(name: String, partitionId: Int, b: Block): Unit = {
    staged.computeIfAbsent(name, _ => new ConcurrentHashMap[Int, Block]())
      .put(partitionId, b): Unit
  }

  /** Promote staged blocks (in partitionId order — deterministic store
    * layout regardless of task finish order) and drop the staging area.
    * `truncate` replaces the visible store (overwrite mode); otherwise
    * the promoted blocks append. */
  private[sources] def promote(name: String, partitionIds: Seq[Int],
      truncate: Boolean): Unit = {
    val s = staged.remove(name)
    val blocks: Array[Block] =
      if (s == null) Array.empty
      else partitionIds.sorted.flatMap(pid => Option(s.get(pid))).toArray
    stores.compute(name, (_, v) =>
      if (truncate || v == null) blocks else v ++ blocks): Unit
  }

  private[sources] def discardStaged(name: String): Unit = {
    staged.remove(name): Unit
  }

  /** Staged (not yet visible) block count — the spec asserts this drains
    * to zero after a successful commit. */
  def stagedCount(name: String): Int = {
    val s = staged.get(name)
    if (s == null) 0 else s.size()
  }

  private[sources] def get(name: String): Array[Block] = {
    val b = stores.get(name)
    if (b == null) Array.empty else b
  }

  def blockCount(name: String): Int = get(name).length

  /** Max doc_id across the store's block stats (the metadata a reader
    * consults without touching any block payload). */
  def maxDocId(name: String): Long = get(name).map(_.maxId).max

  /** Per-block (minId, maxId) stats — what `getShuffleStatus` exposes. */
  def blockStats(name: String): Seq[(Long, Long)] =
    get(name).map(b => (b.minId, b.maxId)).toSeq

  // ---- co-registered SHARDED stores (the storage-partitioned-join pair) --
  //
  // The reference's registerShuffles co-places MULTIPLE shuffles under ONE
  // partitioner so a downstream two-input stage reads co-located inputs
  // (`MapOutputTracker.scala:219-255` in the reference). The Spark-native
  // form: every sharded store is laid out by the SAME deterministic
  // range-shard function (shard = doc_id / width, width fixed per corpus),
  // each shard's rows land in one block tagged with its shard id, and the
  // connector's scan reports that layout as a KeyGroupedPartitioning — so a
  // join of two such stores on doc_id plans with NO Exchange on either side
  // (see [[GraftBlockCatalog]] and the SPJ wiring in [[BlockStoreSource]]).
  // Fixed-WIDTH range sharding (not sampled range boundaries) is what makes
  // two independently-written stores co-located: the shard of a row depends
  // only on (width, doc_id), never on either store's distribution. Blocks
  // stay contiguous doc_id ranges, so min/max stats pruning keeps working.

  /** store name → (numShards, shardWidth); presence marks a store SPJ-ready. */
  private val shardedMeta = new ConcurrentHashMap[String, (Int, Long)]()

  def shardingOf(name: String): Option[(Int, Long)] =
    Option(shardedMeta.get(name))

  /** All visible store names (the catalog's listTables surface). */
  def storeNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    stores.keySet().asScala.toSeq.sorted
  }

  val SpjShards = 16

  /** Write `df` (documents schema) as a sharded store: one block per shard,
    * shard = doc_id / width, EVERY shard present (empty blocks included, so
    * two co-registered stores always expose identical partition-key sets to
    * the join planner). Executor-side puts, like [[ensureLoaded]]. */
  private def loadSharded(spark: SparkSession, name: String,
      df: org.apache.spark.sql.DataFrame, width: Long): Unit = {
    val n = SpjShards
    // The catalog's bucket transform carries the width as an Int parameter
    // (Expressions.bucket), and shard placement assumes non-negative ids —
    // outside either range rows would silently mis-place (truncated width)
    // or crash the partitioner (negative shard). Fail loudly instead.
    require(width > 0 && width <= Int.MaxValue,
      s"loadSharded: shard width $width outside (0, Int.MaxValue] — " +
        "corpus id range exceeds the bucket transform's Int parameter")
    df.rdd
      .map { r =>
        val id = r.getLong(0)
        require(id >= 0, s"loadSharded: negative doc_id $id — shard " +
          "placement id/width assumes non-negative ids")
        ((id / width).toInt,
          (id, r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .foreachPartition { it: Iterator[(Int, DocRow)] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.map(_._2).toArray
        val (mn, mx) =
          if (rows.isEmpty) (Long.MaxValue, Long.MinValue)
          else (rows.iterator.map(_._1).min, rows.iterator.map(_._1).max)
        put(name, Block(mn, mx, rows, shard = pid))
      }
    shardedMeta.put(name, (n, width)): Unit
  }

  /** Two co-registered corpus snapshots for the SPJ query (x37): the full
    * corpus and a deterministic "previous snapshot" subset, both sharded by
    * the SAME width so their blocks are co-located by construction. Returns
    * the (current, previous) store names. */
  def ensureShardedSnapshots(spark: SparkSession, dir: String): (String, String) =
    synchronized {
      val a = s"spj_cur@$dir"
      val b = s"spj_prev@$dir"
      if (!stores.containsKey(a)) {
        val docs = Catalog.table(spark, dir, "documents")
        val maxId = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
          .head.getLong(0)
        val width = maxId / SpjShards + 1 // id/width < SpjShards for all ids
        loadSharded(spark, a, docs, width)
        loadSharded(spark, b, docs.filter(col("doc_id") % 3 =!= 0), width)
      }
      (a, b)
    }

  /** Load `documents` clustered by LANG (one-or-few langs per block) —
    * the layout a per-language corpus ingest lands naturally, and the one
    * where the blocks' dictionary stats actually prune: on the doc_id
    * range layout every block mixes all languages and a lang predicate
    * can skip nothing. Used by the dictionary-pruning spec. */
  def ensureLangClustered(spark: SparkSession, dir: String): String = synchronized {
    val name = s"bylang:$dir"
    if (!stores.containsKey(name)) {
      Catalog.table(spark, dir, "documents")
        .repartition(8, col("lang"))
        .foreachPartition { it: Iterator[Row] =>
          val rows = it.map(r => (r.getLong(0), r.getString(1),
            r.getString(2), r.getString(3), r.getLong(4))).toArray
          if (rows.nonEmpty)
            put(name, Block(rows.iterator.map(_._1).min,
              rows.iterator.map(_._1).max, rows))
        }
    }
    name
  }

  /** Load `documents` into the store once per (JVM, sf dir) and return the
    * store name. Rows are RANGE-partitioned on doc_id before the put so
    * each block carries tight min/max bounds — the same clustering-for-
    * stats discipline as x31's layout (hash-partitioned blocks would all
    * span the full key range and prune nothing). */
  def ensureLoaded(spark: SparkSession, dir: String): String = synchronized {
    val name = s"documents:$dir"
    if (!stores.containsKey(name)) {
      Catalog.table(spark, dir, "documents")
        .repartitionByRange(16, col("doc_id"))
        .foreachPartition { it: Iterator[Row] =>
          val rows = it.map(r => (r.getLong(0), r.getString(1),
            r.getString(2), r.getString(3), r.getLong(4))).toArray
          if (rows.nonEmpty)
            put(name, Block(rows.iterator.map(_._1).min,
              rows.iterator.map(_._1).max, rows))
        }
    }
    name
  }
}
