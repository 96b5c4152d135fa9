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

  final case class Block(minId: Long, maxId: Long, rows: Array[DocRow]) {
    def numRows: Long = rows.length.toLong
    /** Approximate in-memory payload size — computed once at put time (the
      * daemon knows its block sizes without re-reading payloads). */
    val bytes: Long =
      rows.iterator.map(r => 24L + r._2.length + r._3.length + r._4.length).sum
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
