package graft.sources

import java.util

import graft.Catalog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** x32: a full DataSourceV2 CONNECTOR over [[BlockStore]] — the
  * reference's `getBlock` read path (`deploy/Daemon.scala:66-75`,
  * `MapOutputTracker.getShuffleStatus` placement metadata) expressed
  * through Spark's public source API rather than a bespoke reader:
  *
  *   - `planInputPartitions` consults block min/max STATS and prunes
  *     blocks outside the pushed doc_id bounds — the metadata lookup the
  *     reference performs before any fetch, and the same file/row-group
  *     skipping contract parquet scans get from footers;
  *   - `SupportsPushDownFilters` accepts doc_id range predicates for that
  *     pruning but returns EVERY filter as residual: stats pruning is
  *     sound but not exact at row granularity, so Spark re-applies the
  *     predicate above the scan (parquet's discipline exactly — a pushed
  *     filter that is also fully applied may return an empty residual,
  *     but bounds checked only against block stats may NOT);
  *   - `SupportsPushDownRequiredColumns` prunes the materialized columns:
  *     the reader allocates `UTF8String`s only for requested fields, so a
  *     projection that drops `text` skips the dominant decode cost;
  *   - the `Scan.description` carries the pushed bounds and surviving
  *     columns, so `.explain` shows the pushdown the way a parquet scan
  *     shows `PushedFilters`/`ReadSchema` (spec-asserted).
  *
  * Usage: `spark.read.format("graft.sources.BlockStoreSource")
  * .option("store", name).load()`. The connector half is
  * deployment-independent; see [[BlockStore]] for the JVM-local daemon
  * assumption. */
class BlockStoreSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Catalog.documents

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // a forgotten option otherwise flows a null store name into every
    // downstream map lookup and surfaces as an NPE far from the mistake
    val store = properties.get("store")
    require(store != null && store.nonEmpty,
      "graft.sources.BlockStoreSource requires the 'store' option " +
        "(.option(\"store\", <name>))")
    new BlockStoreTable(store, schema)
  }
}

private[sources] class BlockStoreTable(store: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** Row-level operations (x46): MERGE / UPDATE / non-metadata DELETE plan
    * as group-based copy-on-write rewrites over block-granular groups (see
    * [[GraftRowLevelOperation]]). Metadata-translatable DELETEs keep the
    * [[deleteWhere]] fast path — Spark's OptimizeMetadataOnlyDeleteFromTable
    * restores it when every conjunct translates — so declaring row-level
    * support upgrades the previously-refused statements (MERGE, UPDATE,
    * residual-predicate DELETE) without touching the x39 path. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
      override def build()
          : org.apache.spark.sql.connector.write.RowLevelOperation =
        new GraftRowLevelOperation(store, tableSchema, info.command())
    }

  /** Hidden METADATA columns (x40 — parquet's `_metadata` contract on the
    * block store): each row can expose its enclosing block's placement
    * metadata. Resolved only when referenced by name; block-constant, so
    * the reader materializes them per segment, never per row. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_block_shard"
      override def dataType() = org.apache.spark.sql.types.IntegerType
      override def comment(): String =
        "range-shard id of the row's block (-1 for unsharded stores)"
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_block_rows"
      override def dataType() = org.apache.spark.sql.types.LongType
      override def comment(): String = "row count of the row's block"
    })

  /** Translate one DELETE conjunct into (stats pre-filter, row predicate).
    * Supported: doc_id equality/range/In (checked against block min/max)
    * and lang/source equality/In (checked against block dictionaries) —
    * exactly the predicates the stats can pre-prune, so an accepted DELETE
    * never scans a block its metadata can exonerate. None ⇒ unsupported ⇒
    * `canDeleteWhere` = false and Spark fails the statement at analysis
    * (this table has no row-level-operation fallback; a silent partial
    * delete would be worse than a loud refusal). */
  private def translate(f: Filter)
      : Option[(BlockStore.Block => Boolean, BlockStore.DocRow => Boolean)] = {
    def lv(v: Any): Long = v.asInstanceOf[Number].longValue
    def sv(v: Any): String = String.valueOf(v)
    f match {
      case org.apache.spark.sql.sources.AlwaysTrue() =>
        Some((_ => true, _ => true))
      case EqualTo("doc_id", v) =>
        val n = lv(v); Some((b => b.minId <= n && n <= b.maxId, _._1 == n))
      case In("doc_id", vs) =>
        val ns = vs.map(lv).toSet
        Some((b => ns.exists(n => b.minId <= n && n <= b.maxId),
          r => ns.contains(r._1)))
      case GreaterThan("doc_id", v) =>
        val n = lv(v); Some((b => b.maxId > n, _._1 > n))
      case GreaterThanOrEqual("doc_id", v) =>
        val n = lv(v); Some((b => b.maxId >= n, _._1 >= n))
      case LessThan("doc_id", v) =>
        val n = lv(v); Some((b => b.minId < n, _._1 < n))
      case LessThanOrEqual("doc_id", v) =>
        val n = lv(v); Some((b => b.minId <= n, _._1 <= n))
      case EqualTo("lang", v) =>
        val s = sv(v); Some((b => b.langs.contains(s), _._3 == s))
      case In("lang", vs) =>
        val ss = vs.map(sv).toSet
        Some((b => b.langs.exists(ss), r => ss.contains(r._3)))
      case EqualTo("source", v) =>
        val s = sv(v); Some((b => b.sources.contains(s), _._4 == s))
      case In("source", vs) =>
        val ss = vs.map(sv).toSet
        Some((b => b.sources.exists(ss), r => ss.contains(r._4)))
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(translate(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val preds = filters.map(f => translate(f).getOrElse(
      throw new IllegalArgumentException(s"unsupported DELETE filter: $f")))
    BlockStore.deleteWhere(store,
      b => preds.forall(_._1(b)), r => preds.forall(_._2(r))): Unit
  }

  override def name(): String = s"graft-blocks:$store"
  override def schema(): StructType = tableSchema
  /** Sharded stores advertise their layout as a catalog-level transform —
    * the same `range_shard(width, doc_id)` the scan reports per-partition. */
  override def partitioning(): Array[Transform] =
    BlockStore.shardingOf(store) match {
      case Some((_, width)) =>
        Array(Expressions.bucket(width.toInt, "doc_id"))
      case None => Array.empty
    }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // TIME TRAVEL (x41): `versionAsOf` resolves to a read-only snapshot
    // alias over the recorded version's block array (blocks shared, never
    // copied) — the rest of the scan machinery is version-oblivious
    val effective = Option(options.get("versionAsOf"))
      .map(v => BlockStore.snapshotAsOf(store, v.toInt)).getOrElse(store)
    new BlockScanBuilder(effective, tableSchema,
      options.getInt("maxBlocksPerTrigger", Int.MaxValue))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BlockWriteBuilder(store, info.schema(),
      Option(info.options.get("clusterBy")))
}

private[sources] class BlockScanBuilder(store: String, full: StructType,
    maxBlocksPerTrigger: Int = Int.MaxValue,
    cowSink: Option[GraftRowLevelOperation] = None)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = full
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  // col -> allowed values, from lang/source equality predicates; a block
  // survives only if its DICTIONARY stats intersect every entry (parquet's
  // dictionary-page pruning on the store's metadata). Multiple predicates
  // on one column intersect (both must allow a value to keep it).
  private var dict: Map[String, Set[String]] = Map.empty
  private var accepted: Array[Filter] = Array.empty
  private var aggSpec: Option[Seq[String]] = None

  private def addDict(f: Filter, column: String, vs: Set[String]): Unit = {
    dict = dict.updated(column,
      dict.get(column).map(_.intersect(vs)).getOrElse(vs))
    accepted :+= f
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      // strict bounds clamp at the Long extremes instead of v±1: raw
      // arithmetic WRAPS (doc_id < Long.MinValue would set hi to
      // Long.MaxValue — a prune-everything bound read back as
      // prune-nothing, and statsExact would see "no bounds pushed")
      case f @ GreaterThan("doc_id", v: Long) =>
        lo = math.max(lo, if (v == Long.MaxValue) v else v + 1); accepted :+= f
      case f @ GreaterThanOrEqual("doc_id", v: Long) =>
        lo = math.max(lo, v); accepted :+= f
      case f @ LessThan("doc_id", v: Long) =>
        hi = math.min(hi, if (v == Long.MinValue) v else v - 1); accepted :+= f
      case f @ LessThanOrEqual("doc_id", v: Long) =>
        hi = math.min(hi, v); accepted :+= f
      case f @ EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v); accepted :+= f
      case f @ EqualTo(c @ ("lang" | "source"), v: String) =>
        addDict(f, c, Set(v))
      case f @ In(c @ ("lang" | "source"), vs)
          if vs.forall(_.isInstanceOf[String]) =>
        addDict(f, c, vs.collect { case s: String => s }.toSet)
      case _ => // not prunable from block stats; stays residual like all
    }
    filters // ALL residual — stats bounds are block-granular, not row-exact
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- x34: aggregates answered from block STATS, zero payload reads ----
  //
  // COUNT(*) / MIN(doc_id) / MAX(doc_id) with no grouping and no pushed
  // bounds are exactly the numbers the store's per-block metadata already
  // carries (the getShuffleStatus surface) — so the scan COMPLETELY
  // answers them with one metadata row and opens no block reader at all
  // (spec-diffed on the reader counter). Anything else — grouping, other
  // columns, a bounded scan whose blocks straddle the range — is refused
  // and planned as a normal scan: block stats are exact only for the
  // whole, unfiltered store.

  private def translate(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case n: NamedReference => n.fieldNames.sameElements(Array("doc_id"))
        case _ => false
      }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if isDocId(m.column) => Some("min")
      case m: Max if isDocId(m.column) => Some("max")
      case _ => None
    }
    if (specs.forall(_.isDefined)) Some(specs.flatten) else None
  }

  // x42: GROUPED COUNT(*) pushdown — `GROUP BY lang|source` with a single
  // COUNT(*) is served from the blocks' dictionary VALUE COUNTS
  // ([[BlockStore.Block.langCounts]]): the scan emits one row per distinct
  // value, summed across block metadata, zero payload reads — parquet
  // can't do this (dictionary pages carry values, not counts); the store's
  // put-time stats can.
  private var groupedCol: Option[String] = None

  private def translateGrouped(agg: Aggregation): Option[String] =
    agg.groupByExpressions match {
      case Array(n: NamedReference)
          if n.fieldNames.length == 1 &&
            (n.fieldNames()(0) == "lang" || n.fieldNames()(0) == "source") &&
            agg.aggregateExpressions.length == 1 &&
            agg.aggregateExpressions()(0).isInstanceOf[CountStar] =>
        Some(n.fieldNames()(0))
      case _ => None
    }

  /** Stats answer aggregates exactly only for the WHOLE store: no pushed
    * doc_id bounds and no pushed dictionary filters. Today every filter
    * stays residual (so Spark refuses aggregate pushdown whenever any
    * filter exists, spec-covered) — the dict check is the defensive guard
    * that keeps a future non-residual dict filter from silently serving
    * unfiltered counts. */
  private def statsExact: Boolean =
    lo == Long.MinValue && hi == Long.MaxValue && dict.isEmpty

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    statsExact && (translate(agg).isDefined || translateGrouped(agg).isDefined)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (!statsExact) false
    else translate(agg) match {
      case some @ Some(specs) =>
        // MIN/MAX over a store with no stat-bearing rows has no exact
        // stats answer (SQL wants one NULL row; the pushed schema is
        // non-nullable, and empty-shard placeholder blocks carry
        // Long.MaxValue/MinValue sentinels that would serve as REAL
        // values) — decline and let the ordinary scan + aggregate
        // produce the correct NULL (r14 review finding)
        val needsRows = specs.exists(s => s == "min" || s == "max")
        if (needsRows && !BlockStore.get(store).exists(_.numRows > 0)) false
        else { aggSpec = some; true }
      case None =>
        translateGrouped(agg) match {
          case some @ Some(_) => groupedCol = some; true
          case None => false
        }
    }

  override def build(): Scan = (aggSpec, groupedCol) match {
    // a COW scan never meets agg pushdown (rewrite plans carry no
    // aggregates), but route it explicitly so the invariant is structural
    case _ if cowSink.isDefined =>
      new BlockScan(store, required, lo, hi, dict, maxBlocksPerTrigger,
        cowSink)
    case (Some(specs), _) => new MetadataAggScan(store, specs)
    case (None, Some(c)) => new MetadataGroupedCountScan(store, c)
    case _ => new BlockScan(store, required, lo, hi, dict, maxBlocksPerTrigger)
  }
}

/** Serves a completely-pushed `GROUP BY lang|source, COUNT(*)` from block
  * dictionary value counts: |values| rows, no payload access. */
private[sources] class MetadataGroupedCountScan(store: String, colName: String)
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField(colName,
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("count(*)",
      org.apache.spark.sql.types.LongType, nullable = false)))

  override def description(): String =
    s"graft-blocks grouped-count[$colName] store=$store (stats-served, no readers)"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val merged = scala.collection.mutable.Map.empty[String, Long]
    BlockStore.blocks(store).foreach { b =>
      val m = if (colName == "lang") b.langCounts else b.sourceCounts
      m.foreach { case (k, c) => merged(k) = merged.getOrElse(k, 0L) + c }
    }
    Array(GroupedCountPartition(merged.toSeq.sortBy(_._1).toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[GroupedCountPartition].counts
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = new GenericInternalRow(
            Array[Any](UTF8String.fromString(rows(i)._1), rows(i)._2))
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] case class GroupedCountPartition(counts: Array[(String, Long)])
  extends InputPartition

/** Serves a completely-pushed aggregation from block metadata: one row,
  * no [[BlockReaderFactory]], no payload access. */
private[sources] class MetadataAggScan(store: String, specs: Seq[String])
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(specs.zipWithIndex.map {
    case (s, i) => org.apache.spark.sql.types.StructField(s"${s}_$i",
      org.apache.spark.sql.types.LongType, nullable = false)
  })

  override def description(): String =
    s"graft-blocks store=$store STATS-ONLY aggs=${specs.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // resolved on the DRIVER from stats; the single partition carries the
    // final values, so the task ships literals and touches nothing.
    // MIN/MAX consult only stat-BEARING blocks: empty-shard placeholders
    // carry Long.MaxValue/MinValue sentinels. pushAggregation declined
    // the pushdown if no such block existed; a store emptied between
    // planning and execution fails loudly rather than serving sentinels.
    val blocks = BlockStore.get(store)
    val statBlocks = blocks.filter(_.numRows > 0)
    require(statBlocks.nonEmpty ||
        specs.forall(_ == "count"),
      s"store '$store' lost all rows between aggregate pushdown and " +
        "execution — re-plan the query")
    val values = specs.map {
      case "count" => blocks.map(_.numRows).sum
      case "min"   => statBlocks.map(_.minId).min
      case "max"   => statBlocks.map(_.maxId).max
    }.toArray
    Array(MetadataAggPartition(values))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val vals = p.asInstanceOf[MetadataAggPartition].values
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = if (done) false else { done = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(vals.map(v => v: Any))
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] case class MetadataAggPartition(values: Array[Long])
  extends InputPartition

private[sources] class BlockScan(store: String, required: StructType,
    lo: Long, hi: Long, dict: Map[String, Set[String]] = Map.empty,
    maxBlocksPerTrigger: Int = Int.MaxValue,
    cowSink: Option[GraftRowLevelOperation] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {

  /** Dictionary pruning: block stats must intersect every pushed
    * lang/source value set (sound: a block whose dictionary lacks every
    * allowed value cannot contain a matching row; the residual filter
    * re-applies exactly above). */
  private def dictSurvives(b: BlockStore.Block): Boolean =
    dict.forall {
      case ("lang", vs)   => b.langs.exists(vs.contains)
      case ("source", vs) => b.sources.exists(vs.contains)
      case _              => true
    }

  override def readSchema(): StructType = required

  // ---- x37: storage-partitioned join (SupportsReportPartitioning) -------
  //
  // A sharded store ([[BlockStore.ensureShardedSnapshots]]) reports its
  // layout as KeyGroupedPartitioning over `range_shard(width, doc_id)`,
  // with one input partition per shard carrying its shard id as the
  // partition key. Spark resolves the transform through
  // [[GraftBlockCatalog]]'s function catalog, and a join of two stores
  // sharded at the same width plans WITHOUT an Exchange on either side
  // (`spark.sql.sources.v2.bucketing.enabled`, set in Engine) — the
  // reference's registerShuffles co-placement as Spark sees it. Pruned or
  // empty shards still emit their partition so both sides always expose
  // the full, identical key set to the join planner.

  override def outputPartitioning(): Partitioning =
    BlockStore.shardingOf(store) match {
      case Some((n, width)) =>
        // reported as bucket(width, doc_id): the catalog's bucket IS the
        // fixed-width range shard (see RangeShard scaladoc for why the
        // canonical bucket name is required here)
        new KeyGroupedPartitioning(
          Array(Expressions.bucket(width.toInt, "doc_id")), n)
      case None => new UnknownPartitioning(0)
    }

  // ---- runtime filtering (x35): the DPP shape on block stats ----------
  //
  // When this table sits on the probe side of a join whose build side is
  // small, Spark materializes the build side FIRST and calls
  // `filter(In(doc_id, values))` with the actual join keys before
  // `planInputPartitions` — so blocks containing none of the keys are
  // never read at all. This is the reference's getShuffleStatus-then-
  // fetch-only-what-you-need read discipline, and Spark's own dynamic
  // partition pruning contract, landed on the store's min/max metadata.
  // Conservative by construction: a key set only ever SHRINKS the block
  // list, rows are still filtered exactly by the join above.

  @volatile private var runtimeKeys: Option[Array[Long]] = None
  /** Runtime join-key value sets for the DICTIONARY columns — same
    * contract as [[runtimeKeys]] but pruned against the blocks'
    * dictionary stats instead of min/max: a lang- or source-keyed
    * broadcast join skips every block whose dictionary is disjoint from
    * the build side's actual key values (x35's DPP shape extended to the
    * r10 dictionary stats; on the by-lang clustered layout that is most
    * of the store). */
  @volatile private var runtimeDict: Map[String, Set[String]] = Map.empty

  // only columns that SURVIVED column pruning may be offered: Spark
  // resolves these against the scan's (pruned) output and fails analysis
  // on a name the projection dropped. A COW rewrite scan offers doc_id
  // ONLY: the row-level group-filtering rule packs ALL offered attributes
  // into one named_struct(...) IN <subquery> — a shape the V1 filter
  // conversion drops silently, so offering three columns means NO pruning
  // reaches the scan at all; a single attribute arrives as the plain
  // In(doc_id, values) the min/max stats prune on (static pushed dict
  // filters still prune lang/source-conditioned rewrites).
  override def filterAttributes(): Array[NamedReference] =
    (if (cowSink.isDefined) Array("doc_id") else Array("doc_id", "lang", "source"))
      .filter(required.fieldNames.contains)
      .map(Expressions.column)

  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In("doc_id", values) =>
        runtimeKeys = Some(values.collect { case v: Long => v })
      case In(c @ ("lang" | "source"), values) =>
        runtimeDict += (c -> values.collect { case s: String => s }.toSet)
      case _ => // unrecognized runtime filter: keep every block (sound)
    }

  /** Bounds-aware size/row estimates from block stats — what lets the
    * optimizer broadcast a pruned block-store side the way file sources
    * get sizing from footers. Surviving blocks only, so a selective
    * pushed range shrinks the estimate before join planning. */
  override def estimateStatistics(): Statistics = {
    val survivors = BlockStore.get(store)
      .filter(b => b.maxId >= lo && b.minId <= hi && dictSurvives(b))
    new Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(math.max(1L, survivors.map(_.bytes).sum))
      override def numRows(): util.OptionalLong =
        util.OptionalLong.of(survivors.map(_.numRows).sum)
    }
  }

  override def description(): String =
    s"graft-blocks store=$store bounds=[$lo,$hi] " +
      (if (dict.isEmpty) ""
       else dict.toSeq.sortBy(_._1).map { case (c, vs) =>
         s"dict[$c in {${vs.toSeq.sorted.mkString(",")}}]"
       }.mkString("", " ", " ")) +
      s"cols=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  private def survives(b: BlockStore.Block): Boolean =
    b.maxId >= lo && b.minId <= hi && dictSurvives(b) &&
      runtimeKeys.forall(_.exists(k => k >= b.minId && k <= b.maxId)) &&
      runtimeDict.forall {
        case ("lang", vs)   => b.langs.exists(vs.contains)
        case ("source", vs) => b.sources.exists(vs.contains)
        case _              => true
      }

  override def planInputPartitions(): Array[InputPartition] = {
    // PIN the exact block array planning indexed: a DELETE's copy-on-write
    // rewrite between planning and reader creation shifts positions, and a
    // reader resolving indices against the mutable array would silently
    // serve wrong blocks. The pin is immutable (commits swap the array
    // reference, never mutate it), so [snap, idx] names one block forever.
    // gen BEFORE the array read: the pin-expiry fallback may only trust
    // positional re-resolution when no rewrite happened since BEFORE we
    // indexed the array (pinnedOrCurrent's contract). STABLE read: a
    // mid-rewrite (odd-parity) generation would pass the fallback's
    // equality check against the post-rewrite array.
    val gen = BlockStore.stableLayoutGeneration(store)
    val arr = BlockStore.get(store)
    val snap = BlockStore.pinSnapshot(store, arr)
    BlockStore.shardingOf(store) match {
      case Some((n, _)) =>
        // One input partition PER BLOCK, keyed by its shard (the standard
        // many-files-per-bucket layout): Spark's key-grouped machinery
        // groups same-key partitions for SPJ, and under
        // `v2.bucketing.partiallyClusteredDistribution.enabled` it may
        // instead keep a skewed shard's blocks as separate tasks and
        // replicate the other side's group — which is why the scan must
        // not pre-merge them. A shard whose blocks were all pruned still
        // emits one empty partition so both join sides always expose the
        // identical key set.
        val blocks = arr.zipWithIndex
        (0 until n).flatMap { s =>
          val mine = blocks.collect {
            case (b, i) if b.shard == s && survives(b) => i
          }
          if (mine.isEmpty)
            Seq(ShardBlockPartition(snap, s, Array.empty, store, gen))
          else mine.map(i => ShardBlockPartition(snap, s, Array(i), store, gen))
        }.toArray[InputPartition]
      case None =>
        val survivors = arr.zipWithIndex.filter { case (b, _) => survives(b) }
        // COW rewrite scan (x46): the surviving blocks ARE the groups the
        // row-level commit replaces — record them with the generation they
        // were planned under (the optimistic-commit token). Runtime group
        // filtering has already narrowed the list by now, so blocks whose
        // stats exonerate them are never recorded and never rewritten.
        cowSink.foreach(_.recordPlan(survivors.map(_._1), gen))
        survivors.map { case (_, i) =>
          BlockPartition(snap, i, store, gen): InputPartition
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlockReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BlockMicroBatchStream(store, required, lo, hi, dictSurvives,
      maxBlocksPerTrigger)
}

/** s21: the STREAMING read path — the store as a continuously-tailed
  * source, the reference daemon's real deployment shape (blocks arrive
  * over time from running map tasks; readers consume what has landed,
  * `deploy/Daemon.scala:45-82`). The offset is simply the count of
  * VISIBLE blocks: block promotion is append-ordered and atomic
  * ([[BlockStore.promote]]), so `[startIdx, endIdx)` names an immutable
  * slice of the store — exactly the replayability contract a streaming
  * offset owes the checkpoint (re-planning a committed batch returns the
  * identical blocks; a concurrent append only ever grows the tail).
  *
  *   - `SupportsAdmissionControl`: `maxBlocksPerTrigger` caps each
  *     micro-batch (the `maxFilesPerTrigger` discipline) — at production
  *     ingest rates a restart after downtime must not plan the whole
  *     backlog as one batch;
  *   - `SupportsTriggerAvailableNow`: the target is pinned ONCE at query
  *     start, so an `AvailableNow` run drains exactly the blocks present
  *     at start (in bounded batches) and terminates even while writers
  *     keep appending;
  *   - pushed doc_id bounds still prune WITHIN each batch's index range
  *     (offsets stay positional; the residual filter re-applies exactly).
  */
private[sources] class BlockMicroBatchStream(store: String,
    required: StructType, lo: Long, hi: Long,
    dictSurvives: BlockStore.Block => Boolean, maxPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def visibleNow: Int = BlockStore.blockCount(store)

  // positional offsets are sound only for ONE layout generation: appends
  // grow the tail, but a DELETE/OPTIMIZE/truncate rewrite re-numbers
  // positions — and the live-reader fence cannot protect a STOPPED
  // stream's persisted checkpoint. Offsets therefore embed the layout
  // generation they were minted under; a replay over a bumped store
  // fails loudly instead of silently serving re-numbered blocks.
  private def gen: Long = BlockStore.stableLayoutGeneration(store)

  private def checkGen(o: BlockStreamOffset): Unit =
    require(o.gen == gen,
      s"store '$store' layout generation ${gen} != offset generation " +
        s"${o.gen}: the store was rewritten (DELETE/OPTIMIZE/overwrite) " +
        "since this checkpoint — positional offsets cannot replay it; " +
        "restart from a fresh checkpoint")

  // pinned by prepareForTriggerAvailableNow; -1 = live (unbounded) tailing
  @volatile private var availableTarget: Int = -1
  private def target: Int =
    if (availableTarget >= 0) availableTarget else visibleNow

  override def prepareForTriggerAvailableNow(): Unit = {
    ensureFence()
    availableTarget = visibleNow
  }

  override def initialOffset(): Offset = {
    ensureFence()
    BlockStreamOffset(0, gen)
  }

  override def latestOffset(): Offset = {
    // the admission-control overload below is what the engine calls; this
    // plain form answers the unthrottled tail for completeness
    ensureFence()
    BlockStreamOffset(target, gen)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    ensureFence()
    val so = start.asInstanceOf[BlockStreamOffset]
    checkGen(so)
    BlockStreamOffset(math.min(target, math.min(so.n.toLong + maxPerTrigger,
      Int.MaxValue.toLong).toInt), gen)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // fence registration: while this stream is live, DELETE / truncating
  // overwrite on the store are refused (positional offsets stay sound
  // because only appends can commit). LAZY — registered on the first
  // offset/plan call, not in the constructor: toMicroBatchStream runs
  // during ANALYSIS, and a query failing between analysis and source
  // tracking would leak the fence for the JVM's lifetime (r12 ADVICE);
  // stop() is idempotent and unregisters only what was registered.
  //
  // Three-state lifecycle (r13 ADVICE): a plain boolean let an
  // offset/plan call racing (or arriving after) stop() — engine teardown
  // drains calls concurrently — re-CAS false→true and re-register with
  // nothing left to unregister, permanently fencing the store. STOPPED
  // is terminal: ensureFence is a no-op once stop() ran, and stop()
  // unregisters only if the state it replaced was FENCED.
  // Transitions happen at most twice per stream, so a monitor (not CAS)
  // keeps the register/unregister side effect atomic with the state flip
  // — a CAS-then-register would let stop() unregister BEFORE the racing
  // register landed.
  private final val Unstarted = 0; private final val Fenced = 1
  private final val Stopped = 2
  private var fenceState = Unstarted
  // the counter instance this stream registered on — stop() must
  // decrement exactly it (a dropStore swaps the store's counter, and a
  // stale stop() must not steal a successor stream's fence)
  private var fenceToken: AnyRef = null
  private val fenceStateLock = new Object
  private def ensureFence(): Unit = fenceStateLock.synchronized {
    if (fenceState == Unstarted) {
      fenceState = Fenced
      fenceToken = BlockStore.registerStreamReader(store)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    ensureFence()
    checkGen(start.asInstanceOf[BlockStreamOffset])
    checkGen(end.asInstanceOf[BlockStreamOffset])
    val startOff = start.asInstanceOf[BlockStreamOffset]
    val s = startOff.n
    val e = end.asInstanceOf[BlockStreamOffset].n
    // Seqlock read protocol: read the block array FIRST, then validate
    // the generation. checkGen above proved the offsets' generation was
    // current WHEN IT RAN, but a dropStore+re-land can complete between
    // any pre-read check and the array read (dropStore deliberately
    // bypasses the live-reader fence) — a gen read BEFORE BlockStore.get
    // only narrows that window (r17 advice). Because every rewrite goes
    // odd before the swap and even after (BlockStore.bumpLayoutGen) and
    // stableLayoutGeneration spins past odd, observing
    // gen == startOff.gen AFTER the read proves no rewrite started
    // before or during it: the array below is the exact layout the
    // offsets were minted on, so the batch can never silently serve a
    // re-landed store's blocks [s, e) against old positional offsets.
    val blocks = BlockStore.get(store)
    val pgen = gen
    if (pgen != startOff.gen)
      throw new IllegalStateException(
        s"store '$store' layout generation moved (${startOff.gen} -> $pgen) " +
          "between offset validation and partition planning — the stream's " +
          "positional offsets no longer describe this layout; restart the " +
          "query from a fresh checkpoint")
    val snap = BlockStore.pinSnapshot(store, blocks)
    (s until math.min(e, blocks.length)).collect {
      case i if blocks(i).maxId >= lo && blocks(i).minId <= hi &&
          dictSurvives(blocks(i)) =>
        BlockPartition(snap, i, store, pgen): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlockReaderFactory(required.fieldNames)

  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.startsWith("{")) {
      // fixed shape {"n":N,"gen":G} — written by BlockStreamOffset.json
      def field(k: String): Long = {
        val tag = "\"" + k + "\":"
        val i = t.indexOf(tag)
        require(i >= 0, s"bad block offset json: $t")
        val rest = t.substring(i + tag.length)
        rest.takeWhile(c => c == '-' || c.isDigit).toLong
      }
      BlockStreamOffset(field("n").toInt, field("gen"))
      // legacy plain-int checkpoints predate every generation bump (gens
      // start at 0): stamp 0 so a post-upgrade rewrite still fails loudly
    } else BlockStreamOffset(t.toInt, 0L)
  }

  override def commit(end: Offset): Unit = ()
  // idempotent: unregister exactly what ensureFence registered, once —
  // a double stop (or a stop on a never-driven stream) must not
  // decrement another live stream's fence; STOPPED is terminal so a
  // straggler ensureFence after teardown cannot re-register
  override def stop(): Unit = fenceStateLock.synchronized {
    val was = fenceState
    fenceState = Stopped
    if (was == Fenced) BlockStore.unregisterStreamReader(store, fenceToken)
  }
}

private[sources] case class BlockStreamOffset(n: Int, gen: Long = 0L)
    extends Offset {
  override def json(): String = s"""{"n":$n,"gen":$gen}"""
}

/** One block of a PINNED scan snapshot — `snap` names the immutable block
  * array planning indexed ([[BlockStore.pinSnapshot]]), so a concurrent
  * DELETE/overwrite can never re-number what the reader resolves.
  * `store`/`gen` ride along for the pin-expiry fallback
  * ([[BlockStore.pinnedOrCurrent]]): gen is captured BEFORE planning read
  * the array, so an expired pin re-resolves positionally iff no rewrite
  * happened since. */
private[sources] case class BlockPartition(snap: Long, idx: Int,
    store: String, gen: Long) extends InputPartition

/** One SHARD of a sharded store: all surviving blocks tagged with this
  * shard id, keyed for the planner's partition grouping (SPJ). */
private[sources] case class ShardBlockPartition(snap: Long, shard: Int,
    idxs: Array[Int], store: String, gen: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](shard))
}

/** x33: the WRITE half — the reference's `putBlock` lifecycle
  * (`deploy/Daemon.scala:45-64`) on the V2 write API, with two properties
  * the bespoke protocol never had:
  *
  *   - `RequiresDistributionAndOrdering`: the SINK declares it needs the
  *     data range-clustered and sorted on doc_id, and SPARK plans the
  *     shuffle — callers write unclustered frames and every landed block
  *     still carries tight, disjoint min/max stats for the read side's
  *     pruning (spec-asserted: block key ranges are pairwise disjoint
  *     without any caller-side repartition);
  *   - the two-phase commit: task writers stage blocks executor-side at
  *     task commit (putBlock), the driver's job commit PROMOTES the
  *     staged set atomically (truncate = overwrite semantics), an abort
  *     leaves the visible store untouched — readers never observe a
  *     half-written store.
  */
private[sources] class BlockWriteBuilder(store: String, schema: StructType,
    clusterBy: Option[String] = None)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new BlockWrite(store, schema, doTruncate, clusterBy)
}

private[sources] class BlockWrite(store: String, schema: StructType,
    doTruncate: Boolean, clusterBy: Option[String] = None)
    extends Write with RequiresDistributionAndOrdering {

  private def docIdAsc: SortOrder =
    Expressions.sort(Expressions.column("doc_id"), SortDirection.ASCENDING)

  /** Default layout: a GLOBAL doc_id range-sort, so blocks carry tight
    * disjoint min/max stats (x31's clustering-for-stats discipline). A
    * `clusterBy=<col>` write option opts into hash-clustering by another
    * column instead — the layout that makes the DICTIONARY stats prune
    * (one-or-few values per block), used by the landed ANN index to
    * cluster PQ codes by IVF cell. */
  override def requiredDistribution(): Distribution = clusterBy match {
    case Some(c) =>
      Distributions.clustered(Array(Expressions.identity(c)))
    case None => Distributions.ordered(Array(docIdAsc))
  }
  override def requiredOrdering(): Array[SortOrder] = clusterBy match {
    case Some(_) => Array.empty
    case None => Array(docIdAsc)
  }
  // fixed block fan-out for a deterministic layout at harness scale; on a
  // cluster this is a table property sized to blocks-per-node
  override def requiredNumPartitions(): Int = 16

  override def toBatch: BatchWrite = new BlockBatchWrite(store, schema, doTruncate)

  /** The STREAMING half of the sink: same task-level staging as batch, but
    * each epoch stages under its own key and the epoch-level commit is an
    * idempotent append ([[BlockStore.commitEpoch]]) — blocks land over
    * time, exactly once per epoch, the daemon's continuous-putBlock life. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new BlockStreamingWrite(store, schema)
}

private[sources] class BlockStreamingWrite(store: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new BlockStreamingWriterFactory(store,
      Catalog.documents.fieldNames.map(schema.fieldIndex))
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    BlockStore.commitEpoch(store, epochId,
      messages.collect { case BlockWriteCommit(pid, _) => pid }.toSeq)
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    BlockStore.discardStaged(BlockStore.epochKey(store, epochId))
}

private[sources] class BlockStreamingWriterFactory(store: String,
    srcIdx: Array[Int])
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new BlockDataWriter(BlockStore.epochKey(store, epochId), partitionId, srcIdx)
}

private[sources] case class BlockWriteCommit(partitionId: Int, nRows: Int)
  extends WriterCommitMessage

private[sources] class BlockBatchWrite(store: String, schema: StructType,
    doTruncate: Boolean) extends BatchWrite {

  // Staging key unique to THIS write job: two concurrent batch writes to
  // one store must not interleave their staged blocks (streaming epochs
  // already stage per-epoch for exactly this reason — batch previously
  // collided on the bare store name: whichever commit ran first promoted
  // an arbitrary mix of both jobs' blocks, and one job's abort discarded
  // the other's staging).
  private[sources] val jobKey = store + "##job-" + java.util.UUID.randomUUID()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // write lease: from here until commit/abort this job's staging key is
    // LIVE — the orphan vacuum must not reclaim an in-flight job's blocks
    // (released by promoteInto/discardStaged; a crashed writer's lease is
    // expired by the vacuum policy — see BlockStore's crash-consistency
    // scaladoc)
    BlockStore.beginWriteLease(jobKey)
    new BlockWriterFactory(jobKey,
      Catalog.documents.fieldNames.map(schema.fieldIndex))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    BlockStore.promoteInto(jobKey, store,
      messages.collect { case BlockWriteCommit(pid, _) => pid }.toSeq,
      doTruncate)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    BlockStore.discardStaged(jobKey)
}

/** Row-level operation (x46): one MERGE / UPDATE / rewrite-DELETE
  * statement's shared state between its copy-on-write scan and its
  * replacement write — Spark's DSv2 GROUP-BASED rewrite contract
  * (`RewriteMergeIntoTable` and friends plan it for tables declaring
  * `SupportsRowLevelOperations` without `SupportsDelta`).
  *
  * GROUP GRANULARITY IS THE BLOCK. Spark's runtime group filtering
  * (`spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled`,
  * on by default) first joins the source onto the target to collect the
  * MATCHED rows' join-key values and hands them to the COW scan as an
  * `In(doc_id|lang|source, …)` runtime filter — the same
  * SupportsRuntimeFiltering surface x35's DPP uses — so the scan plans
  * only blocks whose min/max or dictionary stats intersect the matched
  * keys. Those survivors are recorded here ([[recordPlan]]) together
  * with the layout generation they were planned under; the write stages
  * replacement blocks (untouched-row copies + updated + inserted rows)
  * and the commit atomically swaps victims for replacements
  * ([[BlockStore.replaceBlocks]]), re-validating the generation — the
  * Iceberg/Delta optimistic validate-and-swap. Blocks the filter
  * exonerates are never read and never rewritten (spec: untouched block
  * REFERENCES survive a merge identically).
  *
  * 100 TB note: the handed key values are row-granular (a large IN list
  * at scale); the upgrade path is a block-id metadata column as the
  * filter attribute (Iceberg's `_file` discipline) so the matched-group
  * set itself rides the broadcast. Block min/max pruning gives the same
  * block-granular outcome at the registered scales, so the extra
  * metadata column is documented, not implemented. */
private[sources] class GraftRowLevelOperation(store: String,
    tableSchema: StructType,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  /** Set by the COW scan at planInputPartitions (latest plan wins — AQE
    * may re-plan): the exact blocks whose rows the rewrite read, and the
    * stable layout generation they were planned under. Volatile pair read
    * by the write's commit; a torn read across the two fields is ruled
    * out because Spark plans the scan strictly before committing the
    * write of the same statement. */
  @volatile private[sources] var plannedVictims: Array[BlockStore.Block] =
    Array.empty
  @volatile private[sources] var plannedGen: Long = -1L

  private[sources] def recordPlan(victims: Array[BlockStore.Block],
      gen: Long): Unit = {
    plannedVictims = victims
    plannedGen = gen
  }

  override def command()
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlockScanBuilder(store, tableSchema, cowSink = Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new ReplaceDataWrite(store, info.schema(), GraftRowLevelOperation.this)
    }

  override def description(): String = s"graft-cow-$cmd store=$store"
}

/** The replacement write of a row-level rewrite: stages blocks through the
  * ordinary leased staging path (a crashed rewrite's staging is vacuumed
  * like any other), then commits by swapping the operation's recorded
  * victim blocks for the staged replacements. A rewrite whose scan planned
  * zero groups (pure-insert MERGE) commits as a plain append. */
private[sources] class ReplaceDataWrite(store: String, schema: StructType,
    op: GraftRowLevelOperation) extends Write with BatchWrite {

  private[sources] val jobKey =
    store + "##cow-" + java.util.UUID.randomUUID()

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    BlockStore.beginWriteLease(jobKey)
    // The physical rows are [__row_operation] ++ info.schema(): every
    // group-based rewrite (RewriteDeleteFromTable/UpdateTable/MergeIntoTable)
    // prepends RowDeltaUtils.OPERATION_COLUMN to the replacement query, and
    // with no metadataProjection ReplaceDataExec takes the plain
    // DataWritingSparkTask path that hands the writer the RAW row — the
    // LogicalWriteInfo schema does NOT mention the column (debugged the
    // hard way: field 0 read as doc_id turned the lang column into text
    // and n_chars into a string pointer). Hence the +1 offset; the
    // RowLevelOpsSpec content assertions pin this layout.
    new BlockWriterFactory(jobKey,
      Catalog.documents.fieldNames.map(schema.fieldIndex(_) + 1))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    BlockStore.replaceBlocks(jobKey, store,
      messages.collect { case BlockWriteCommit(pid, _) => pid }.toSeq,
      op.plannedVictims, op.plannedGen)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    BlockStore.discardStaged(jobKey)

  override def description(): String = s"graft-cow-write store=$store"
}

private[sources] class BlockWriterFactory(stagingKey: String, srcIdx: Array[Int])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BlockDataWriter(stagingKey, partitionId, srcIdx)
}

/** Buffers the task's rows and stages them as ONE block at task commit —
  * nothing is visible until the job-level promote. `srcIdx` maps the
  * incoming row layout to [[BlockStore.DocRow]] field order by name. */
private[sources] class BlockDataWriter(stagingKey: String, partitionId: Int,
    srcIdx: Array[Int]) extends DataWriter[InternalRow] {

  private val buf = scala.collection.mutable.ArrayBuffer.empty[BlockStore.DocRow]

  override def write(row: InternalRow): Unit = {
    // loud contract check, not a bare NPE three frames deep: the store's
    // row tuple is non-nullable by design, but Catalog.documents declares
    // the string fields nullable, so a caller CAN hand this writer null
    // text/lang/source and deserves an error naming the violation
    def str(i: Int, field: String): String = {
      val v = row.getUTF8String(srcIdx(i))
      require(v != null,
        s"block store rows are non-nullable: NULL $field at doc_id=" +
          s"${row.getLong(srcIdx(0))}")
      v.toString
    }
    buf += ((row.getLong(srcIdx(0)), str(1, "text"), str(2, "lang"),
      str(3, "source"), row.getLong(srcIdx(4))))
  }

  override def commit(): WriterCommitMessage = {
    if (buf.nonEmpty)
      BlockStore.stage(stagingKey, partitionId,
        BlockStore.Block(buf.iterator.map(_._1).min,
          buf.iterator.map(_._1).max, buf.toArray))
    BlockWriteCommit(partitionId, buf.length)
  }

  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

/** Materializes ONLY the requested field indices per row — the column
  * pruning payoff (strings become UTF8String lazily, per required field). */
private[sources] object BlockReaderFactory {
  /** Minimum block rows for the columnar path (see supportColumnarReads). */
  val ColumnarMinRows = 512L
}

private[sources] class BlockReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {

  /** Segments (blocks) of a partition — METADATA only, no counter.
    * Resolution goes through the PINNED snapshot the planner indexed,
    * never the store's mutable current array. */
  private def blocksOf(p: InputPartition): Array[BlockStore.Block] = p match {
    case BlockPartition(snap, idx, store, gen) =>
      Array(BlockStore.pinnedOrCurrent(snap, store, gen)(idx))
    case ShardBlockPartition(snap, _, idxs, store, gen) =>
      val blocks = BlockStore.pinnedOrCurrent(snap, store, gen)
      idxs.map(blocks(_))
  }

  /** Segments of a partition with the reader-count bookkeeping (the
    * pruning specs' blocks-touched metric — one tick per block read). */
  private def segsOf(p: InputPartition): Array[BlockStore.Block] = {
    val segs = blocksOf(p)
    BlockStore.readersOpened.addAndGet(segs.length.toLong): Unit
    segs
  }

  // ---- COLUMNAR read path (x32 vectorized half) --------------------------
  //
  // The scan hands Spark ColumnarBatches of on-heap vectors (one batch per
  // block — blocks are the store's natural batch grain), so the downstream
  // plan runs Spark's vectorized ColumnarToRow instead of a per-row
  // GenericInternalRow allocation — the same execution shape the parquet
  // reader gets. Metadata columns are block-constant fills.

  /** Columnar only when the batch grain is worth it: tiny blocks (the
    * test-SF shape, ~30 rows) pay more in per-batch vector allocation and
    * the ColumnarToRow transition than they save (measured 1.3-1.9x vs a
    * 1.24x control band), while production-sized blocks amortize it — the
    * same rows-per-batch economics behind parquet's vectorized-reader
    * batch size. Decided from block METADATA (numRows), no payload read;
    * Spark goes columnar only if every partition agrees. */
  // snapshot-constant decision, memoized per snapshot key: Spark calls
  // supportColumnarReads once PER PARTITION on the driver, and the
  // uniform-answer walk below is O(|snapshot blocks|) — unmemoized
  // that's O(blocks²) metadata scans per planned query on a
  // production-sized store (r16 review). Single-entry memo suffices:
  // one scan's partitions share one snapshot.
  @transient private var colMemoKey: Any = null
  @transient private var colMemoVal = false

  override def supportColumnarReads(p: InputPartition): Boolean = {
    // decided from the SNAPSHOT's whole block set, not this partition's:
    // Spark refuses mixed row/columnar partitions, and a pruned-empty
    // shard partition must answer exactly like its populated siblings —
    // all of a scan's partitions share one snapshot, so this is uniform
    val (snap, store, gen) = p match {
      case BlockPartition(s, _, st, g) => (s, st, g)
      case ShardBlockPartition(s, _, _, st, g) => (s, st, g)
      case _ => return false
    }
    this.synchronized {
      if (colMemoKey != ((snap, gen))) {
        val blocks = BlockStore.pinnedOrCurrent(snap, store, gen)
        colMemoVal = blocks.nonEmpty &&
          blocks.forall(_.numRows >= BlockReaderFactory.ColumnarMinRows)
        colMemoKey = (snap, gen)
      }
      colMemoVal
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.types._
    val segs = segsOf(p)
    val schema = StructType(fields.map {
      case f @ ("doc_id" | "n_chars" | "_block_rows") =>
        StructField(f, LongType)
      case "_block_shard" => StructField("_block_shard", IntegerType)
      case f => StructField(f, StringType)
    })
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var seg = -1
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = null
      override def next(): Boolean = {
        // close the previous batch before allocating the next vector set:
        // the ColumnarBatch lifecycle contract — close() at the end only
        // released the LAST batch, abandoning N-1 per multi-block
        // partition (survivable for on-heap vectors only by GC luck)
        if (batch != null) { batch.close(); batch = null }
        seg += 1
        if (seg >= segs.length) false
        else {
          val b = segs(seg)
          val rows = b.rows
          val vecs = OnHeapColumnVector.allocateColumns(rows.length, schema)
          fields.indices.foreach { j =>
            val v = vecs(j)
            fields(j) match {
              case "doc_id" =>
                var i = 0; while (i < rows.length) { v.putLong(i, rows(i)._1); i += 1 }
              case "text" =>
                var i = 0
                while (i < rows.length) {
                  val bs = rows(i)._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  v.putByteArray(i, bs, 0, bs.length); i += 1
                }
              case "lang" =>
                var i = 0
                while (i < rows.length) {
                  val bs = rows(i)._3.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  v.putByteArray(i, bs, 0, bs.length); i += 1
                }
              case "source" =>
                var i = 0
                while (i < rows.length) {
                  val bs = rows(i)._4.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  v.putByteArray(i, bs, 0, bs.length); i += 1
                }
              case "n_chars" =>
                var i = 0; while (i < rows.length) { v.putLong(i, rows(i)._5); i += 1 }
              case "_block_shard" =>
                var i = 0; while (i < rows.length) { v.putInt(i, b.shard); i += 1 }
              case "_block_rows" =>
                var i = 0; while (i < rows.length) { v.putLong(i, b.numRows); i += 1 }
              case other => throw new IllegalArgumentException(
                s"unknown block-store column: $other")
            }
          }
          batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
            vecs.toArray[org.apache.spark.sql.vectorized.ColumnVector],
            rows.length)
          true
        }
      }
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    // Rows stay grouped in per-block SEGMENTS so the metadata columns
    // (block-constant values) need no per-row storage; segsOf carries the
    // shared pin resolution + readersOpened bookkeeping (one tick per
    // block touched — the pruning spec's metric), same as the columnar
    // reader.
    val segs: Array[BlockStore.Block] = segsOf(p)
    // per-field extractor: data fields read the row tuple; metadata fields
    // ([[BlockStoreTable.metadataColumns]]) read the enclosing block
    val extract: Array[(BlockStore.DocRow, BlockStore.Block) => Any] =
      fields.map {
        case "doc_id" => (r, _) => r._1
        case "text" => (r, _) => UTF8String.fromString(r._2)
        case "lang" => (r, _) => UTF8String.fromString(r._3)
        case "source" => (r, _) => UTF8String.fromString(r._4)
        case "n_chars" => (r, _) => r._5
        case "_block_shard" => (_, b) => b.shard
        case "_block_rows" => (_, b) => b.numRows
        case other => throw new IllegalArgumentException(
          s"unknown block-store column: $other")
      }
    new PartitionReader[InternalRow] {
      private var seg = 0
      private var rows: Array[BlockStore.DocRow] =
        if (segs.isEmpty) Array.empty else segs(0).rows
      private var i = -1
      override def next(): Boolean = {
        i += 1
        while (seg < segs.length && i >= rows.length) {
          seg += 1; i = 0
          if (seg < segs.length) rows = segs(seg).rows
        }
        seg < segs.length && i < rows.length
      }
      override def get(): InternalRow = {
        val r = rows(i)
        val b = segs(seg)
        val vals = new Array[Any](extract.length)
        var j = 0
        while (j < extract.length) { vals(j) = extract(j)(r, b); j += 1 }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
