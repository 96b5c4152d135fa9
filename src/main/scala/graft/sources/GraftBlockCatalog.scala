package graft.sources

import java.util

import graft.Catalog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 catalog over [[BlockStore]] — the piece that makes the connector's
  * STORAGE-PARTITIONED JOIN resolvable.
  *
  * Spark only recognizes a scan's `KeyGroupedPartitioning` when it can turn
  * the reported transform (`range_shard(width, doc_id)`) into a catalyst
  * expression, and that resolution goes through the relation's catalog: the
  * planner looks the function name up in the table's FunctionCatalog and
  * binds it. A `spark.read.format(...)` relation has NO catalog, so however
  * correct the scan's report, SPJ can never engage on that path — which is
  * why the block store grows this catalog surface (registered in Engine as
  * `spark.sql.catalog.graftblocks`). Read a store as
  * `spark.table("graftblocks.`<store>`")`.
  *
  * Two scans joined on doc_id both report partitioning by THIS catalog's
  * `range_shard` (same canonical name, same width literal), their input
  * partitions expose matching shard keys, and `EnsureRequirements` elides
  * both Exchanges — the Spark-native form of the reference's co-registered
  * shuffles (`MapOutputTracker.scala:219-255`: one partitioner shared by
  * multiple shuffles so the reduce stage reads co-located inputs).
  */
class GraftBlockCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = "graftblocks"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    BlockStore.storeNames.map(Identifier.of(Array.empty[String], _)).toArray

  override def loadTable(ident: Identifier): Table = {
    val store = ident.name
    // existence = listed in storeNames, NOT block count: a registered but
    // zero-block store (truncated, or committed-empty) must load as an
    // empty table — the previous blockCount guard made SHOW TABLES list a
    // name that spark.table() then refused (r14 review)
    if (!BlockStore.storeNames.contains(store))
      throw new NoSuchTableException(ident)
    new BlockStoreTable(store, Catalog.documents)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft block stores are created by their loaders, not DDL")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("immutable store schema")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("stores are not renameable")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty[String], RangeShard.Name))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name == RangeShard.Name) RangeShard
    else throw new NoSuchFunctionException(ident)
}

/** THIS catalog's `bucket(width, doc_id) = (doc_id / width).toInt` — the
  * ONE deterministic partitioner every sharded store is laid out by.
  *
  * The transform is reported under Spark's canonical `bucket` name because
  * the planner's key-grouped machinery only admits transforms with a single
  * column child: a generic `ApplyTransform` keeps its numeric parameter as
  * a second child and is rejected by
  * `KeyGroupedPartitioning.supportsExpressions`, while `bucket`'s parameter
  * is lifted into the transform's `numBucketsOpt` slot. A V2 catalog defines
  * its own bucket semantics (Iceberg's is a murmur hash mod N); this one is
  * a fixed-WIDTH range shard — a fixed division (not sampled range
  * boundaries, not a hash) keeps each shard a contiguous doc_id range, so
  * block min/max pruning still works, while shard placement stays a pure
  * function of (width, doc_id) and independently written stores are
  * co-located by construction. */
object RangeShard extends UnboundFunction {
  val Name = "bucket"

  def shard(width: Int, id: Long): Int = (id / width).toInt

  override def name(): String = Name
  override def description(): String =
    "bucket(width, doc_id): fixed-width range shard of a doc_id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      inputType.fields(1).dataType == LongType,
      s"bucket expects (INT width, BIGINT doc_id), got $inputType")
    BoundRangeShard
  }
}

object BoundRangeShard extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = RangeShard.Name
  // equality across the join's two sides compares THIS name (plus the
  // width parameter): both scans must resolve to one canonical function
  // for their shuffle specs to be compatible
  override def canonicalName(): String = "graft.range_shard_bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    RangeShard.shard(input.getInt(0), input.getLong(1))
  /** Codegen fast path (ScalarFunction magic method contract). */
  def invoke(width: Int, id: Long): Int = RangeShard.shard(width, id)
}
