package graft.operators

import graft.Catalog
import graft.Sql.asLong
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-management operators for a training-data pipeline (SURVEY.md §2D
  * LLM-pipeline row): deterministic train/val/test splitting, weighted
  * per-language corpus mixing, and per-source diversity capping.
  *
  * All three are built on the shared 60-bit md5-prefix hash
  * ([[graft.functions.Text.sharedHash]] ≡ `Text.sqlHash`), NOT on `rand()`:
  * a training-data split must be (a) reproducible run-to-run, (b) stable
  * under corpus growth — a document's split follows from its identity, not
  * from which execution sampled it — and (c) auditable by an independent
  * engine, which is exactly what the oracle compare exercises. This is the
  * standard "salted hash mod N" split used by large-scale dataset builders.
  *
  * Scale design: every operator here is a single map-side pass followed by
  * one aggregation on a LOW-CARDINALITY key (split name / lang / source) —
  * partial aggregation collapses each of the ~thousands of input partitions
  * to a handful of rows before the shuffle, so at 100 TB the shuffle moves
  * kilobytes. The one exception is the per-source cap's window sort, whose
  * skew caveat is documented on [[sourceCap]].
  */
object PipelineOps {

  /** Salted split hash in [0, 1000): md5-based, engine-portable. */
  private def splitHash(salt: String): Column =
    Text.sharedHash(concat(lit(s"$salt:"), col("doc_id").cast(StringType))) % 1000

  private def sqlSplitHash(salt: String): String =
    s"${Text.sqlHash(s"concat('$salt:', CAST(doc_id AS VARCHAR))")} % 1000"

  /** p2: deterministic 80/10/10 train/val/test split of `documents`, with
    * per-split document counts, total characters, and language coverage.
    * The assignment is pure per-row compute inside the scan stage; the
    * aggregation key has exactly 3 values. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = splitHash("split")
    val split = when(h < 800, "train").when(h < 900, "val").otherwise(lit("test"))
    Catalog.tableSpread(spark, dir, "documents")
      .withColumn("split", split)
      .groupBy(col("split"))
      .agg(asLong(count(lit(1))).as("n_docs"),
        asLong(sum(col("n_chars"))).as("sum_chars"),
        asLong(countDistinct(col("lang"))).as("n_langs"))
      .orderBy("split")
  }

  // p3 sampling rates per mille: downsample the dominant language hard,
  // mid-sample zh, keep the low-resource tail whole — the standard recipe
  // for rebalancing a web corpus before training
  private val MixRates: Seq[(String, Int)] = Seq("en" -> 300, "zh" -> 800)
  private val MixDefault = 1000

  /** p3: weighted per-language corpus mixing — each document is kept iff
    * its salted hash falls under its language's per-mille rate. Reports
    * total vs kept docs and kept characters per language, so the output IS
    * the mixing manifest. Deterministic: re-running (or growing the corpus)
    * never flips a surviving document's membership. */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    val rate = MixRates.foldRight(lit(MixDefault)) { case ((l, r), rest) =>
      when(col("lang") === l, lit(r)).otherwise(rest)
    }
    val keep = splitHash("mix") < rate
    Catalog.tableSpread(spark, dir, "documents")
      .withColumn("keep", keep)
      .groupBy(col("lang"))
      .agg(asLong(count(lit(1))).as("n_total"),
        asLong(sum(when(col("keep"), 1L).otherwise(0L))).as("n_kept"),
        asLong(sum(when(col("keep"), col("n_chars")).otherwise(0L))).as("kept_chars"))
      .orderBy("lang")
  }

  private val CapPerSource = 10

  /** dd10: per-source diversity cap — keep at most [[CapPerSource]] docs
    * per source, preferring the longest (n_chars DESC, doc_id tiebreak),
    * and report kept/dropped counts per source. The anti-over-representation
    * step of a corpus build (one crawl domain must not dominate training).
    *
    * Scale: one shuffle on `source` + a per-source top-k. Ranking uses
    * window row_number here; a window partition cannot be split by AQE, so
    * a pathologically hot source serializes onto one task. At 100 TB the
    * guard is the cap itself being tiny: the same result is computable as
    * groupBy(source).agg(slice(array_sort(collect_list(...)), 1, k)) — a
    * bounded-state partial aggregation that never materializes the full
    * source partition. The window form is kept because it is exact, simple,
    * and the cap output (not the sort) is what downstream consumes. */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Catalog.tableSpread(spark, dir, "documents")
      .withColumn("rk", row_number().over(w))
      .withColumn("keep", col("rk") <= CapPerSource)
      .groupBy(col("source"))
      .agg(asLong(sum(when(col("keep"), 1L).otherwise(0L))).as("n_kept"),
        asLong(sum(when(col("keep"), 0L).otherwise(1L))).as("n_dropped"),
        asLong(sum(when(col("keep"), col("n_chars")).otherwise(0L))).as("kept_chars"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p2_hash_split" -> hashSplit,
    "p3_corpus_mix" -> corpusMix,
    "dd10_source_cap" -> sourceCap)

  val oracles: Map[String, String] = Map(
    "p2_hash_split" ->
      s"""WITH s AS (SELECT CASE WHEN ${sqlSplitHash("split")} < 800 THEN 'train'
         |                       WHEN ${sqlSplitHash("split")} < 900 THEN 'val'
         |                       ELSE 'test' END AS split, n_chars, lang
         |           FROM documents)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "p3_corpus_mix" ->
      s"""WITH s AS (SELECT lang, n_chars,
         |             ${sqlSplitHash("mix")} <
         |               (CASE ${MixRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")}
         |                ELSE $MixDefault END) AS keep
         |           FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
         |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "dd10_source_cap" ->
      s"""WITH r AS (SELECT source, n_chars,
         |             ROW_NUMBER() OVER (PARTITION BY source
         |                                ORDER BY n_chars DESC, doc_id) <= $CapPerSource AS keep
         |           FROM documents)
         |SELECT source, CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
         |       CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM r GROUP BY source ORDER BY source""".stripMargin)
}
