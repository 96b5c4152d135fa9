package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's verified surface: one entry per operator row of
  * SURVEY.md §2D, each paired (where SQL-expressible) with a DuckDB oracle in
  * `oracleSql` with IDENTICAL column names and deterministic values (see
  * [[Sql]] for the decimal-exact aggregation rules that make double columns
  * bit-identical across engines).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.TextAnalysis.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.Multimodal.queries ++ operators.Extended.queries ++
      operators.Coverage.queries ++ operators.PipelineOps.queries ++
      operators.WeightedKeyPartitioner.queries ++
      streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.TextAnalysis.oracles ++
      operators.Dedup.oracles ++ operators.Similarity.oracles ++
      operators.Multimodal.oracles ++ operators.Extended.oracles ++
      operators.Coverage.oracles ++ operators.PipelineOps.oracles ++
      operators.WeightedKeyPartitioner.oracles ++
      streaming.StreamingOps.oracles
}
