package graft

import org.apache.spark.sql.functions._

/** Properties of the corpus-management operators that the oracle compare
  * cannot express (it checks one corpus snapshot; these check invariants
  * ACROSS corpus states). */
class PipelineOpsSpec extends SparkSpec {

  test("p2 split is stable under corpus growth (membership is per-document)") {
    // the split hash depends only on doc_id, so restricting the corpus to
    // any subset must not move a surviving document between splits — the
    // property that makes the split safe to recompute as the corpus grows
    import graft.functions.Text
    val h = Text.sharedHash(concat(lit("split:"), col("doc_id").cast("string"))) % 1000
    val split = when(h < 800, "train").when(h < 900, "val").otherwise(lit("test"))
    val full = Catalog.table(spark, sf, "documents")
      .select(col("doc_id"), split.as("s"))
    val half = Catalog.table(spark, sf, "documents")
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), split.as("s_half"))
    val moved = full.join(half, "doc_id")
      .filter(col("s") =!= col("s_half")).count()
    assert(moved === 0)
    // and the split is genuinely ~80/10/10, not degenerate
    val counts = full.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("sim6 assigns every non-zero vector to exactly one centroid") {
    val res = operators.Similarity.queries("sim6_kmeans_assign")(spark, sf)
      .collect()
    val assigned = res.map(_.getLong(1)).sum
    val nonZero = Catalog.table(spark, sf, "embeddings")
      .filter(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + abs(x.cast("double"))) > 0)
      .count()
    assert(assigned === nonZero)
    // self-assignment sanity: each centroid's own vector has cosine 1 with
    // itself, so every cell with its centroid present is non-empty
    assert(res.length === 8 && res.forall(_.getLong(1) >= 1))
  }

  test("dd10 cap bounds every source at the cap") {
    val res = operators.PipelineOps.queries("dd10_source_cap")(spark, sf).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getLong(1) <= 10)) // n_kept <= cap
    // kept + dropped = per-source totals
    val totals = Catalog.table(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    res.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === totals(r.getString(0)))
    }
  }
}
