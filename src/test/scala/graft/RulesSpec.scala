package graft

import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {

  /** Write-and-reread through parquet so the plan is file-backed (the
    * realistic shape the optimizer rule sees in production). */
  private def roundtripParquet(tag: String)(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d = s"${Catalog.tempDirWithCleanup(s"graft-rulespec-$tag")}/t"
    df.write.mode("overwrite").parquet(d)
    spark.read.parquet(d)
  }
  import spark.implicits._

  test("JaccardLengthPrune injects the exact length prune and preserves results") {
    graft.expr.VectorExpressions.register(spark)
    graft.plans.JaccardLengthPrune.register(spark)

    // dd6-shaped candidate pairs WITHOUT the hand-written length filter:
    // the rule must add it
    val docs = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L)),
      (2L, Seq(1L, 2L, 3L)),          // subset, J = 3/5 = 0.6 (boundary kept)
      (3L, Seq(1L, 9L)),              // J vs 1 = 1/6; sizes (2,5) prunable
      (4L, Seq(1L, 2L, 3L, 4L, 5L))   // J vs 1 = 1.0
    ).toDF("doc_id", "bg")
      // parquet-backed BEFORE the size() column, not a LocalRelation:
      // ConvertToLocalRelation would eagerly evaluate size() into literal
      // rows (and a post-withColumn roundtrip would bake n into parquet),
      // erasing the alias structure the rule must VERIFY before injecting
      // (na/nb provably the cardinalities of the intersected arrays —
      // the r14 soundness fix)
      .transform(roundtripParquet("jlp1"))
      .withColumn("n", size(col("bg")))
    val a = docs.select(col("doc_id").as("da"), col("bg").as("ba"), col("n").as("na"))
    val b = docs.select(col("doc_id").as("db"), col("bg").as("bb"), col("n").as("nb"))
    val sic = call_function("sorted_intersect_count", col("ba"), col("bb"))
    val q = a.crossJoin(b).filter(col("da") < col("db"))
      .withColumn("j", sic.cast("double") / (col("na") + col("nb") - sic).cast("double"))
      .filter(col("j") >= 0.6)
      .select(col("da"), col("db"), col("j"))

    // the prune conjunct (least/greatest over the size columns) is injected
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least(") && optimized.contains("greatest("),
      s"expected injected length prune in:\n$optimized")

    // results identical to the semantic definition — including the J = 0.6
    // boundary pair, which the 1e-9 slack must NOT prune
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("a ratio over counts that are NOT the intersected arrays' sizes " +
    "is never pruned (soundness)") {
    graft.expr.VectorExpressions.register(spark)
    graft.plans.JaccardLengthPrune.register(spark)
    // weighted counts x=1, y=9 over an equal-array intersection: the
    // ratio 4/((1+9)-4) = 0.667 >= 0.5 qualifies semantically, but
    // least(1,9) >= 0.5*greatest(1,9) is FALSE — the pre-r14 unverified
    // match injected exactly that prune and silently dropped the row
    val df = Seq((1L, Seq(1L, 2L, 3L, 4L), 1, 9))
      .toDF("id", "bg", "x", "y").transform(roundtripParquet("jlp3"))
    val sic = call_function("sorted_intersect_count", col("bg"), col("bg"))
    val q = df.filter(
      sic.cast("double") / (col("x") + col("y") - sic).cast("double") >= 0.5)
    assert(!q.queryExecution.optimizedPlan.toString.contains("least("),
      "prune must not be injected when na/nb are unverifiable counts")
    assert(q.count() == 1L, "the qualifying row was wrongly pruned")
  }

  test("the injected prune is idempotent across fixed-point optimizer runs") {
    graft.expr.VectorExpressions.register(spark)
    graft.plans.JaccardLengthPrune.register(spark)
    val docs = Seq((1L, Seq(1L, 2L)), (2L, Seq(1L, 2L))).toDF("doc_id", "bg")
      .transform(roundtripParquet("jlp2"))
      .withColumn("n", size(col("bg")))
    val a = docs.select(col("doc_id").as("da"), col("bg").as("ba"), col("n").as("na"))
    val b = docs.select(col("doc_id").as("db"), col("bg").as("bb"), col("n").as("nb"))
    val sic = call_function("sorted_intersect_count", col("ba"), col("bb"))
    val q = a.crossJoin(b)
      .withColumn("j", sic.cast("double") / (col("na") + col("nb") - sic).cast("double"))
      .filter(col("j") >= 0.5)
    val plan = q.queryExecution.optimizedPlan.toString
    // exactly one least(...) occurrence per jaccard conjunct, not one per
    // fixed-point iteration
    assert(plan.split("least\\(").length - 1 == 1, s"non-idempotent injection:\n$plan")
  }
}
