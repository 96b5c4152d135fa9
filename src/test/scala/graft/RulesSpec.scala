package graft

import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {
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
    ).toDF("doc_id", "bg").withColumn("n", size(col("bg")))
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

  test("the injected prune is idempotent across fixed-point optimizer runs") {
    graft.expr.VectorExpressions.register(spark)
    graft.plans.JaccardLengthPrune.register(spark)
    val docs = Seq((1L, Seq(1L, 2L)), (2L, Seq(1L, 2L))).toDF("doc_id", "bg")
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
