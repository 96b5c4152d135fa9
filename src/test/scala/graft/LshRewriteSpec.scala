package graft

import org.apache.spark.sql.functions._
import graft.plans.LshBucketRewrite

/** [[graft.plans.LshBucketRewrite]]: the `lsh_candidates` marker contract —
  * exact `true` fallback without the rule, sign-LSH bucket equi-join with
  * it, and result parity with the hand-written sim3 plan. */
class LshRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def vecs() = {
    graft.expr.VectorExpressions.register(spark)
    spark.range(40).select(col("id").as("vid"),
      transform(sequence(lit(0), lit(7)),
        i => (cos(col("id") * (i + 1)) * 10).cast("double")).as("v"))
  }

  private def markerJoin(df: org.apache.spark.sql.DataFrame) = {
    val a = df.select(col("vid").as("ida"), col("v").as("va"))
    val b = df.select(col("vid").as("idb"), col("v").as("vb"))
    a.join(b, call_function("lsh_candidates", col("va"), col("vb")) &&
      col("ida") < col("idb"))
  }

  private def withoutRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == LshBucketRewrite)
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("without the rule the marker is literal true — exact all-pairs") {
    withoutRule {
      val n = vecs().count()
      assert(markerJoin(vecs()).count() == n * (n - 1) / 2,
        "marker must not restrict pairs when the rewrite is absent")
    }
  }

  test("with the rule the join becomes a hash join on the signature") {
    LshBucketRewrite.register(spark)
    val joined = markerJoin(vecs())
    joined.collect() // finalize the adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("_lsh_sig"), s"expected injected signature cols:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash join on the bucket:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"marker join must not plan as a nested loop:\n$plan")
  }

  test("rewritten pairs are exactly the same-bucket subset") {
    LshBucketRewrite.register(spark)
    val all = withoutRule(markerJoin(vecs()).select("ida", "idb").collect()).toSet
    val bucketed = markerJoin(vecs()).select("ida", "idb").collect().toSet
    assert(bucketed.subsetOf(all), "rewrite invented pairs")
    assert(bucketed.nonEmpty, "degenerate test: no same-bucket pair at all")
  }

  test("sim4 (rule-derived) matches sim3 (hand-written) row for row") {
    val sim3 = operators.Similarity.queries("sim3_lsh_topk")(spark, sf).collect()
    val sim4 = operators.Similarity.queries("sim4_lsh_rewrite")(spark, sf).collect()
    assert(sim4.toSeq == sim3.toSeq,
      "optimizer-derived LSH plan diverged from the hand-written one")
  }

  test("rewrite is idempotent at the optimizer fixed point") {
    LshBucketRewrite.register(spark)
    val once = markerJoin(vecs()).queryExecution.optimizedPlan
    assert(LshBucketRewrite(once).canonicalized == once.canonicalized,
      "re-applying the rule to an already-rewritten plan changed it")
  }

  test("a literal (reference-free) marker argument resolves on the " +
      "correct side and still buckets") {
    // a LITERAL query vector's reference set is EMPTY — a subset of
    // EITHER side — so a tie-break deciding by the first argument alone
    // projected the column-bearing side's signature onto the wrong child
    // (unresolvable at binding; r15 review). Both argument orders must
    // plan AND return exactly the same-bucket subset vs the exact join.
    // End-to-end, pushdown moves a single-side marker below the join
    // before the user-provided batch runs, so the rule only meets this
    // shape under DIRECT application (tools / RulesSpec-style tests) —
    // which is exactly where the old tie-break produced a Project whose
    // signature expression referenced the OTHER child's column. Apply
    // the rule to the pre-pushdown analyzed plan and require every node
    // to keep a consistent input set, for BOTH argument orders.
    val qv = typedlit((0 until 8).map(i => math.cos(3.0 * (i + 1)) * 10))
    val a = vecs().select(col("vid").as("ida"), col("v").as("va"))
    Seq(true, false).foreach { litFirst =>
      val m =
        if (litFirst) call_function("lsh_candidates", qv, col("va"))
        else call_function("lsh_candidates", col("va"), qv)
      val analyzed = a.join(spark.range(1), m).queryExecution.analyzed
      val rewritten = LshBucketRewrite(analyzed)
      assert(rewritten.treeString.contains("_lsh_sig"),
        "rule did not fire on the literal-arg marker join")
      val broken = rewritten.collect {
        case n if n.missingInput.nonEmpty =>
          s"${n.nodeName} missing ${n.missingInput.mkString(",")}"
      }
      assert(broken.isEmpty,
        s"litFirst=$litFirst: signature projected onto the wrong side:\n" +
          broken.mkString("\n"))
    }
  }
}
