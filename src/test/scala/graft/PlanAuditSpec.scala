package graft

/** Fleet-wide physical-plan audit: no registry query may silently plan a
  * cartesian product or nested-loop join — the two shapes that turn a
  * 100 TB query into an outage. The exceptions are DELIBERATE and named:
  *
  *   - sim1/sim5: the exact brute-force baselines — a bounded probe set
  *     (fixed budget, see Similarity's probe contract) cross-joined
  *     against the corpus scan on purpose;
  *   - x11: the registered demonstration of Spark's pure non-equi
  *     nested-loop join tier.
  *
  * Everything else must key every join. The audit inspects the UNEXECUTED
  * sparkPlan (no data runs); queries that execute work at build time
  * (streaming replays, dd8/p1's iterative driver loop) are skipped — their
  * internal joins are covered by their own oracles and specs. */
class PlanAuditSpec extends SparkSpec {

  // sim6 joins the corpus against a broadcast of K=8 FIXED centroids — a
  // deliberate bounded-small-side nested loop (K is a constant, not a
  // corpus fraction), same contract as sim1/sim5's probe budget;
  // sim10 scans the 4-byte code index against the bounded probe broadcast
  // t11 attaches a ONE-ROW broadcast N frame (corpus doc count) via a
  // cross join — a map-side constant attach, not a pair blowup; the build
  // side is a single aggregated row at any corpus size
  private val allowCross = Set("sim1_cosine_topk", "sim5_int8_topk",
    "sim6_kmeans_assign", "sim7_kmeans_update",
    "sim10_pq_topk", "x11_nested_loop_join", "t11_tfidf_keywords")
  // execute at build time (stream replay / iterative convergence loop):
  // auditing their *returned* frame would inspect a LocalRelation or
  // post-hoc plan, not the interesting join pipeline. The streaming
  // namespace is matched PRECISELY (s<digits>_) — a bare startsWith("s")
  // would silently drop a future batch query named e.g. skew1_/sort2_
  // from the audit.
  private val executesAtBuild: String => Boolean = n =>
    n.matches("s\\d+_.*") ||
      n == "dd8_dedup_clusters" || n == "p1_pipeline_manifest" ||
      // iterative Lloyd loop / two-pass rank: both materialize eagerly and
      // return a LocalRelation; their join/sort shapes are spec-audited in
      // SimilaritySpec and TextMultimodalSpec respectively
      n == "sim8_kmeans_iterate" || n == "t9_quality_deciles" ||
      // RangeRank prefix-sum consumers: the two-pass scan collects the
      // per-partition totals at build (driver sees P longs) and the packed
      // manifest is collected-and-released, so the returned frame is a
      // LocalRelation; the distributed sort shape is audited in
      // PipelineOpsSpec on the pinned sortedFrame
      n == "p5_token_shards" || n == "p7_incremental_shards" ||
      n == "p8_curriculum_shards" || n == "p9_epoch_shuffle" ||
      n == "p10_corpus_build" ||
      // p11 writes the shard layout at build; the returned frame is the
      // read-back scan+aggregate over the landed files (join-free), its
      // pruning asserted in PipelineOpsSpec
      n == "p11_landed_shards" ||
      // collect-and-release of the pinned shingle frame: the flagged
      // manifest returns as a LocalRelation; the join shape is audited by
      // the dd11 oracle + DedupSpec's driver recompute
      n == "dd11_decontaminate" ||
      // round-8 eager ANN queries (persisted shared embedding frame,
      // collect-and-release, LocalRelation result — the sim8 lifecycle);
      // sim9's ground-truth arm is sim1's deliberate brute-force baseline
      // and the arms' join shapes are audited via sim2/sim3/sim10/sim12's
      // still-lazy plans + SimilaritySpec's driver recomputes
      n == "sim9_recall_at_k" || n == "sim11_ivf_multiprobe" ||
      n == "sim13_ivf_pq" || n == "sim14_recall_bar"

  test("no undeclared cartesian/nested-loop join in any registry plan") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(executesAtBuild)
      .filterNot(allowCross)
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct") || plan.contains("NestedLoopJoin"))
          Some(name -> plan.linesIterator.filter(l =>
            l.contains("CartesianProduct") || l.contains("NestedLoopJoin"))
            .mkString("; "))
        else None
      }
    assert(offenders.isEmpty,
      offenders.map { case (n, l) => s"$n: $l" }.mkString("\n"))
  }
}
