package graft

import org.apache.spark.sql.functions.{col, lit, sum}

/** Growth-ratio bounds for the scale blow-up harness ([[Scale]]): at ×8
  * the five bucketed operators' found rows and candidate-pair counts must
  * track their declared banding-math models (see Scale's scaladoc —
  * linear for dd3's 60-bit bands and sim11's probed-cell fraction,
  * linear-with-reroll for dd6's PPJoin prefix join plus EXACT N× found
  * rows, bounded-between for the 16-bit band spaces), and dd3's runtime
  * must stay inside the linear bound.
  * Counting invariants are deterministic (no timing flake); the single
  * runtime assertion carries the harness's generous slack + absolute
  * floor, so it catches a linear claim going quadratic, not host noise. */
class ScaleSpec extends SparkSpec {

  private val baseDir = "/root/testdata/sf0.01"
  private lazy val outRoot = "/tmp/graft-scale-sf0.01"

  test("spillBound: linear ops catch the r14 SMJ cliff, quad ops admit " +
    "candidate-linear spill only") {
    val MB = 1L << 20
    // the r14 regression signature: zero spill at the base, ~213 MB per
    // factor unit at x32 (6.8 GB total) on a LINEAR-model op — must fail
    assert(6800L * MB > Scale.spillBound("prefix", 32, 0L, 0L),
      "linear budget must reject the r14 SMJ candidate-sort spill")
    // healthy linear growth (2x the base extrapolation) passes
    assert(10L * MB * 32 * 2 <= Scale.spillBound("prefix", 32, 10L * MB, 0L))
    // quad-by-spec: dd16 x32's measured shape — 110.3M candidates
    // spilling ~39 B each through the collision distinct — passes...
    val cand = 110332071L
    assert(39L * cand <= Scale.spillBound("quadspec", 32, 0L, cand),
      "quad budget must admit an external agg spilling each candidate once")
    // ...but super-candidate-linear spill (a payload-attached pair list:
    // the dd16 first-cut 34 GB class) still fails
    assert(34L * 1024 * MB > Scale.spillBound("quadspec", 32, 0L, cand),
      "quad budget must still reject payloads-through-the-fanout spill")
  }

  test("runtimeOk: I/O-bound rows are budgeted on the control ratio, " +
    "everything else on wall-clock") {
    // r17 verdict ask 1 — dd6 ×64 spans 26.9-87.7 s on identical code
    // (pure disk state): a raw-seconds budget prices the host, not the
    // plan. The decision rule: at factors ≥ the op's ioBoundFrom, the
    // flag compares sec/control_sec against the bound seeded with the
    // base row's ratio — a host whose disk is N× slower slows the
    // control N× too, cancelling out.
    // dd6-shaped numbers: base 8 s at control 2 s (ratio 4). A run on a
    // collapsed-disk host — op 64× slower AND control 64× slower — keeps
    // ratio 4 and must PASS the ioBound budget...
    assert(Scale.runtimeOk("prefix", 64, ioBound = true,
      baseSec = 8.0, baseCtl = 2.0, sec = 512.0, ctl = 128.0),
      "a uniform host slowdown (flat ratio) must pass the ratio budget")
    // ...while a blow-past-the-budget run on a HEALTHY host (flat
    // control → ratio 600 vs the base-ratio-4 bound of ~425) must FAIL
    assert(!Scale.runtimeOk("prefix", 64, ioBound = true,
      baseSec = 8.0, baseCtl = 2.0, sec = 1200.0, ctl = 2.0),
      "a real ratio regression at flat control must fail the ratio budget")
    // non-ioBound rows keep the wall-clock bound exactly: 900 s at ×64
    // off an 8 s base trips base×64×1.6+15 = 834.2 (and would have
    // PASSED the ratio budget at ctl 128 — the control must be ignored)
    assert(!Scale.runtimeOk("prefix", 64, ioBound = false,
      baseSec = 8.0, baseCtl = 2.0, sec = 900.0, ctl = 128.0),
      "wall-clock rows must ignore the control entirely")
    // degenerate controls (failed/zero) fall back to wall-clock rather
    // than dividing by zero or passing vacuously
    assert(!Scale.runtimeOk("prefix", 64, ioBound = true,
      baseSec = 1.0, baseCtl = 0.0, sec = 900.0, ctl = 2.0),
      "a zero base control must fall back to the wall-clock bound")
  }

  test("every construction-runs-corpus-jobs query has a construction-audit " +
    "factor") {
    // r17 verdict ask 2's drift guard: a query added to the construction
    // skip list without an entry here would silently fall back to the
    // pre-r17 skip-outright behavior — its plan at scale unaudited.
    assert(Scale.ConstructionAuditFactors.keySet ==
        SparkEntry.constructionRunsCorpusJobs,
      s"ConstructionAuditFactors drifted from constructionRunsCorpusJobs: " +
        s"missing=${SparkEntry.constructionRunsCorpusJobs --
          Scale.ConstructionAuditFactors.keySet} " +
        s"extra=${Scale.ConstructionAuditFactors.keySet --
          SparkEntry.constructionRunsCorpusJobs}")
    // audit factors must be real sweep factors (the committed recipe
    // synthesizes exactly these dirs)
    Scale.ConstructionAuditFactors.values.foreach(f =>
      assert(Scale.CommittedSweepFactors.contains(f),
        s"construction-audit factor $f is not in the committed recipe"))
  }

  test("every eager query has an eager-audit factor; the capture hook is " +
    "live on Engine sessions") {
    // r17's eager-audit drift guard (the construction-set rule, applied to
    // the eager class): a query added to eagerQueries without a factor
    // here would silently fall back to skip-outright
    assert(Scale.EagerAuditFactors.keySet == SparkEntry.eagerQueries,
      s"EagerAuditFactors drifted from eagerQueries: " +
        s"missing=${SparkEntry.eagerQueries --
          Scale.EagerAuditFactors.keySet} " +
        s"extra=${Scale.EagerAuditFactors.keySet -- SparkEntry.eagerQueries}")
    Scale.EagerAuditFactors.values.foreach(f =>
      assert(Scale.CommittedSweepFactors.contains(f),
        s"eager-audit factor $f is not in the committed recipe"))
    // the capture hook must actually observe plans on an Engine-built
    // session — an extensions-wiring regression would make every
    // eager_audited row an empty-flags vacuity
    val q = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    graft.plans.PlanCapture.sink = Some(q)
    try spark.range(100).groupBy((col("id") % 3).as("k")).count().collect()
    finally graft.plans.PlanCapture.sink = None
    assert(!q.isEmpty,
      "PlanCapture saw no plan from an executed aggregate — the " +
        "query-stage-prep injection is not wired into Engine sessions")
  }

  test("eager-audit adjudications hold under capture: p10's corpus attaches " +
    "and x46's merge source stay shuffled-hash") {
    import scala.jdk.CollectionConverters._
    // the r17 eager audit caught both planning doc_id-keyed BROADCASTS of
    // corpus-proportional build sides; the fixes are hints, which force
    // SHJ at ANY stats — so at this spec's tiny SF (where unhinted plans
    // would broadcast) a lost hint makes the SHJ below disappear
    def capturedPlans(name: String): Seq[String] = {
      val q = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.execution.SparkPlan]()
      graft.plans.PlanCapture.sink = Some(q)
      try SparkEntry.queries(name)(spark, sf): Unit
      finally graft.plans.PlanCapture.sink = None
      q.asScala.toSeq.map(_.toString)
    }
    def maxShj(plans: Seq[String]): Int =
      (0 +: plans.map(_.linesIterator.count(_.contains("ShuffledHashJoin")))).max
    assert(maxShj(capturedPlans("p10_corpus_build")) >= 2,
      "p10's quality-attach + contamination anti-join SHJ pins regressed")
    assert(maxShj(capturedPlans("x46_merge_upsert")) >= 1,
      "x46's merge-source SHUFFLE_HASH view hint regressed")
  }

  test("the streaming drain offers the last micro-batch plan to an armed " +
    "capture sink (the streaming audit's capture surface)") {
    import scala.jdk.CollectionConverters._
    val q = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    graft.plans.PlanCapture.sink = Some(q)
    try SparkEntry.queries("s1_tumbling_window")(spark, sf): Unit
    finally graft.plans.PlanCapture.sink = None
    // micro-batch executions bypass query-stage prep, so a captured plan
    // here can only come from StreamingOps.drain's reflective stash — a
    // Spark-internal rename of streamingQuery/lastExecution would land as
    // zero captures, which the audit records as a loud skip and THIS pin
    // turns into a test failure
    assert(!q.isEmpty, "drain captured no micro-batch plan — the " +
      "reflective lastExecution stash is broken (streaming audit would " +
      "skip every s-query loudly)")
    // the captured tree must be a REAL micro-batch plan, not a stub: s1's
    // windowed agg runs stateful, so its plan carries state-store nodes
    assert(q.asScala.exists(_.toString.contains("StateStore")),
      "captured plan carries no StateStore node — wrong plan captured")
  }

  test("s20's state-rows bound fails on the -1 no-telemetry sentinel " +
    "instead of passing vacuously") {
    val s20 = Scale.ops.find(_.name == "s20_stream_dedup").get
    // a healthy linear measurement passes
    assert(s20.extraTrack(8, Map("state_rows" -> 1000L),
      Map("state_rows" -> 8000L)))
    // the -1 "no state operators in the final progress" sentinel on
    // either side must FAIL the bound (r17 review: -1 on both sides
    // satisfied the linear band and committed extra_within_bound true
    // with no measurement run)
    assert(!s20.extraTrack(8, Map("state_rows" -> -1L),
      Map("state_rows" -> -1L)))
    assert(!s20.extraTrack(8, Map("state_rows" -> 1000L),
      Map("state_rows" -> -1L)))
  }

  test("copy bijections are pairwise DISTANT through ×65") {
    // distinctness is not enough: two maps agreeing on most of the
    // alphabet make their copies byte-level near-duplicates (r14 found
    // copies 1/28 agreeing on ~2/3 of the letters under the old
    // cycle-rotation scheme — mm6's dispersed dHash correctly flagged
    // them cross-copy, the "banded16sat" tail). Pin the MIN-DISAGREE
    // contract the min-distance shuffles guarantee.
    def canonical(k: Int): String = {
      val (src, dst) = Scale.copyMapping(k)
      val m = src.zip(dst).toMap
      "abcdefghijklmnopqrstuvwxyz".map(m)
    }
    val maps = (0 until 65).map(canonical)
    for (i <- maps.indices; j <- (i + 1) until maps.size) {
      val agree = maps(i).indices.count(p => maps(i)(p) == maps(j)(p))
      assert(agree <= 26 - Scale.MinLetterDisagree,
        s"letter maps of copies $i and $j agree on $agree/26 positions — " +
          "their copies are byte-level near-duplicates")
    }
    def canonicalDigits(k: Int): String = {
      val (src, dst) = Scale.copyMapping(k)
      val m = src.zip(dst).toMap
      "0123456789".map(m)
    }
    val dmaps = (0 until 65).map(canonicalDigits)
    for (i <- dmaps.indices; j <- (i + 1) until dmaps.size) {
      val agree = dmaps(i).indices.count(p => dmaps(i)(p) == dmaps(j)(p))
      assert(agree <= 10 - Scale.MinDigitDisagree,
        s"digit maps of copies $i and $j agree on $agree/10 positions")
    }
    // each mapping is a true bijection over its source alphabet
    (0 until 65).foreach { k =>
      val (src, dst) = Scale.copyMapping(k)
      assert(dst.sorted == src.sorted && dst.distinct.length == dst.length,
        s"copy $k mapping is not a bijection")
    }
    assert(Scale.copyMapping(0)._1 == Scale.copyMapping(0)._2,
      "copy 0 must be the identity (the ×1 run is the registered query)")
  }

  test("corpus-broadcast detector: each flag rule fires on a constructed " +
    "plan and stays silent on adaptive ones") {
    // Nothing in the committed plan_audit.json's flagged:[] proves the
    // detector CAN fire — these constructed plans pin each rule.
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    val cust = Catalog.table(spark, sf, "customer")
    val ord = Catalog.table(spark, sf, "orders")
    def flags(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Scale.corpusBroadcastFlags(df.queryExecution.sparkPlan)

    // 1. stats-driven broadcast of a corpus-scaled relational table: the
    //    planner's accurate file stats picked it at THIS size and flip it
    //    at scale — adaptive, must NOT flag
    val stats = ord.join(cust, col("o_custkey") === col("c_custkey"))
    assert(stats.queryExecution.sparkPlan.toString
        .contains("BroadcastHashJoin"),
      "precondition: tiny files must plan a broadcast join")
    assert(flags(stats).isEmpty,
      "stats-adaptive relational broadcast must not flag")

    // 2. the SAME join hint-PINNED: cannot flip at any size — must flag
    val pinned = ord.join(broadcast(cust),
      col("o_custkey") === col("c_custkey"))
    assert(flags(pinned).nonEmpty,
      "hint-pinned relational broadcast must flag (the q3/q5/q17/q29/" +
        "q30/q31 class r16 removed)")

    // 3. STRICT leaf through a cache: a persisted corpus-derived frame's
    //    pre-materialization stats lie (the dd6 class) — must flag even
    //    though the underlying leaf is a plain scan
    val docsIds = Catalog.table(spark, sf, "documents")
      .select(col("doc_id")).persist()
    try {
      val viaCache = Catalog.table(spark, sf, "documents")
        .join(broadcast(docsIds), Seq("doc_id"))
      assert(flags(viaCache).nonEmpty,
        "cached corpus-derived broadcast build must flag (dd6 class)")
    } finally { docsIds.unpersist(): Unit }

    // 4. a corpus-INDEPENDENT aggregate bounds the build (5 segments):
    //    broadcasting it is permanently right — silent even when pinned
    val seg = cust.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
    assert(flags(ord.join(broadcast(seg),
        col("o_orderpriority") === col("c_mktsegment"), "left")).isEmpty,
      "bounded-group aggregate broadcast must not flag")

    // 5. an ID-KEYED aggregate does NOT bound (|customer| groups): the
    //    r15 dd9-class rule, extended to the relational key families
    val perKey = cust.groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_rows"))
    assert(flags(ord.join(broadcast(perKey),
        col("o_custkey") === col("c_custkey"))).nonEmpty,
      "custkey-grouped aggregate must stay corpus-scale under the walk")
  }

  test("dim-join adaptivity across ALL SIX hint-removed queries: scaling " +
    "dims flip past the threshold, fixed dims stay hinted-broadcast") {
    // the r16 hint-removal's empirical half, parameterized over the whole
    // class (r17 verdict ask 4 — previously only q5 had the flip proof):
    // at the default threshold the planner broadcasts the scaling dims
    // (customer/supplier/part) from accurate stats (today's fast plan);
    // when the dims outgrow the threshold — emulated by shrinking it,
    // which is what growing data does to a fixed threshold — the SAME
    // query flips those joins to shuffled strategies, while nation/region
    // (fixed 25/5 rows, explicitly hinted) stay broadcast at ANY
    // threshold. A pinned broadcast(customer) would fail the second half
    // — exactly the 100 TB defect class the audit flags.
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val cases: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, Seq[String], Boolean)] = Seq(
      ("q3", operators.Relational.q3TopRevenue, Seq("custkey"), false),
      ("q5", operators.Relational.q5LocalSupplier,
        Seq("custkey", "suppkey"), true),
      ("q17", operators.Relational.q17PromoRatio, Seq("partkey"), false),
      ("q29", operators.Coverage.q29WideStar,
        Seq("custkey", "suppkey", "partkey"), true),
      ("q30", operators.Coverage.q30Disjunctive, Seq("partkey"), false),
      ("q31", operators.Coverage.q31VolumeShipping,
        Seq("custkey", "suppkey"), true))
    def bhjKeys(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, threshold: String): Seq[String] = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try fn(spark, sf).queryExecution.sparkPlan.collect {
        case b: BroadcastHashJoinExec => b.leftKeys.mkString(",")
      }
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    cases.foreach { case (name, fn, scalingKeys, hasFixedDims) =>
      val atDefault = bhjKeys(fn, "10MB")
      scalingKeys.foreach(k => assert(atDefault.exists(_.contains(k)),
        s"$name: at test SF the scaling dim '$k' should broadcast from " +
          s"stats: $atDefault"))
      val pastThreshold = bhjKeys(fn, "1KB")
      scalingKeys.foreach(k => assert(!pastThreshold.exists(_.contains(k)),
        s"$name: the '$k' join must FLIP once the dim outgrows the " +
          s"threshold (a pinned broadcast cannot): $pastThreshold"))
      if (hasFixedDims)
        assert(pastThreshold.exists(k =>
            k.contains("nationkey") || k.contains("regionkey")),
          s"$name: hinted fixed dims (nation/region) must stay broadcast " +
            s"at any threshold: $pastThreshold")
    }
  }

  test("×8 blow-up: rows and candidates track each operator's banding model") {
    val d1 = Scale.ensureBlowup(spark, baseDir, outRoot, 1)
    val d8 = Scale.ensureBlowup(spark, baseDir, outRoot, 8)

    def check(name: String, model: String,
        rowsOf: String => Long, candOf: String => Long): (Long, Long) = {
      val (r1, c1) = (rowsOf(d1), candOf(d1))
      val (r8, c8) = (rowsOf(d8), candOf(d8))
      assert(r1 > 0, s"$name: ×1 must find rows (fixture drift?)")
      assert(Scale.rowsTrack(name, model, 8, r1, r8),
        s"$name rows off-model: ×1=$r1, ×8=$r8 ($model)")
      assert(Scale.candTrack(model, 8, c1, c8),
        s"$name candidates off-model: ×1=$c1, ×8=$c8 ($model)")
      (r1, r8)
    }

    check("dd3_minhash", "linear",
      d => operators.Dedup.minhashNearDup(spark, d).count(),
      d => operators.Dedup.minhashPieces(spark, d)._2.count())
    check("dd6_ngram", "prefix",
      d => operators.Dedup.ngramJaccard(spark, d).count(),
      d => operators.Dedup.ngramCandidateFrame(spark, d).count())
    check("dd15_edit", "banded16",
      d => operators.Dedup.editDistanceNearDup(spark, d).count(),
      d => operators.Dedup.editCandidateFrame(spark, d).count())
    check("dd13_bloom_decontam", "linearRR",
      d => operators.Dedup.decontaminateBloom(spark, d).count(),
      d => {
        val flagged = operators.Dedup.decontaminateBloomPlan(spark, d)
        Option(flagged.agg(sum(col("n_shared"))).head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
      })
    check("mm6_phash", "banded16",
      d => operators.Multimodal.perceptualNearDup(spark, d).count(),
      d => operators.Multimodal.perceptualPieces(spark, d)._2.count())
    // q29: the sweep's relational row — output rows are the rollup's
    // group space (factor-independent: copies repeat the same dims);
    // "candidates" = the filtered fact rows, exactly N× by construction
    Scale.ensureRelationalBlowup(spark, baseDir, outRoot, 1)
    Scale.ensureRelationalBlowup(spark, baseDir, outRoot, 8)
    check("q29_wide_star", "linear",
      d => operators.Coverage.q29WideStar(spark, d).count(),
      d => Catalog.table(spark, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .count())
    // dd5: QUADRATIC BY SPEC — candidates are the exact within-cell pair
    // count Σ C(c·N, 2) (copies keep their label), and found rows are ~N²
    // because the embedding copies are ±2.4%-perturbed semantic near-dups
    // of their originals (cross-copy pairs genuinely qualify — unlike the
    // text bijections' disjoint copies). The model's value: a candidate
    // count slipping BELOW N²·base means the stage silently lost pairs
    // (lost recall), and rows leaving the N² band means the fixture's
    // semantic-duplicate density drifted.
    val (dd5f1, dd5f8) = check("dd5_embed", "quadspec",
      d => operators.Dedup.embeddingNearDup(spark, d).count(),
      d => operators.Dedup.embeddingCandidateFrame(spark, d).count())
    // and the PRECISE two-term model (found = base·N² + V·C(N,2), the
    // self-pair term measured not bounded) — shared with the harness's
    // extraTrack via Scale.dd5RowsOk so the two cannot silently diverge
    val dd5v1 = operators.Similarity.emb(spark, d1).count()
    assert(Scale.dd5RowsOk(8, dd5f1, dd5v1, dd5f8),
      s"dd5 found rows off the two-term model: ×1=$dd5f1 V=$dd5v1 ×8=$dd5f8")
    // dd16: the banded screen over the same pair space — same quadspec
    // class and two-term output model (self-pairs sit at cos ≈ 1 where
    // band recall ≈ 1), with the candidate constant cut to the 48-band
    // incidental floor
    val (dd16f1, dd16f8) = check("dd16_banded", "quadspec",
      d => operators.Dedup.semanticDedupBanded(spark, d).count(),
      d => operators.Dedup.semanticDedupCandidates(spark, d).count())
    assert(Scale.dd5RowsOk(8, dd16f1, dd5v1, dd16f8),
      s"dd16 found rows off the two-term model: ×1=$dd16f1 V=$dd5v1 ×8=$dd16f8")
    // sim11: output is |probes|×k at ANY factor; candidates (probed-cell
    // rows through the registered arm's own cell selection) grow ≈ N×
    val (s1, s8) = (operators.Similarity.ivfMultiProbeTopK(spark, d1).count(),
      operators.Similarity.ivfMultiProbeTopK(spark, d8).count())
    assert(s1 == s8, s"sim11 output must be factor-independent ($s1 vs $s8)")
    def simCand(d: String): Long = {
      val corpus = operators.Similarity.emb(spark, d)
      val n = corpus.count()
      val (_, frac) = operators.Similarity
        .ivfMultiRecallFraction(spark, corpus, operators.Similarity.NProbe)
      math.round(frac * 10 * n)
    }
    assert(Scale.candTrack("linear", 8, simCand(d1), simCand(d8)),
      "sim11 probed-cell candidates must grow ~linearly")

    // dd8: CC over the prefix-banded dd6 pairs — edges exactly N×, labels
    // one per doc (exactly N×), and ROUNDS FLAT (copies replicate
    // clusters, never deepen them) so per-round shuffle × rounds ≈ linear
    val (l1, l8) = (operators.Dedup.dedupClusters(spark, d1).count(),
      { val c = operators.Dedup.dedupClusters(spark, d8).count(); c })
    val rounds8 = operators.Dedup.lastCcRounds
    operators.Dedup.dedupClusters(spark, d1).count(): Unit
    val rounds1 = operators.Dedup.lastCcRounds
    assert(l8 == l1 * 8, s"dd8 labels must be exactly ×8 ($l1 -> $l8)")
    assert(rounds8 <= rounds1 + 1,
      s"dd8 CC rounds must stay flat under blow-up ($rounds1 -> $rounds8)")
    val (e1, e8) = (operators.Dedup.verifiedNgramPairs(spark, d1).count(),
      operators.Dedup.verifiedNgramPairs(spark, d8).count())
    assert(e8 == e1 * 8, s"dd8 edge list must be exactly ×8 ($e1 -> $e8)")

    // dd17: the keep map rides the landed labels (d1's memo is live from
    // the rounds measurement above) — one row per quality-eligible doc,
    // exactly N× under blow-up
    val k1 = operators.Dedup.canonicalKeep(spark, d1).count()
    val k8 = operators.Dedup.canonicalKeep(spark, d8).count()
    assert(k8 == k1 * 8, s"dd17 keep map must be exactly ×8 ($k1 -> $k8)")

    // sim15: landed serve — output |probes|×k at any factor; the serve
    // OPENS a flat number of cell-pruned blocks (bigger blocks, not more)
    def servedBlocks(d: String): (Long, Long) = {
      operators.Similarity.ensureLandedIndex(spark, d): Unit
      val before = sources.BlockStore.readersOpened.get
      val rows = operators.Similarity.landedAnnTopK(spark, d).count()
      (rows, sources.BlockStore.readersOpened.get - before)
    }
    val ((sr1, sb1), (sr8, sb8)) = (servedBlocks(d1), servedBlocks(d8))
    assert(sr1 == sr8, s"sim15 output must be factor-independent ($sr1 vs $sr8)")
    assert(sb8 <= sb1 * 2 + 4,
      s"sim15 opened blocks must stay flat under blow-up ($sb1 -> $sb8)")

    // dd9: the incremental probe through the SHARED prefix rows —
    // output rows = |incoming| (the doc_id % 5 slice, membership
    // re-rolls per copy under the id shift) and candidates both track
    // ~N×; the INDEX-INDEPENDENCE claim is the fan-in ratio: candidates
    // per 1k incoming docs must stay ~flat as the index grows 8×
    def dd9(d: String): (Long, Long, Long) = {
      val rows = operators.Dedup.incrementalDedup(spark, d).count()
      val cand = operators.Dedup.incrementalCandidateIds(spark, d).count()
      val incoming = Catalog.table(spark, d, "documents")
        .filter(col("doc_id") % 5 === 0).count()
      (rows, cand, incoming)
    }
    val ((dr1, dc1, di1), (dr8, dc8, di8)) = (dd9(d1), dd9(d8))
    assert(Scale.rowsTrack("dd9_incremental", "linearRR", 8, dr1, dr8),
      s"dd9 rows off-model: ×1=$dr1, ×8=$dr8 (linearRR)")
    assert(Scale.candTrack("linearRR", 8, dc1, dc8),
      s"dd9 candidates off-model: ×1=$dc1, ×8=$dc8 (linearRR)")
    val (fan1, fan8) = (dc1 * 1000 / di1, dc8 * 1000 / di8)
    assert(Scale.dd9FanInOk(fan1, fan8),
      s"dd9 per-incoming fan-in must stay ~flat ($fan1 -> $fan8 per 1k)")

    // s25: streaming ingest — the feed grows N×, the served output stays
    // |probes|×k (ingest cost is per-batch; the drained index serves
    // identically at any batch partitioning)
    val (i1, i8) = (streaming.StreamingOps.streamAnnIngest(spark, d1).count(),
      streaming.StreamingOps.streamAnnIngest(spark, d8).count())
    assert(i1 == i8, s"s25 served output must be factor-independent ($i1 vs $i8)")
    val (f1, f8) = (operators.Similarity.ingestFeedIds(spark, d1).count(),
      operators.Similarity.ingestFeedIds(spark, d8).count())
    assert(Scale.candTrack("linear", 8, f1, f8),
      s"s25 ingested feed must grow ~linearly ($f1 -> $f8)")
  }

  test("×8 blow-up: dd3 and dd15 runtimes stay inside the linear bound") {
    val d1 = Scale.ensureBlowup(spark, baseDir, outRoot, 1)
    val d8 = Scale.ensureBlowup(spark, baseDir, outRoot, 8)
    def sec(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      operators.Dedup.queries(name)(spark, d)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    sec("dd3_minhash_neardup", d1) // warm the shared tokenizer/codegen path
    val (t1, t8) = (sec("dd3_minhash_neardup", d1), sec("dd3_minhash_neardup", d8))
    assert(t8 <= Scale.runtimeBound("linear", 8, t1),
      s"dd3 ×8 runtime $t8 s exceeds the linear bound from ×1 = $t1 s")
    // dd15: the r12 ×32 tail (18.4 s for 2× the ×16 data) came from the
    // DP volume + a JIT-blown join filter; the counting-filter prune +
    // hist_l1 codegen loop hold it linear-with-slack (measured FLAT
    // 3.2–4.8 s at sf0.1 ×1/×16/×32)
    val (e1, e8) = (sec("dd15_edit_distance", d1), sec("dd15_edit_distance", d8))
    assert(e8 <= Scale.runtimeBound("linear", 8, e1),
      s"dd15 ×8 runtime $e8 s exceeds the linear bound from ×1 = $e1 s")
  }
}
