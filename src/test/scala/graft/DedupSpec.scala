package graft

import graft.operators.Dedup
import org.scalacheck.Gen

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup is idempotent and keeps min doc_id") {
    val once = Dedup.exactDedup(spark, sf).collect()
    assert(once.length == 500) // corpus has no exact text dups
    assert(once.forall(_.getAs[Long]("n_copies") == 1L))
  }

  test("minhash near-dup pairs are ordered, verified above threshold") {
    val pairs = Dedup.minhashNearDup(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.7)
    }
  }

  test("minhash finds a planted near-duplicate") {
    // construct a tiny corpus in a temp dir: exact structure of documents
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words with nothing shared at all in any shingle"
    Seq((0L, base, "en", "s", base.length.toLong),
      (1L, near, "en", "s", near.length.toLong),
      (2L, far, "en", "s", far.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.minhashNearDup(spark, tmp).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("simhash of identical token sets is identical") {
    val rows = Dedup.simhashBuckets(spark, sf).collect()
    assert(rows.length == 500)
    // simhash fits in 16 bits
    assert(rows.forall { r =>
      val h = r.getAs[Long]("simhash"); h >= 0 && h < (1 << 16)
    })
  }

  test("dd8 clusters: edge-connected docs share a cluster; id is the min member") {
    val clusters = Dedup.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every verified near-dup pair must land in one cluster (including
    // transitively: A~B, B~C with no A~C edge still collapse)
    val pairs = Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is the minimum member id (the fixpoint's invariant)
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid: min member ${members.keys.min}")
    }
    // singletons label themselves
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.filterNot(kv => inPairs(kv._1)).foreach { case (d, c) =>
      assert(d == c, s"singleton $d got foreign cluster $c")
    }
  }

  test("dd11 flags exactly the train docs sharing >= threshold shingles with test") {
    // independent driver-side recompute of the whole contamination tally
    import graft.functions.Text
    import org.apache.spark.sql.functions._
    val sh = Text.withTokens(Catalog.table(spark, sf, "documents"))
      .filter(size(col("_toks")) >= 5)
      .select(col("doc_id"),
        array_distinct(transform(Text.shingles5(col("_toks")),
          s => Text.sharedHash(s))).as("shh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def splitOf(id: Long): String = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md5.map("%02x".format(_)).mkString.take(15), 16) % 1000
      if (h < 800) "train" else if (h < 900) "val" else "test"
    }
    val testShingles = sh.collect { case (id, s) if splitOf(id) == "test" => s }
      .foldLeft(Set.empty[Long])(_ ++ _)
    val expected = sh.collect { case (id, s) if splitOf(id) == "train" =>
      id -> (s & testShingles).size
    }.filter(_._2 >= Dedup.DecontamMinShared).toMap
    val got = Dedup.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected.map { case (k, v) => k -> v.toLong },
      "engine contamination tally diverged from the driver recompute")
    assert(got.nonEmpty, "fixture must actually contain contamination")
  }

  test("dd13 bloom prune is result-transparent and probes below the join") {
    val flagged = Dedup.decontaminateBloomPlan(spark, sf)
    locally {
      val optimized = flagged.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg"),
        s"bloom sketch aggregate missing from the plan:\n$optimized")
      // the probe must sit BELOW the join (prune before the exchange):
      // the Join node appears above the Filter carrying might_contain
      val joinIdx = optimized.indexOf("Join Inner")
      val probeIdx = optimized.indexOf("might_contain")
      assert(joinIdx >= 0 && probeIdx > joinIdx,
        s"bloom probe is not below the join:\n$optimized")
      // no false negatives + exact join downstream => identical manifest
      val exact = Dedup.decontaminate(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val pruned = flagged.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(pruned == exact,
        "bloom-pruned manifest diverged from dd11's exact manifest")
      assert(pruned.nonEmpty, "fixture must actually contain contamination")
    }
  }

  test("dedup(dedup(x)) == dedup(x) on generated corpora (property)") {
    val gen = Gen.listOfN(30, Gen.oneOf("aa bb cc", "dd ee ff", "gg hh ii"))
    (1 to 5).foreach { seed =>
      val texts = gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val d1 = df.dropDuplicates("text")
      val d2 = d1.dropDuplicates("text")
      assert(d1.count() == d2.count())
      assert(d1.count() == texts.distinct.length)
    }
  }

  test("dd14 intra-doc paragraph dedup drops the planted boilerplate copies") {
    val rows = operators.Dedup.paragraphDedup(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (nParas, nKept, nDropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept + nDropped == nParas, s"doc ${r.getLong(0)} counts broken")
      // the boilerplate is planted three times in every doc -> >= 2 dropped
      assert(nDropped >= 2, s"doc ${r.getLong(0)} kept duplicate boilerplate")
    }
    // every third doc re-plants its first half -> one extra drop
    val extra = rows.filter(_.getLong(0) % 3 == 0)
    assert(extra.nonEmpty && extra.forall(_.getLong(3) >= 3),
      "repeated body half must be deduped within its doc")
  }

  test("dd15 edit-distance verify agrees with a driver-side Levenshtein") {
    val got = Dedup.editDistanceNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "fixture must contain edit-near duplicates")
    val texts = Catalog.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      var cur = new Array[Int](b.length + 1)
      var p = prev
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, p(j) + 1),
            p(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        val t = p; p = cur; cur = t
      }
      p(b.length)
    }
    got.foreach { case (da, db, d) =>
      assert(d == lev(texts(da), texts(db)).toLong,
        s"pair ($da,$db): engine distance $d != driver DP")
      assert(d <= Dedup.EditMax)
      assert(da < db)
    }
  }

  test("dd16 banded semantic dedup: contained in dd5, recall floor, " +
    "candidate cut") {
    // containment is STRUCTURAL (same verify over a candidate subset), so
    // any dd16 row outside dd5 means the signature join broke; recall is
    // the banding's measured keep-rate (94-100% across SFs with the mixed
    // dedup plane family — the legacy LCG planes' cross-plane correlation
    // collapsed it to ~62%, see RandomHyperplanes.dedupPlaneVal)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d5 = pairs(Dedup.embeddingNearDup(spark, sf))
    val d16 = pairs(Dedup.semanticDedupBanded(spark, sf))
    assert(d5.nonEmpty, "fixture must contain embedding near-dups")
    assert(d16.subsetOf(d5),
      s"dd16 found pairs outside dd5's exact set: ${(d16 -- d5).take(3)}")
    val recall = d16.size.toDouble / d5.size
    assert(recall >= 0.9, s"dd16 recall $recall below 0.9 (${d16.size}/${d5.size})")
    // the candidate CUT shows at a denser SF (sf0.001 cells hold ~2
    // vectors); 53% is the 48-band/64-bucket incidental floor the
    // operator's scaladoc derives — the pin allows re-roll to 65%
    val dir = "/root/testdata/sf0.01"
    val c5 = Dedup.embeddingCandidateFrame(spark, dir).count()
    val c16 = Dedup.semanticDedupCandidates(spark, dir).count()
    assert(c16 < c5 * 65 / 100,
      s"banded candidates $c16 not under 65% of dd5's $c5")
  }

  test("dd7 canonical dedup folds NULL text to the empty canon (concat rule)") {
    // Spark's concat NULL-PROPAGATES while DuckDB's skips NULL args — dd7
    // coalesces text on the Spark side so a NULL-text doc digests to
    // md5('') like an empty doc, instead of a SQL-NULL fingerprint the
    // oracle would never produce (the t7/mm1 rule; fixture corpora carry
    // no NULLs, so this planted corpus is the only coverage)
    val tmp = java.nio.file.Files.createTempDirectory("graft-dd7").toString
    Seq((0L, null.asInstanceOf[String], "en", "s", 0L),
      (1L, "", "en", "s", 0L),
      (2L, "real text here", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.canonicalDedup(spark, tmp).collect()
    val byFp = rows.map(r =>
      r.getAs[String]("fp") -> r.getAs[Long]("n_copies")).toMap
    assert(!byFp.contains(null), "NULL fingerprint leaked through the coalesce")
    // NULL and empty text canonicalize identically → one group of 2
    assert(rows.length == 2 && byFp.values.toSet == Set(1L, 2L),
      s"expected {empty: 2 copies, real: 1}: ${rows.mkString(", ")}")
  }

  test("dd17 canonical keep: per-cluster argmax by quality, sizes consistent") {
    val q = graft.operators.TextAnalysis.qualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val got = Dedup.canonicalKeep(spark, sf).collect()
    assert(got.nonEmpty)
    val byCluster = got.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.exists(_._2.length > 1),
      "fixture must contain at least one multi-member near-dup cluster")
    byCluster.foreach { case (cid, rows) =>
      val ids = rows.map(_.getAs[Long]("doc_id")).toSeq
      // driver-side recompute of the keep policy: max quality, min id tie
      val expect = ids.minBy(id => (-q(id), id))
      rows.foreach { r =>
        assert(r.getAs[Long]("canonical_id") == expect,
          s"cluster $cid: canonical ${r.getAs[Long]("canonical_id")} != argmax $expect")
        assert(r.getAs[Long]("cluster_size") == ids.length.toLong)
      }
    }
    // singletons keep themselves
    byCluster.filter(_._2.length == 1).foreach { case (_, rows) =>
      assert(rows.head.getAs[Long]("canonical_id") == rows.head.getAs[Long]("doc_id"))
    }
  }

  test("dd17 quality ties break on min doc_id (planted identical texts)") {
    // two IDENTICAL texts have bit-identical quality — the argmax must
    // fall through to the doc_id tiebreak. The sf fixtures never produce
    // an exact tie (the driver-side recompute in the dd17 test would
    // mask a wrong tiebreak as an equal-quality coin flip), so this
    // planted two-doc cluster is the only coverage of the second sort key.
    val base = ("the quick brown fox jumps over the lazy dog again and " +
      "again today ") * 3
    val tmp = java.nio.file.Files.createTempDirectory("graft-dd17").toString
    Seq((21L, base, "en", "s", base.length.toLong),
      (20L, base, "en", "s", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.canonicalKeep(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(rows.keySet == Set(20L, 21L) &&
      rows.values.map(_._2).toSet == Set(2L),
      s"expected one 2-doc cluster: $rows")
    assert(rows.values.map(_._1).toSet == Set(20L),
      s"identical-quality tie must keep the MIN doc_id: $rows")
  }

  test("dd18 savings report reconciles with dd17's keep map and t2 tokens") {
    val keep = Dedup.canonicalKeep(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val toks = graft.operators.TextAnalysis.qualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Dedup.dedupSavings(spark, sf).collect()
    assert(got.nonEmpty)
    // driver-side recompute per source
    val bySource = keep.keys.groupBy(src)
    got.foreach { r =>
      val s = r.getAs[String]("source")
      val ids = bySource(s).toSeq
      assert(r.getAs[Long]("n_docs") == ids.length.toLong)
      assert(r.getAs[Long]("n_kept") == ids.count(id => keep(id) == id).toLong)
      assert(r.getAs[Long]("tokens_total") == ids.map(toks).sum)
      assert(r.getAs[Long]("tokens_kept") ==
        ids.filter(id => keep(id) == id).map(toks).sum)
      assert(r.getAs[Long]("tokens_dropped") ==
        r.getAs[Long]("tokens_total") - r.getAs[Long]("tokens_kept"))
    }
    assert(got.map(_.getAs[String]("source")).toSet == bySource.keySet,
      "report must cover every source")
    // the fixture must exercise a real drop somewhere
    assert(got.map(_.getAs[Long]("tokens_dropped")).sum > 0L,
      "no tokens dropped anywhere — near-dup fixture drifted")
  }

  test("dd16 sign-LSH keep-rate traces the S-curve by cosine bucket") {
    // The MEASURED version of the scaladoc's derivation: bucket the full
    // within-cell pair space by exact cosine and compute the fraction of
    // each bucket the 48-band screen keeps. Two corpora because the
    // fixture's cosine mass splits: plain sf0.1 (~200k pairs) covers the
    // background and the dd5-threshold region but holds NO pair above
    // cos 0.6; the blow-up's jittered copies supply the cos ≈ 1 mass a
    // production dedup (cos ≥ 0.9) actually runs on. Pins the two claims
    // the operator's honesty rests on: the incidental floor on background
    // pairs (what banding admits for free) and losslessness on near-dups.
    import org.apache.spark.sql.functions._
    val edges = Seq(0.0, 0.2, 0.35, 0.45, 0.6, 0.9)
    val label = "cos<0" +: edges.map(e => s"cos>=$e")
    def keepRates(dir: String): Int => (Long, Double) = {
      // ascending fold so each higher threshold WRAPS the lower ones —
      // the outermost when() must be the highest edge
      val bucket = edges.foldLeft(lit(-1)) { (acc, e) =>
        when(col("cos") >= e, lit(edges.indexOf(e))).otherwise(acc)
      }
      val all = Dedup.embeddingCandidateFrame(spark, dir)
        .withColumn("cos",
          call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
        .select(col("vec_a"), col("vec_b"), bucket.as("bucket"))
      val cand = Dedup.semanticDedupCandidates(spark, dir)
        .withColumn("hit", lit(1))
      val m = all.join(cand, Seq("vec_a", "vec_b"), "left")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("kept"))
        .collect()
        .map(r => r.getAs[Int]("bucket") ->
          (r.getAs[Long]("n"), r.getAs[Long]("kept"))).toMap
      b => m.get(b).map { case (n, k) => (n, k.toDouble / n) }
        .getOrElse((0L, Double.NaN))
    }

    val base = keepRates("/root/testdata/sf0.1")
    (-1 to 5).foreach { b =>
      val (n, r) = base(b)
      info(f"sf0.1   ${label(b + 1)}%-9s n=$n%-7d keep=$r%.4f")
    }
    // the curve needs its low and threshold buckets populated
    (-1 to 3).foreach(b => assert(base(b)._1 > 0L,
      s"sf0.1 bucket $b empty — fixture drifted, curve unmeasurable"))
    // monotone S-curve across the populated buckets (sparse-bucket slack)
    (0 to 3).foreach(b => assert(base(b)._2 >= base(b - 1)._2 - 0.05,
      s"keep-rate not monotone at bucket $b: ${base(b)._2} < ${base(b - 1)._2}"))
    // the incidental floor, split where the aggregate 53.5% actually comes
    // from: anti-correlated pairs keep ~0.40, positive background ~0.64 —
    // loose bands so a plane-family regression (correlated planes) or a
    // join bug (floor → 1) both fail loudly
    assert(base(-1)._2 >= 0.25 && base(-1)._2 <= 0.55,
      s"cos<0 floor ${base(-1)._2} outside [0.25, 0.55]")
    assert(base(0)._2 >= 0.5 && base(0)._2 <= 0.8,
      s"background floor ${base(0)._2} outside [0.5, 0.8]")
    // the dd5-threshold bucket explains the operator's 94-98% recall
    assert(base(2)._2 >= 0.85, s"cos>=0.35 keep-rate ${base(2)._2} below 0.85")

    // production-threshold recall on the blow-up's cos ≈ 1 copy mass
    // (×4 of sf0.01: every base vector gains 3 jittered copies → ~6 such
    // pairs per cell-resident vector). The screen must be LOSSLESS here —
    // at cos 0.99 a 6-bit band keeps a pair with prob ≈ 0.83, so 48 bands
    // miss with prob ≈ 1e-37; one dropped pair is a code bug, not luck.
    val blown = Scale.ensureBlowup(spark, "/root/testdata/sf0.01",
      "/tmp/graft-scale-sf0.01", 4)
    val top = keepRates(blown)
    (4 to 5).foreach { b =>
      val (n, r) = top(b)
      info(f"×4 blow  ${label(b + 1)}%-9s n=$n%-7d keep=$r%.4f")
    }
    assert(top(5)._1 >= 500L,
      s"blow-up cos>=0.9 bucket too thin (${top(5)._1}) to measure")
    assert(top(5)._2 == 1.0,
      s"cos>=0.9 keep-rate ${top(5)._2} — the screen dropped a true near-dup")
  }

  test("dd19 production-threshold banded dedup equals the exact " +
    "cos>=0.9 pair set on the blown corpus, in the slim-candidate regime") {
    import org.apache.spark.sql.functions.col
    // the RAW corpus has no cos >= 0.9 mass (the S-curve test above tops
    // out at [0.35, 0.45)), so dd19 has no oracle row — this equality on
    // the ×8 blown corpus (jittered copies ARE near-dup mass at cos ≈
    // 0.99) is its correctness contract. Exact ground truth = dd5's
    // exact within-cell verify filtered to the production threshold;
    // dd19 ⊆ exact by construction (same exact cosine verify), and at
    // cos 0.99 a 16-bit band keeps a pair with prob ≈ 0.48, so the
    // 45-band screen misses with prob ≈ 0.52^45 ≈ 2e-13 — equality, not
    // a recall score.
    val d8 = Scale.ensureBlowup(spark, "/root/testdata/sf0.01",
      "/tmp/graft-scale-sf0.01", 8)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(operators.Dedup.embeddingNearDup(spark, d8)
      .filter(col("cos_sim") >= operators.Dedup.ProdCosThreshold))
    val got = pairSet(operators.Dedup.semanticDedupProd(spark, d8))
    assert(exact.nonEmpty, "blown corpus lost its cos>=0.9 copy mass")
    assert(got == exact,
      s"dd19 output diverged from the exact production-threshold set: " +
        s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
    // the REGIME claim that picked the pair-attach verify shape: slim
    // candidates stay far under the ride-in shape's corpus×bands volume
    val cand = operators.Dedup.semanticDedupProdCandidates(spark, d8).count()
    val vecs = operators.Similarity.emb(spark, d8).count()
    assert(cand * 2 < vecs * graft.expr.RandomHyperplanes.ProdBands / 2,
      s"slim-candidate regime violated: 2x$cand pairs vs " +
        s"${vecs}x${graft.expr.RandomHyperplanes.ProdBands} ride-in rows")
  }

  test("dd20 boundary fixture sits ON the decision boundary and measured " +
    "recall clears the S-curve floor per centibucket") {
    import org.apache.spark.sql.functions.col
    // dd19's fixture verifies recall = 1 where the 45-band miss
    // probability is deterministic-zero (cos >= 0.97); dd20's fixture is
    // tuned to cos ~ [0.90, 0.96), where it is NOT — this contract is the
    // S-curve floor the scaladoc model derives: per-band keep
    // p(c) = (1 - acos(c)/pi)^16, per-pair miss m(c) = (1 - p(c))^45,
    // per-bucket floor = 1 - 5*m(edge) - 1/n (5x model slack plus one
    // pair of granularity), overall >= 0.97. The outcome is
    // DETERMINISTIC (fixed planes, fixed jitter) — the floor guards the
    // fixture/model agreement, the DuckDB oracle row pins the exact
    // per-bucket counts at all three SFs.
    val rows = operators.Dedup
      .bandedBoundaryRecall(spark, "/root/testdata/sf0.01")
      .select(col("bucket"), col("n_exact"), col("n_found"), col("recall"))
      .collect()
    val buckets = rows.map(_.getLong(0))
    assert(buckets.contains(90L) && buckets.contains(91L),
      s"fixture drifted off the decision boundary: buckets=${buckets.toSeq}")
    val nTotal = rows.map(_.getLong(1)).sum
    val fTotal = rows.map(_.getLong(2)).sum
    assert(nTotal >= 80,
      s"boundary pair mass too thin to measure recall ($nTotal pairs)")
    def missProb(c: Double): Double =
      math.pow(1.0 - math.pow(1.0 - math.acos(c) / math.Pi,
        graft.expr.RandomHyperplanes.ProdBandBits),
        graft.expr.RandomHyperplanes.ProdBands)
    rows.foreach { r =>
      val (bucket, n, found, recall) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val floor = 1.0 - 5.0 * missProb(bucket / 100.0) - 1.0 / n
      info(f"bucket $bucket n=$n found=$found recall=$recall%.4f floor=$floor%.4f")
      assert(recall >= floor,
        s"bucket $bucket recall $recall below the S-curve floor $floor")
    }
    assert(fTotal.toDouble / nTotal >= 0.97,
      s"overall boundary recall ${fTotal.toDouble / nTotal} below 0.97")
  }
}
