package graft

import org.apache.spark.sql.functions.{col, sum}

/** Growth-ratio bounds for the scale blow-up harness ([[Scale]]): at ×8
  * the five bucketed operators' found rows and candidate-pair counts must
  * track their declared banding-math models (see Scale's scaladoc —
  * linear for dd3's 60-bit bands and sim11's probed-cell fraction,
  * quadratic for dd6's feature blocking, bounded-between for the 16-bit
  * band spaces), and dd3's runtime must stay inside the linear bound.
  * Counting invariants are deterministic (no timing flake); the single
  * runtime assertion carries the harness's generous slack + absolute
  * floor, so it catches a linear claim going quadratic, not host noise. */
class ScaleSpec extends SparkSpec {

  private val baseDir = "/root/testdata/sf0.01"
  private lazy val outRoot = "/tmp/graft-scale-sf0.01"

  test("copy bijections are pairwise distinct AS FUNCTIONS through ×51") {
    // a repeated mapping makes two whole copies exact duplicates of each
    // other (a 10× row cliff at ×32, hit TWICE: rotation period 26, then
    // a zero shift on the second cycle). Comparing dst strings is not
    // enough — the two epochs use different src cycles, so the canonical
    // form is the IMAGE of the plain alphabet under each map.
    def canonical(k: Int): String = {
      val (src, dst) = Scale.copyMapping(k)
      val m = src.zip(dst).toMap
      "abcdefghijklmnopqrstuvwxyz".map(m)
    }
    val maps = (0 until 51).map(canonical)
    assert(maps.distinct.size == maps.size,
      "two copies share a letter bijection — cross-copy exact duplicates")
    // each mapping is a true bijection over its source alphabet
    (0 until 51).foreach { k =>
      val (src, dst) = Scale.copyMapping(k)
      assert(dst.sorted == src.sorted && dst.distinct.length == dst.length,
        s"copy $k mapping is not a bijection")
    }
    assert(Scale.copyMapping(0)._1 == Scale.copyMapping(0)._2,
      "copy 0 must be the identity (the ×1 run is the registered query)")
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
    check("dd6_ngram", "quadratic",
      d => operators.Dedup.ngramJaccard(spark, d).count(),
      d => operators.Dedup.ngramCandidateFrame(spark, d).count())
    check("dd15_edit", "banded16",
      d => operators.Dedup.editDistanceNearDup(spark, d).count(),
      d => operators.Dedup.editCandidateFrame(spark, d).count())
    check("dd13_bloom_decontam", "linearRR",
      d => operators.Dedup.decontaminateBloom(spark, d).count(),
      d => {
        val (flagged, sh) = operators.Dedup.decontaminateBloomPlan(spark, d)
        try Option(flagged.agg(sum(col("n_shared"))).head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        finally sh.unpersist(): Unit
      })
    check("mm6_phash", "banded16sat",
      d => operators.Multimodal.perceptualNearDup(spark, d).count(),
      d => operators.Multimodal.perceptualPieces(spark, d)._2.count())
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
  }

  test("×8 blow-up: dd3 runtime stays inside the linear bound") {
    val d1 = Scale.ensureBlowup(spark, baseDir, outRoot, 1)
    val d8 = Scale.ensureBlowup(spark, baseDir, outRoot, 8)
    def sec(d: String): Double = {
      val t0 = System.nanoTime()
      operators.Dedup.minhashNearDup(spark, d)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    sec(d1) // warm the shared tokenizer/codegen path untimed
    val (t1, t8) = (sec(d1), sec(d8))
    assert(t8 <= Scale.runtimeBound("linear", 8, t1),
      s"dd3 ×8 runtime $t8 s exceeds the linear bound from ×1 = $t1 s")
  }
}
