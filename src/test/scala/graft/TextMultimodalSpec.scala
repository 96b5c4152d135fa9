package graft

import graft.functions.Text
import graft.operators.{Multimodal, MediaRecord, TextAnalysis}
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("text").select(Text.tokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)

  test("tokenizer edge cases") {
    assert(toks("a b  c") == Seq("a", "b", "c"))
    assert(toks("  leading and trailing  ") == Seq("leading", "and", "trailing"))
    assert(toks("") == Seq.empty)
    assert(toks("MiXeD CaSe") == Seq("mixed", "case"))
  }

  test("shingles3 guard: under 3 tokens yields empty, 3 yields 1") {
    def sh(s: String): Seq[String] =
      Seq(s).toDF("text")
        .select(Text.shingles3(Text.tokens(col("text"))).as("s"))
        .collect().head.getSeq[String](0)
    assert(sh("one two") == Seq.empty)
    assert(sh("one two three") == Seq("one two three"))
    assert(sh("a b c d").toSet == Set("a b c", "b c d"))
  }

  test("sharedHash is stable and 60-bit positive") {
    val h = Seq("abc").toDF("s").select(Text.sharedHash(col("s")).as("h"))
      .collect().head.getLong(0)
    assert(h == 648541476951500027L) // = parseHex(md5("abc")[0:15]), cross-checked in DuckDB
  }

  test("langid scores the marker words") {
    val rows = TextAnalysis.langId(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val pred = r.getAs[String]("pred_lang")
      assert(Set("en", "de", "es", "fr", "und").contains(pred))
      if (r.getAs[Long]("s_en") > 0) assert(pred != "und")
    }
  }

  test("media decode stub: histogram is a distribution, byte_len exact") {
    val recs = Seq(
      MediaRecord(1L, "hello world".getBytes("UTF-8"), "text/plain", Map("k" -> "v")),
      MediaRecord(2L, Array[Byte](0, 64, -128, -1), "application/octet-stream", Map.empty))
    val feats = Multimodal.decodeBatch(recs)
    assert(feats.map(_.doc_id) == Seq(1L, 2L))
    assert(feats.head.byte_len == 11L)
    feats.foreach(f => assert(math.abs(f.h0 + f.h1 + f.h2 + f.h3 - 1.0) < 1e-9))
    // bytes 0,64,-128(=128),-1(=255) land in buckets 0,1,2,3
    val f2 = feats(1)
    assert(f2.h0 == 0.25 && f2.h1 == 0.25 && f2.h2 == 0.25 && f2.h3 == 0.25)
  }

  test("mm6 perceptual near-dup matches a driver recompute at the Hamming boundary") {
    import graft.operators.Multimodal.{CopyIdOffset, DHashPoints, HammingMax}
    // replicate fixture + dHash + banding + verify entirely driver-side
    val docs = Catalog.table(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val aug = docs ++ docs.collect {
      case (id, t) if id % 11 == 7 && t.length >= DHashPoints =>
        (id + CopyIdOffset) -> (t.substring(0, 10) + "~" + t.substring(11))
    }
    def sig(t: String): Array[Long] = {
      val p = t.getBytes("UTF-8"); val n = p.length
      def pt(i: Int): Int =
        operators.Multimodal.disp(p(i * n / DHashPoints) & 0xff)
      val bands = new Array[Long](4)
      var bit = 0
      for (r <- 0 until 8; c <- 0 until 8) {
        if (pt(r * 9 + c) < pt(r * 9 + c + 1)) bands(bit / 16) |= 1L << (bit % 16)
        bit += 1
      }
      bands
    }
    val sigs = aug.filter(_._2.length >= DHashPoints)
      .map { case (id, t) => id -> sig(t) }.toMap
    val buckets = sigs.toSeq
      .flatMap { case (id, bs) => bs.zipWithIndex.map { case (s, b) => (b, s) -> id } }
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val candidates = buckets.flatMap(ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length; if ids(i) != ids(j))
        yield (ids(i), ids(j)))
      .toSet
      .map { p: (Long, Long) =>
        val h = sigs(p._1).zip(sigs(p._2))
          .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum.toLong
        (p._1, p._2, h)
      }
    val expected = candidates.filter(_._3 <= HammingMax)
    val got = operators.Multimodal.perceptualNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // the boundary is exercised from both sides: every injected copy pair
    // is found (perturbing one sampled byte flips ≤ 2 adjacent comparisons)
    // and at least one candidate pair was REJECTED for exceeding the max
    val injected = sigs.keys.filter(_ >= CopyIdOffset)
      .map(c => (c - CopyIdOffset, c)).toSet
    assert(injected.nonEmpty)
    injected.foreach { case (a, b) =>
      assert(got.exists(p => p._1 == a && p._2 == b),
        s"injected near-dup pair ($a, $b) not detected")
    }
    assert(got.forall(_._3 <= HammingMax))
    assert(candidates.exists(_._3 > HammingMax),
      "fixture must include a bucketed candidate REJECTED by the verify step")
  }

  test("typed media pipeline runs distributed and is deterministic") {
    val a = Multimodal.decodeFeatures(spark, sf).collect()
    val b = Multimodal.decodeFeatures(spark, sf).collect()
    assert(a.length == 500)
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("t9 plans no corpus-sized single-task Window/Sort (two-pass rank)") {
    // The deciles come from RangeRank's two-pass rank. Audit the actual
    // pass-1 frame (exposed on the Ranked handle): its plan must be a
    // range-partitioned local sort — no Window, no global single-task Sort
    // — and the distributed sort must really fan out to >1 partition even
    // on the tiny test corpus.
    val ranked = operators.RangeRank.withGlobalRank(
      TextAnalysis.qualityScore(spark, sf)
        .select(col("doc_id"), col("quality"), col("n_tokens")),
      "rank0", col("quality").desc, col("doc_id"))
    try {
      val plan = ranked.sortedFrame.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"unpartitioned window survived:\n$plan")
      assert(plan.contains("rangepartitioning"),
        s"pass-1 sort is not range-partitioned:\n$plan")
      assert(ranked.sortedFrame.rdd.getNumPartitions > 1,
        "range-partitioned score frame collapsed to one partition")
      assert(ranked.total > 0 && ranked.df.count() == ranked.total)
    } finally ranked.release()
    // and the end-to-end operator still yields exactly bins 1..10
    val df = TextAnalysis.qualityDeciles(spark, sf)
    assert(df.collect().map(_.getLong(0)).toSeq == (1L to 10L),
      "decile bins must be exactly 1..10")
  }

  test("t9 two-pass rank binning matches the ntile window formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("quality").desc, col("doc_id"))
    val viaWindow = TextAnalysis.qualityScore(spark, sf)
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        round(min(col("quality")), 6).as("min_q"),
        round(max(col("quality")), 6).as("max_q"))
      .orderBy("decile").collect().map(_.toSeq)
    val viaRank = TextAnalysis.qualityDeciles(spark, sf)
      .collect().map(_.toSeq)
    assert(viaRank.toSeq == viaWindow.toSeq)
  }

  test("t8 vocabulary stats shuffle is two-stage, no distinct expansion") {
    val plan = TextAnalysis.topTokens(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.toLowerCase.contains("distinct"),
      s"countDistinct expansion reappeared in t8:\n$plan")
  }

  test("t11 tf-idf keywords: exact score identity, contiguous ranks, rare-term order") {
    val n = Text.withTokens(Catalog.table(spark, sf, "documents"))
      .filter(size(col("_toks")) > 0).count()
    val rows = TextAnalysis.tfidfKeywords(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val ranked = rs.sortBy(_.getLong(1))
      // at most K rows, ranks 1..m contiguous
      assert(ranked.length <= TextAnalysis.TfidfTopK)
      assert(ranked.map(_.getLong(1)).toSeq == (1L to ranked.length).toSeq)
      ranked.foreach { r =>
        val (tf, df, score) = (r.getLong(3), r.getLong(4), r.getDouble(5))
        // the exact linear-idf identity: integer numerator, one division
        assert(score == tf * n / df.toDouble, s"doc $doc term ${r.getString(2)}")
        assert(df >= 1 && df <= n && tf >= 1)
      }
      // scores non-increasing down the ranks
      val scores = ranked.map(_.getDouble(5)).toSeq
      assert(scores == scores.sorted(Ordering[Double].reverse))
    }
  }

  test("t10 attested-bigram counts satisfy the model-side identity") { try {
    val rows = TextAnalysis.bigramSupport(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nBg, nAtt, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nAtt >= 0 && nAtt <= nBg)
      assert(ratio == nAtt.toDouble / nBg.toDouble)
    }
    // discriminative on the fixture: support=30 must split the corpus,
    // not grade everything 0.0 or 1.0
    assert(rows.exists(_.getDouble(3) < 1.0) && rows.exists(_.getDouble(3) > 0.0))
    // independent identity: per-doc attested occurrences summed over docs
    // == total occurrences of every bigram whose corpus support >= 30
    import graft.functions.Text
    val toks = col("_toks")
    val bigrams = transform(sequence(lit(1), size(toks) - 1), i =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val counts = Text.withTokens(Catalog.table(spark, sf, "documents"))
      .filter(size(toks) >= 2)
      .select(explode(bigrams).as("bg"))
      .groupBy("bg").count()
      .filter(col("count") >= TextAnalysis.BigramMinSupport)
      .agg(sum("count")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum === counts)
  } finally spark.catalog.clearCache() } // release t10's pinned occurrence frame

  test("t10 shuffles hashed keys two-stage; the join stays an equi-join") { try {
    val plan = TextAnalysis.bigramSupport(spark, sf)
      .queryExecution.sparkPlan.toString
    // the model count must have a map-side partial phase (no distinct
    // expansion, no full-occurrence shuffle of one hot bigram to a reducer)
    assert(plan.contains("partial_count"),
      s"bigram support model lost its partial aggregation phase:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"occurrence-model join degraded from an equi-join:\n$plan")
  } finally spark.catalog.clearCache() }

  test("t12 chunk boundaries: counts, coverage, and window bounds") {
    val W = TextAnalysis.ChunkWindow
    val S = TextAnalysis.ChunkStride
    val chunks = TextAnalysis.contextChunks(spark, sf).collect()
      .groupBy(_.getLong(0))
    val nToks = graft.functions.Text
      .withTokens(Catalog.table(spark, sf, "documents"))
      .select(col("doc_id"), size(col("_toks")).as("n"))
      .filter(col("n") > 0).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == nToks.keySet, "every tokenized doc must chunk")
    nToks.foreach { case (doc, n) =>
      val cs = chunks(doc).sortBy(_.getLong(1))
      // standard sliding-window chunk count: i in 0..floor((n-1)/S)
      assert(cs.length == (n - 1) / S + 1, s"doc $doc: wrong chunk count")
      // every chunk holds min(W, n - i*S) tokens -> full coverage, no gaps
      cs.foreach { c =>
        val i = c.getLong(1).toInt
        assert(c.getLong(2) == math.min(W, n - i * S),
          s"doc $doc chunk $i: wrong token count")
      }
    }
  }

  test("t14 Misra-Gries guarantee: heavy tokens survive a wide-vocab sketch") {
    import spark.implicits._
    // the corpus vocabulary is smaller than k=64, so the registered oracle
    // never exercises the decrement path — this fixture does: 3 heavy
    // tokens among 2000 singletons, shuffled across partitions
    val heavy = Seq("alpha", "beta", "gamma").flatMap(t => Seq.fill(500)(t))
    val rare = (0 until 2000).map(i => s"rare_$i")
    val sketch = spark.createDataset(heavy ++ rare).repartition(8).as[String]
      .select(operators.MgAggregator.toColumn.name("mg")).head()
    assert(sketch.size <= operators.TextAnalysis.MgCounters,
      s"sketch must hold at most k entries, held ${sketch.size}")
    Seq("alpha", "beta", "gamma").foreach { t =>
      assert(sketch.contains(t),
        s"token $t has freq 500 > N/k and MUST survive the sketch")
    }
  }

  test("t13 BPE pair counts match a driver-side recompute") {
    val got = TextAnalysis.bpePairs(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val toks = graft.functions.Text
      .withTokens(Catalog.table(spark, sf, "documents"))
      .select(explode(col("_toks")).as("t")).collect().map(_.getString(0))
    val want = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .toSeq.flatMap { case (w, tf) =>
        w.sliding(2).filter(_.length == 2).map(_ -> tf)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(TextAnalysis.BpeTopPairs)
    assert(got.toSeq == want, "distributed BPE pair counts diverge from driver truth")
  }

  /** Canonical greedy left-to-right non-overlapping BPE merge on a symbol
    * array — the reference semantics t19's replace-encoding must match. */
  private def refMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refBpeTrain(tf: Map[String, Long], k: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab = tf.toSeq.filter(_._1.length >= 2)
      .map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1L
    var done = false
    while (r <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a + " " + b) }
        out += ((r, a, b, a + b, n))
        vocab = vocab.map { case (syms, m) => (refMerge(syms, a, b), m) }
        r += 1
      }
    }
    out.result()
  }

  test("t19 BPE train matches a driver-side reference trainer") {
    val got = TextAnalysis.bpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val toks = graft.functions.Text
      .withTokens(Catalog.table(spark, sf, "documents"))
      .select(explode(col("_toks")).as("t")).collect().map(_.getString(0))
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = refBpeTrain(tf, TextAnalysis.BpeTrainMerges)
    assert(got == want, "distributed BPE merge list diverges from driver truth")
    assert(got.size == TextAnalysis.BpeTrainMerges)
    // merge counts are non-increasing: every pair involving a freshly merged
    // symbol is bounded by the count of the pair that produced it
    got.map(_._5).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1), s"merge counts rose: $got")
    }
    got.foreach { case (_, a, b, m, _) => assert(m == a + b) }
  }

  /** Driver reference of t21's BATCHED schedule: per round, count pairs
    * once, take the top B by (count DESC, pair), apply them sequentially
    * in rank order via the canonical greedy rule. The distributed trainer
    * must match this EXACTLY — the batch semantics (members 2..B chosen
    * under pre-round counts) are the spec, not an approximation of it. */
  private def refBpeTrainBatched(tf: Map[String, Long], rounds: Int, b: Int)
      : Seq[(Long, Long, String, String, String, Long)] = {
    var vocab = tf.toSeq.filter(_._1.length >= 2)
      .map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[(Long, Long, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val batch = counts.toSeq
          .sortBy { case ((a, bb), n) => (-n, a + " " + bb) }.take(b)
        batch.zipWithIndex.foreach { case (((a, bb), n), k) =>
          out += (((r - 1).toLong * b + k + 1, r.toLong, a, bb, a + bb, n))
          vocab = vocab.map { case (syms, m) => (refMerge(syms, a, bb), m) }
        }
        r += 1
      }
    }
    out.result()
  }

  test("t21 batched BPE train matches the driver reference at the " +
    "batched schedule, and B=1 degenerates to the sequential trainer") {
    val got = TextAnalysis.bpeTrainBatched(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSeq
    val toks = graft.functions.Text
      .withTokens(Catalog.table(spark, sf, "documents"))
      .select(explode(col("_toks")).as("t")).collect().map(_.getString(0))
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = refBpeTrainBatched(tf,
      TextAnalysis.BpeBatchRounds, TextAnalysis.BpeBatchSize)
    assert(got == want,
      "distributed batched BPE merge list diverges from driver truth")
    // the verdict contract: >= 64 merges in <= 8 distributed rounds
    assert(got.size == TextAnalysis.BpeBatchRounds * TextAnalysis.BpeBatchSize)
    assert(got.map(_._2).distinct.size <= TextAnalysis.BpeBatchRounds)
    got.foreach { case (_, _, a, b, m, _) => assert(m == a + b) }
    // B = 1 IS sequential BPE: the batched loop with singleton batches
    // must reproduce t19's trainer rank-for-rank — distributed AND
    // reference (links the batch spec back to canonical greedy BPE)
    val seq6 = refBpeTrain(tf, 6).map { case (r, a, b, m, n) =>
      (r, r, a, b, m, n) }
    assert(refBpeTrainBatched(tf, 6, 1) == seq6,
      "reference batched B=1 diverges from sequential reference")
    val distB1 = TextAnalysis.trainedBatchedMergesFor(spark, sf, 6, 1)
    assert(distB1 == seq6,
      "distributed batched B=1 diverges from the sequential trainer")
  }

  test("t19 replace-encoding merge equals canonical greedy on repeat words") {
    // overlapping runs, disjoint adjacencies, and partial-overlap traps:
    // the double-space encoding with one-flanking-space patterns must
    // resolve each exactly as the canonical left-to-right rule does
    val words = Seq("aaaa", "aaa", "aaaaa", "abab", "aab", "baaab",
      "xaaay", "abba", "aabb")
    val enc = (w: String) => "  " + w.map(_.toString).mkString("  ") + "  "
    val out = words.map { w =>
      val s = enc(w)
      // same expression t19 applies, evaluated through Spark
      val df = spark.range(1).select(
        replace(lit(s), lit(" a  a "), lit(" aa ")).as("m"))
      df.head().getString(0)
    }
    words.zip(out).foreach { case (w, m) =>
      val wantSyms = refMerge(w.map(_.toString).toVector, "a", "a")
      val gotSyms = m.trim.split("  ").toVector
      assert(gotSyms == wantSyms,
        s"word $w: replace-encoding gave $gotSyms, canonical greedy $wantSyms")
    }
  }

  test("t19 replace-encoding equals canonical greedy on seeded random words, " +
    "including multi-char second-round merges") {
    import org.apache.spark.unsafe.types.UTF8String
    // drives the EXACT Spark codepath (StringReplace eval = UTF8String
    // .replace) against the canonical greedy reference; a 3-letter
    // alphabet maximizes repeat runs and overlap traps
    def sparkMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
      val enc = "  " + syms.mkString("  ") + "  "
      UTF8String.fromString(enc)
        .replace(UTF8String.fromString(s" $a  $b "),
          UTF8String.fromString(s" $a$b "))
        .toString.trim.split("  ").toVector
    }
    val rnd = new scala.util.Random(0x5eed17)
    val alphabet = "abc"
    (1 to 2000).foreach { _ =>
      val syms0 = Vector.fill(1 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length)).toString)
      val (a, b) = (alphabet(rnd.nextInt(3)).toString,
        alphabet(rnd.nextInt(3)).toString)
      val want1 = refMerge(syms0, a, b)
      assert(sparkMerge(syms0, a, b) == want1,
        s"round 1 diverged: syms=$syms0 merge=($a,$b)")
      // round 2 merges the NEW multi-char symbol with a random neighbor —
      // the post-first-round regime every later training round runs in
      val c = alphabet(rnd.nextInt(3)).toString
      val want2 = refMerge(want1, a + b, c)
      assert(sparkMerge(want1, a + b, c) == want2,
        s"round 2 diverged: syms=$want1 merge=(${a + b},$c)")
    }
  }

  test("t20 fertility of the trained tokenizer matches a driver-side recompute") {
    val got = TextAnalysis.bpeFertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val docs = Catalog.table(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
    // the corpus fixture is lowercase/single-spaced; mirror Text.tokens
    val tokensOf = (t: String) =>
      t.trim.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty)
    val tf = docs.flatMap(r => tokensOf(r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val merges = refBpeTrain(tf, TextAnalysis.BpeTrainMerges)
    val nSyms = tf.keysIterator.filter(_.length >= 2).map { w =>
      var syms = w.map(_.toString).toVector
      merges.foreach { case (_, a, b, _, _) => syms = refMerge(syms, a, b) }
      w -> syms.length.toLong
    }.toMap
    val bySource = docs.groupBy(_.getString(0))
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, rows) =>
      val toks = rows.flatMap(r => tokensOf(r.getString(1)))
      val words = toks.length.toLong
      val chars = toks.map(_.length.toLong).sum
      val symbols = toks.map(t => nSyms.getOrElse(t, 1L)).sum
      val (gw, gc, gs, gf, gcomp) = got(src)
      assert((gw, gc, gs) == ((words, chars, symbols)), s"source $src counts")
      assert(gf == symbols.toDouble / words, s"source $src fertility")
      assert(gcomp == chars.toDouble / symbols, s"source $src compression")
    }
  }

  test("t17 repetition signals match a driver-side recompute") {
    val got = TextAnalysis.repetitionSignals(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    val docs = Catalog.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty && got.keySet.subsetOf(docs.keySet))
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= 2) {
        val n = toks.length
        val topTok = toks.groupBy(identity).values.map(_.length).max
        val adj = toks.sliding(2).count(p => p(0) == p(1))
        val topBg = toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.length).max
        val (gn, gtt, gadj, gbg, flag) = got(id)
        assert(gn == n.toLong, s"doc $id n_tokens")
        assert(gtt == topTok.toDouble / n, s"doc $id top_tok_frac")
        assert(gadj == adj.toDouble / (n - 1), s"doc $id adj_repeat_frac")
        assert(gbg == topBg.toDouble / (n - 1), s"doc $id top_bigram_frac")
        assert(flag == (gtt > TextAnalysis.RepTopTokFrac ||
          gadj > TextAnalysis.RepAdjFrac), s"doc $id flag")
      } else assert(!got.contains(id), s"doc $id under 2 tokens must drop")
    }
    // the flag must discriminate at this SF (mixed true/false)
    val flags = got.values.map(_._5).toSet
    assert(flags == Set(true, false), "repetitive flag is degenerate")
  }
}
