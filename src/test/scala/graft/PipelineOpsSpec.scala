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

  test("p12 group split: no source straddles a split; doc-level split would leak") {
    import graft.functions.Text
    // group integrity, checked on the ROW level (the registered query
    // aggregates): every source's docs carry exactly one split value
    val gh = Text.sharedHash(concat(lit("gsplit:"), col("source"))) % 1000
    val gsplit = when(gh < 800, "train").when(gh < 900, "val").otherwise(lit("test"))
    val perSource = Catalog.table(spark, sf, "documents")
      .select(col("source"), gsplit.as("s"))
      .groupBy("source").agg(countDistinct(col("s")).as("n"))
      .collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) == 1L))
    // and the operator's reason to exist: p2's doc-level assignment DOES
    // scatter group members across splits (n_moved > 0 somewhere)
    val out = operators.PipelineOps.queries("p12_group_split")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_moved")).sum > 0)
    // conservation against p2: same corpus, same totals
    val p2 = operators.PipelineOps.queries("p2_hash_split")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === p2.map(_.getAs[Long]("n_docs")).sum)
  }

  test("p13 budget mix: boundary semantics per source") {
    import graft.functions.Text
    val budget = operators.PipelineOps.SourceTokenBudget
    val maxDocTok = Catalog.table(spark, sf, "documents")
      .select(max(size(Text.tokens(col("text")))).cast("long")).collect()(0).getLong(0)
    val rows = operators.PipelineOps.queries("p13_budget_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nTotal, nKept, kept) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // a budget never silences a source (first doc always kept)
      assert(nKept >= 1, s"$src silenced")
      // overshoot is bounded by ONE document (the p5 boundary convention)
      assert(kept < budget + maxDocTok, s"$src overshot: $kept")
      // the budget is exhausted unless the source ran out of docs first
      assert(kept >= budget || nKept == nTotal,
        s"$src stopped early: kept=$kept n_kept=$nKept n_total=$nTotal")
    }
    // the test corpus must actually exercise the CUT (not all-kept)
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("p11 landed shards: read-back equals the p10 manifest and the layout prunes") {
    // the landed artifact must round-trip: aggregating the WRITTEN files
    // reproduces the lineage-computed manifest row for row
    val landed = operators.PipelineOps.landShards(spark, sf).collect().map(_.toSeq)
    val manifest = operators.PipelineOps.corpusBuild(spark, sf).collect().map(_.toSeq)
    assert(landed.nonEmpty)
    assert(landed.toSeq === manifest.toSeq)
    // the layout is the real lever: a single-shard read must prune at the
    // scan via PartitionFilters, not row-filter the whole corpus
    val one = spark.read.parquet(operators.PipelineOps.shardStoreDir)
      .filter(col("shard_id") === 0)
    one.collect()
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("shard_id"), s"expected shard pruning:\n$scan")
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

  test("p6 upsample emits whole epochs exactly and fractions deterministically") {
    val rows = operators.PipelineOps.queries("p6_epoch_upsample")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // unboosted languages: exactly one row per doc; boosted: the emitted
    // row count sits in [floor(rate) * docs, ceil(rate) * docs]
    rows.foreach { case (lang, (docs, emitted)) =>
      lang match {
        case "fr" => assert(emitted >= 2 * docs && emitted <= 3 * docs)
        case "de" => assert(emitted >= docs && emitted <= 2 * docs)
        case _    => assert(emitted === docs, s"$lang must stay at one epoch")
      }
    }
    // the copy expansion is a generator inside the scan stage — no Window,
    // and exactly the aggregation exchange (plus AQE reads) in the plan
    val plan = operators.PipelineOps.queries("p6_epoch_upsample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"copy emission lost its generator:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  test("p5 shard packing matches the running-sum window formulation") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val viaWindow = Catalog.table(spark, sf, "documents")
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("prev", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("shard_id", expr(s"prev DIV ${operators.PipelineOps.ShardTokenBudget}"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard_id").collect().map(_.toSeq)
    val viaScan = operators.PipelineOps.tokenShards(spark, sf)
      .collect().map(_.toSeq)
    assert(viaScan.length > 1, "budget must cut the fixture into >1 shard")
    assert(viaScan.toSeq == viaWindow.toSeq)
  }

  test("p7 incremental pack equals the full re-pack on the new batch") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val cut = operators.PipelineOps.IncrementalCut
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val viaFullWindow = Catalog.table(spark, sf, "documents")
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("prev", coalesce(sum("n_tok").over(w), lit(0L)))
      .filter(col("doc_id") >= cut)
      .withColumn("shard_id", expr(s"prev DIV ${operators.PipelineOps.ShardTokenBudget}"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard_id").collect().map(_.toSeq)
    val incremental = operators.PipelineOps.tokenShardsIncremental(spark, sf)
      .collect().map(_.toSeq)
    assert(incremental.nonEmpty && incremental.toSeq == viaFullWindow.toSeq)
    // batch-only cost: the incremental prefix scan ranks exactly the new
    // batch's rows, never corpus history
    val perDoc = Catalog.table(spark, sf, "documents")
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tok"))
    val batchSize = perDoc.filter(col("doc_id") >= cut).count()
    val ranked = operators.RangeRank.withRunningTotal(
      perDoc.filter(col("doc_id") >= cut), "n_tok", "prev_toks", 123L, col("doc_id"))
    try {
      assert(ranked.sortedFrame.count() == batchSize)
      // the base offset seeds the first row's exclusive prefix
      val firstPrev = ranked.df.orderBy("doc_id").select("prev_toks")
        .limit(1).collect()(0).getLong(0)
      assert(firstPrev == 123L)
    } finally ranked.release()
  }

  test("p5 running total is a two-pass range scan, no single-task Window") {
    import graft.functions.Text
    val perDoc = Catalog.table(spark, sf, "documents")
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tok"))
    val ranked = operators.RangeRank.withRunningTotal(
      perDoc, "n_tok", "prev_toks", col("doc_id"))
    try {
      val plan = ranked.sortedFrame.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"unpartitioned window survived:\n$plan")
      assert(plan.contains("rangepartitioning"),
        s"pass-1 sort is not range-partitioned:\n$plan")
      assert(ranked.sortedFrame.rdd.getNumPartitions > 1,
        "range-partitioned frame collapsed to one partition")
      // grand total on the handle == direct sum, and every shard except
      // possibly the last starts strictly under the budget boundary
      val direct = perDoc.agg(sum("n_tok")).collect()(0).getLong(0)
      assert(ranked.total == direct)
    } finally ranked.release()
  }

  test("p9 epoch shuffle: deterministic per epoch, fresh permutation across epochs") {
    import graft.operators.PipelineOps
    val e7a = PipelineOps.epochShuffleAt(spark, sf, 7).collect().map(_.toSeq).toSeq
    val e7b = PipelineOps.epochShuffleAt(spark, sf, 7).collect().map(_.toSeq).toSeq
    assert(e7a == e7b, "same epoch must reproduce the identical manifest")
    // bucket STRUCTURE is permutation-invariant (same sizes/ranges) but the
    // membership digest and boundary docs must change with the epoch salt —
    // that is what "reshuffle each epoch" means
    val e8 = PipelineOps.epochShuffleAt(spark, sf, 8).collect().map(_.toSeq).toSeq
    assert(e7a.map(r => (r(0), r(1), r(2), r(3))) == e8.map(r => (r(0), r(1), r(2), r(3))),
      "bucket sizes and position ranges must not depend on the epoch")
    assert(e7a != e8, "epoch 8 must yield a different permutation than epoch 7")
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

  test("dd10 plans a bounded-state aggregation, no Window") {
    val plan = operators.PipelineOps.queries("dd10_source_cap")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"), s"window row_number reappeared:\n$plan")
    // the top-k must run as a two-phase (partial + final) aggregate so a
    // hot source is capped map-side before the shuffle
    assert("(?i)partial".r.findFirstIn(plan).isDefined,
      s"no partial aggregation phase in dd10 plan:\n$plan")
  }

  test("dd10 bounded top-k agg equals the window formulation on a skewed fixture") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one pathologically hot source (90% of rows), duplicate n_chars values
    // to exercise the doc_id tiebreak, plus tiny under-cap sources
    val rows = (1L to 900L).map(i => ("hot", 7 + (i % 5), i)) ++
      (1L to 30L).map(i => ("warm", 100 - i, 1000L + i)) ++
      Seq(("cold", 3L, 2000L), ("cold", 3L, 2001L))
    val docs = rows.toDF("source", "n_chars", "doc_id")
      .repartition(7) // force multi-partition partial merges
    val topk = udaf(operators.CapTopK)
    val viaAgg = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        topk(col("n_chars"), col("doc_id")).as("kept"))
      .select(col("source"), col("kept._1").as("n_kept"),
        (col("n_total") - col("kept._1")).as("n_dropped"),
        col("kept._2").as("kept_chars"))
      .orderBy("source").collect().map(_.toSeq)
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = docs.withColumn("keep", row_number().over(w) <= 10)
      .groupBy(col("source"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("source").collect().map(_.toSeq)
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("p14 model inference broadcasts the model and scores every doc") {
    val df = operators.PipelineOps.modelScore(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the model artifact must ride a broadcast join — a shuffled model
    // side would turn one-pass inference into a corpus shuffle at scale
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"model coefficients must be broadcast:\n$plan")
    // inference is total: one score per tokenized doc, flag consistent
    val rows = df.collect()
    val nTokenized = graft.functions.Text
      .withTokens(Catalog.table(spark, sf, "documents"))
      .filter(size(col("_toks")) > 0).count()
    assert(rows.length.toLong == nTokenized, "inference must score every doc")
    assert(rows.forall(r => (r.getLong(3) == 1L) == (r.getDouble(2) >= 0.6)))
  }

  test("p15 drift against an EMPTY previous snapshot is NULL, not NaN") {
    // a source whose every doc_id ≡ 0 (mod 3) has n_prev = 0; the old
    // 0.0/0.0 produced NaN in Spark vs engine-dependent output in DuckDB
    import spark.implicits._
    val docs = Seq(
      (0L, "allmod3", "en"), (3L, "allmod3", "de"), (6L, "allmod3", "en"),
      (1L, "healthy", "en"), (2L, "healthy", "de"), (3L, "healthy", "en"))
      .toDF("doc_id", "source", "lang")
    val out = operators.PipelineOps.snapshotDriftFrom(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(out("allmod3")._1 === 0L, "n_prev must be 0 for the mod-3 source")
    assert(out("allmod3")._2 == null, "empty-snapshot drift must be NULL")
    val healthy = out("healthy")._2
    assert(healthy != null && !healthy.asInstanceOf[Double].isNaN)
  }

  test("p11's explicit-schema read-back survives a zero-survivor landing") {
    // with schema INFERENCE, a partitioned overwrite that lands zero rows
    // (only _SUCCESS on disk) makes the read-back throw 'Unable to infer
    // schema'; the explicit schema returns the empty manifest instead —
    // the same landing + read-back shape landShards uses
    import org.apache.spark.sql.types._
    val dir = Catalog.tempDirWithCleanup("graft-p11-empty").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("quality", DoubleType),
      StructField("n_tok", LongType), StructField("shard_id", LongType)))
    spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      .write.mode("overwrite").partitionBy("shard_id").parquet(dir)
    val back = spark.read.schema(schema).parquet(dir)
    assert(back.count() === 0L)
    assert(back.schema.fieldNames.toSet ===
      Set("doc_id", "quality", "n_tok", "shard_id"))
  }
}
