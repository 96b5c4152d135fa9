package graft

import org.apache.spark.sql.functions._

class CoverageSpec extends SparkSpec {

  test("bucketed co-partitioned join plans without any shuffle exchange") {
    val (li, ord) = operators.Coverage.bucketedTables(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the assertion really exercises bucketing (AQE
      // would otherwise just broadcast the small side at this SF)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      // ShuffleExchangeExec renders as "Exchange hashpartitioning(...)" —
      // the node name is just "Exchange", so match the rendered form a
      // broken bucketing would actually produce
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and the join really is there (guards against the assertion going
      // vacuous if the plan shape changes)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout prunes partitions at the scan") {
    val df = operators.Coverage.x19PartitionPruning(spark, sf)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    // the status predicate must land in PartitionFilters, not a row filter
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("o_orderstatus"), s"expected partition pruning:\n$scan")
  }

  test("scan-level predicate pushdown reaches the parquet reader") {
    val df = operators.Relational.q1PricingSummary(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the shipdate filter must appear in PushedFilters on the scan node,
    // not only as a post-scan Filter
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(l_shipdate"),
      s"expected l_shipdate pushed to the scan:\n$plan")
    // and column pruning: the read schema carries only the needed columns.
    // The line must EXIST (a missing ReadSchema rendering would otherwise
    // make the negative check vacuously pass); l_orderkey is lineitem's
    // first column, so it sits inside the truncated metadata prefix when
    // not pruned.
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
    assert(readSchema.isDefined, s"no ReadSchema line in plan:\n$plan")
    assert(!readSchema.get.contains("l_orderkey"), s"unpruned scan: ${readSchema.get}")
  }

  test("as-of join re-aliases an exprId-overlapping right side (self-join)") {
    val ev = Catalog.eventsNorm(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    // same analyzed plan on both sides — without the fresh-alias Project the
    // BinaryNode's output would contain duplicate exprIds
    val joined = graft.plans.AsOfJoin.join(ev, ev,
      leftTime = "ts", rightTime = "ts",
      leftKey = "user_id", rightKey = "user_id", rightTieBreak = "event_id")
    assert(joined.columns.length == 6)
    val rows = joined.collect()
    assert(rows.length == ev.count())
    // every left row matches at least itself (same key, time <= time), so
    // the null-extended right side must never appear; the matched right row
    // shares the left row's user and does not postdate it
    rows.foreach { r =>
      assert(!r.isNullAt(4), s"self as-of join null-extended: $r")
      assert(r.getLong(1) == r.getLong(4))
      assert(!r.getTimestamp(5).after(r.getTimestamp(2)))
    }
  }

  test("n-gram length filter is exact (never drops a qualifying pair)") {
    import spark.implicits._
    // pairs straddling the 5*min >= 3*max boundary: sizes (3,5) pass the
    // filter, (2,5) cannot reach J=0.6 and are correctly prunable
    val docs = Seq(
      (1L, "a b c d e f"),          // 5 bigrams
      (2L, "a b c d"),              // 3 bigrams, subset → J = 3/5 = 0.6
      (3L, "a b x"),                // 2 bigrams, J vs doc1 = 1/6 < 0.6
      (4L, "a b c d e f")           // duplicate of 1 → J = 1.0
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")))
    docs.createOrReplaceTempView("cov_docs_tmp")
    val toks = graft.functions.Text.tokens(col("text"))
    val bg = graft.functions.Text.shingles2(toks)
    val base = docs.select(col("doc_id"), bg.as("bg"))
    val exact = base.as("a").join(base.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.bg"), col("b.bg"))).cast("double") /
          size(array_union(col("a.bg"), col("b.bg"))).cast("double")).as("j"))
      .filter(col("j") >= 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) at exactly J=0.6 and (1,4)/(2,?) survive; the filter in dd6 must
    // keep exactly these pairs among same-bucket docs
    assert(exact.contains((1L, 2L)) && exact.contains((1L, 4L)))
    // the prunable pair really is below threshold
    assert(!exact.contains((1L, 3L)))
    // filter exactness: 5*min>=3*max holds for every qualifying pair
    exact.foreach { case (a, b) =>
      val sizes = base.filter(col("doc_id").isin(a, b))
        .select(size(col("bg"))).collect().map(_.getInt(0))
      assert(5 * sizes.min >= 3 * sizes.max,
        s"length filter would wrongly prune qualifying pair ($a,$b)")
    }
  }

  test("q38 session co-occurrence matches a driver-side sessionization") {
    val rows = operators.Coverage.q38CooccurrenceLift(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side truth: sessionize the raw events with the same 12h gap
    val ev = Catalog.eventsNorm(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = operators.Coverage.SessionGapUs
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sids = sorted.scanLeft((0L, Long.MinValue / 4)) {
        case ((sid, prev), e) =>
          (if (e._2 - prev > gap) sid + 1 else sid, e._2)
      }.tail.map(_._1)
      sorted.zip(sids).map { case (e, sid) => ((e._1, sid), e._4) }
    }.toSeq.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val nSess = sessions.size.toLong
    val nOf = sessions.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val nAb = sessions.count(s => s(a) && s(b)).toLong
      assert(r.getLong(2) == nAb, s"pair ($a,$b) n_ab")
      assert(r.getLong(3) == nOf(a) && r.getLong(4) == nOf(b), s"($a,$b) singles")
      assert(r.getLong(5) == nSess, "n_sessions")
      assert(r.getDouble(6) == nAb.toDouble * nSess / (nOf(a) * nOf(b)),
        s"($a,$b) lift")
    }
    // completeness: every co-occurring unordered pair is reported
    val want = sessions.flatMap(s => s.toSeq.sorted.combinations(2)).toSet
    assert(rows.map(r => Seq(r.getString(0), r.getString(1))).toSet == want)
  }
}
