package graft

import graft.operators.Extended
import org.apache.spark.sql.functions._

class ExtendedSpec extends SparkSpec {

  test("pivot cells sum to the user's total event count") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Extended.pivotCounts(spark, sf).collect()
    val totals = Catalog.table(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(pivoted.nonEmpty)
    pivoted.foreach { r =>
      val sum = types.map(t => r.getAs[Long](t)).sum
      assert(sum == totals(r.getAs[Long]("user_id")))
    }
  }

  test("csv/json/orc roundtrips agree with the direct parquet aggregation") {
    val direct = Catalog.table(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 10 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sum(Sql.dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    for (q <- Seq(Extended.csvRoundtrip _, Extended.jsonRoundtrip _, Extended.orcRoundtrip _)) {
      val got = q(spark, sf).collect()
        .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Double]("sum_qty"),
          r.getAs[Long]("n_lines"))).toSet
      assert(got == direct)
    }
  }

  test("grouping sets produce |flags| + |statuses| + 1 rows") {
    val li = Catalog.table(spark, sf, "lineitem")
    val expected = li.select("l_returnflag").distinct.count() +
      li.select("l_linestatus").distinct.count() + 1
    assert(Extended.groupingSets(spark, sf).count() == expected)
  }

  test("second max is strictly below max and both exist in the data") {
    val qtys = Catalog.table(spark, sf, "lineitem")
      .select("l_quantity").collect().map(_.getDouble(0)).toSet
    Extended.secondMax(spark, sf).collect().foreach { r =>
      val mx = r.getAs[Double]("max_qty"); val snd = r.getAs[Double]("second_qty")
      assert(snd < mx)
      assert(qtys.contains(mx) && qtys.contains(snd))
    }
  }

  test("token explode top-30 is frequency-sorted and n_docs <= n_occurrences") {
    val rows = Extended.tokenExplode(spark, sf).collect()
    assert(rows.length == 30)
    val freqs = rows.map(_.getAs[Long]("n_occurrences"))
    assert(freqs.sameElements(freqs.sorted(Ordering[Long].reverse)))
    rows.foreach(r =>
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occurrences")))
  }

  test("x30 parse modes: FAILFAST dies, DROPMALFORMED keeps exactly the clean rows") {
    // run the registered query first — it generates the corrupted files
    val out = Extended.corruptIngest(spark, sf).collect()
    val cleanRows = out.filter(_.getString(0) == "clean").map(_.getLong(2)).sum
    val corruptRows = out.filter(_.getString(0) == "corrupt").map(_.getLong(2)).sum
    assert(cleanRows > 0 && corruptRows > 0, "fixture must exercise both populations")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    // FAILFAST: the first malformed line aborts the read — the mode a
    // pipeline uses when corrupt input must stop the job, not leak past it
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("mode", "FAILFAST")
        .json(Extended.corruptDir).collect()
    }
    // DROPMALFORMED: silently keeps exactly the clean population
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .json(Extended.corruptDir).count()
    assert(dropped === cleanRows)
    // PERMISSIVE without a corrupt column: malformed lines become all-null
    // rows — total row count is preserved
    val permissive = spark.read.schema(schema).option("mode", "PERMISSIVE")
      .json(Extended.corruptDir).count()
    assert(permissive === cleanRows + corruptRows)
  }

  test("x29 writes genuine avro container files (magic bytes + embedded schema)") {
    // the roundtrip oracle proves the DATA survives; this proves the files
    // really are avro object-container format — readable by any avro tool
    // — not some accidental serialization
    val out = Extended.avroRoundtrip(spark, sf)
    assert(out.collect().nonEmpty)
    // THIS run's output dir, not a tmpdir scan (a crashed prior JVM can
    // leave a stale graft-roundtrip* tree that would be inspected instead)
    val dir = new java.io.File(Extended.avroOutputDir)
    assert(dir.isDirectory, s"avro output dir not found: $dir")
    val parts = dir.listFiles().filter(_.getName.endsWith(".avro"))
    assert(parts.nonEmpty, s"no .avro part files in $dir")
    parts.foreach { f =>
      val in = new java.io.FileInputStream(f)
      try {
        val head = new Array[Byte](512)
        val n = in.read(head)
        // avro object container magic: 'O' 'b' 'j' 0x01
        assert(n > 4 && head(0) == 'O' && head(1) == 'b' && head(2) == 'j'
          && head(3) == 1, s"${f.getName} lacks avro container magic")
        // the writer schema is embedded in the file header metadata
        assert(new String(head, "ISO-8859-1").contains("lineitem_slice"),
          s"${f.getName} header missing embedded schema")
      } finally in.close()
    }
  }

  test("Spark's own InjectRuntimeFilter plants the same bloom probe at scale") {
    // x26 writes the runtime filter explicitly; this proves the engine's
    // conf surface also gets it FOR FREE on a plain shuffle join — the
    // 100 TB case, where the dimension side exceeds any broadcast
    // threshold (modeled here by disabling auto-broadcast) and the scan
    // threshold is met (forced to 0 at test scale).
    //
    // WHEN EACH APPLIES: the automatic injection fires only when the
    // optimizer sees a selective filter on the build side of a shuffle
    // equi-join AND its size heuristics line up (creation-side under
    // bloomFilter.creationSideThreshold, application side over
    // applicationSideScanSizeThreshold, no broadcast). The x26 manual form
    // is for everything the heuristics cannot see: a key set produced by
    // an aggregate or UDF (no selectivity estimate), a reused sketch
    // across several queries, pruning through a non-join consumer, or a
    // conf-locked cluster. Same mechanics either way — scalar-subquery
    // sketch planted into the fact scan's filter — so the manual pattern
    // is the documented escape hatch, not a different feature.
    val keep = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      import org.apache.spark.sql.functions._
      val keys = Catalog.table(spark, sf, "orders")
        .filter(col("o_totalprice") > 450000.0).select("o_orderkey")
      val joined = Catalog.table(spark, sf, "lineitem")
        .join(keys, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter was not injected on the shuffle join:\n$optimized")
    } finally keep.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("x26 plants a bloom probe on the fact scan and stays transparent") {
    val df = Extended.bloomPruneJoin(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the sketch build and the row-level probe both survive optimization
    assert(optimized.contains("bloom_filter_agg"),
      s"bloom sketch aggregate missing from the plan:\n$optimized")
    assert(optimized.contains("might_contain"),
      s"bloom probe missing from the plan:\n$optimized")
    // the probe must sit BELOW the semi join (prune before shuffle): in the
    // optimized tree the Join node appears above the Filter carrying
    // might_contain on the lineitem relation
    val joinIdx = optimized.indexOf("Join LeftSemi")
    val probeIdx = optimized.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"bloom probe is not below the semi join:\n$optimized")
    // no false negatives: bloom-pruned result == plain semi join
    import org.apache.spark.sql.functions._
    val keys = Catalog.table(spark, sf, "orders")
      .filter(col("o_totalprice") > 450000.0).select("o_orderkey")
    val plain = Catalog.table(spark, sf, "lineitem")
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pruned = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pruned.toSeq == plain.toSeq)
  }
}
