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

  test("zorder_interleave matches a reference Morton code (codegen + interpreted)") {
    graft.expr.VectorExpressions.register(spark)
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      (0 until 16).foreach { i =>
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65536L + 7L, 3L)) // out-of-range masks to low 16
    val got = pts.toDF("x", "y")
      .select(call_function("zorder_interleave", col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pts.map { case (x, y) => ref(x & 0xFFFF, y & 0xFFFF) },
      "codegen Morton diverged from the bit-loop reference")
  }

  test("x31 z-layout skips files on BOTH dimensions; linear only on its sort key") {
    // land the z-ordered layout, then a linear (orderkey-sorted) layout of
    // the same table into the same file count, and compare how many files'
    // min/max boxes overlap each predicate. The per-file stats are computed
    // by scan (input_file_name groupBy) — the same bounds parquet footers
    // carry, without depending on footer-reader internals.
    val zResult = Extended.zorderLayout(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val li = Catalog.table(spark, sf, "lineitem")
    val b = li.agg(min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_partkey")), max(col("l_partkey"))).head()
    val (okLo, okHi, pkLo, pkHi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val okCut = okLo + (okHi - okLo) / 10
    val pkCut = pkLo + (pkHi - pkLo) / 10
    // result-transparency: same box straight over the table
    val straight = li
      .filter(col("l_orderkey") <= okCut && col("l_partkey") <= pkCut)
      .groupBy(col("l_returnflag"))
      .agg(graft.Sql.asLong(count(lit(1))).as("n_rows"),
        graft.Sql.dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(zResult == straight, "z-layout changed the query result")

    val linDir = java.nio.file.Files.createTempDirectory("graft-linear").toString
    li.repartitionByRange(Extended.ZOrderFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)
    def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min(col("l_orderkey")), max(col("l_orderkey")),
          min(col("l_partkey")), max(col("l_partkey")))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val zBoxes = fileBoxes(Extended.zorderDir)
    val linBoxes = fileBoxes(linDir)
    assert(zBoxes.size == linBoxes.size, "layouts must have equal file counts")
    // partkey-only predicate: the linear layout's non-sort dimension —
    // every linear file spans ~the whole partkey range, z-files cluster it
    val zPk = zBoxes.count(f => f._3 <= pkCut)
    val linPk = linBoxes.count(f => f._3 <= pkCut)
    assert(zPk < linPk,
      s"z-layout must skip files on the non-sort dimension: z=$zPk lin=$linPk")
    // 2-D box: z touches its corner cells, never more than linear
    val zBox = zBoxes.count(f => f._1 <= okCut && f._3 <= pkCut)
    val linBox = linBoxes.count(f => f._1 <= okCut && f._3 <= pkCut)
    assert(zBox <= linBox && zBox < zBoxes.size,
      s"2-D box should touch few z-files: z=$zBox lin=$linBox of ${zBoxes.size}")
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
