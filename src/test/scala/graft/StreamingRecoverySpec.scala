package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Fault-tolerance: stateful streaming STATE survives a query restart via
  * the checkpoint. The reference recovers shuffle state through replicated
  * block placement (`/root/reference/src/main/scala/org/scache/storage/
  * BlockManager.scala:1181-1281`); Structured Streaming's equivalent is the
  * checkpointed state store + source offsets, exercised here end-to-end:
  *
  *   run 1 sees only the first half of a time-split corpus and commits its
  *   per-user aggregate state; run 2 is a NEW query on the SAME checkpoint
  *   after the second half arrives. If offset recovery works, run 2 skips
  *   the already-committed files; if state recovery works, its totals
  *   CONTINUE from run 1's counts. The final merged sink must equal the
  *   batch aggregate over the full corpus — which is impossible if either
  *   half of the recovery dropped or double-counted anything. */
class StreamingRecoverySpec extends SparkSpec {

  test("stateful aggregation state survives a checkpointed restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-recovery")
    try {
    val stage = s"$base/stage"
    val data = s"$base/data"
    val chk = s"$base/chk"
    new java.io.File(stage).mkdirs()

    // 8 time-ranged split files (same shape as the s11/s14 source)
    val allDir = s"$base/all"
    Catalog.eventsNorm(spark, sf)
      .repartitionByRange(8, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(allDir)
    val parts = new java.io.File(allDir).listFiles
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length === 8)

    val normSchema = StructType(Catalog.events.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampType) else f))

    def copyIn(fs: Seq[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(stage, f.getName)): Unit
    }

    def runOnce(): Unit = {
      val agg = spark.readStream.schema(normSchema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100, 0).cast(LongType)).as("total_cents"))
      val q = agg.writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", chk)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.withColumn("batch_id", lit(id)).write.mode("append").parquet(data)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    copyIn(parts.take(4))
    runOnce() // run 1: first half, state committed to chk
    val batchesAfterRun1 = spark.read.parquet(data)
      .select(max(col("batch_id"))).head.getLong(0)

    copyIn(parts.drop(4))
    runOnce() // run 2: NEW query, SAME checkpoint — must resume, not rescan

    val merged = spark.read.parquet(data)
    // offset recovery: run 2 produced NEW batch ids (it did not restart
    // from batch 0 — the committed source offsets were honored)
    assert(merged.select(max(col("batch_id"))).head.getLong(0) > batchesAfterRun1)

    // state recovery: latest-batch-wins totals equal the batch aggregate
    // over the FULL corpus. Users whose events span both halves prove the
    // state continued (a fresh-state run 2 would undercount them).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("batch_id").desc)
    val got = merged
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"), col("n_events"), col("total_cents"))
    val want = Catalog.eventsNorm(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast(LongType)).as("total_cents"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally {
      // removed on failure too — a red run must not leak parquet copies
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(base.toFile)
    }
  }

  test("s27's transformWithState quota counts survive a checkpointed restart") {
    // The admission gate's production contract: a redeployed ingest gate
    // must CONTINUE each source's admitted count from the checkpoint — a
    // fresh-state restart would re-admit up to cap again and the union
    // would overshoot every source's quota. Generation 1 (lower doc_id
    // half) drains in run 1; the store then grows; run 2 on the SAME
    // checkpoint drains only the new blocks with restored ValueState. The
    // combined sink must equal the batch ROW_NUMBER quota over the FULL
    // corpus — impossible unless both offset and state recovery held.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-quota-recovery")
    val store = "quota-recovery-store"
    graft.sources.BlockStore.dropStore(store)
    val prev = spark.conf.getOption(streaming.StreamingOps.ProviderKnob)
    spark.conf.set(streaming.StreamingOps.ProviderKnob,
      streaming.StreamingOps.RocksDbProvider)
    try {
      val docs = Catalog.table(spark, sf, "documents")
      val mid = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
      def land(df: DataFrame): Unit =
        df.write.format("graft.sources.BlockStoreSource")
          .option("store", store).mode("append").save()

      def runOnce(): Unit = {
        val admitted = spark.readStream
          .format("graft.sources.BlockStoreSource")
          .option("store", store).option("maxBlocksPerTrigger", "8").load()
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .transformWithState(
            new streaming.SourceQuotaProcessor(streaming.StreamingOps.QuotaCap),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Append())
          .toDF("source", "doc_id", "admit_idx")
        val q = admitted.writeStream.outputMode(OutputMode.Append())
          .format("parquet").option("path", s"$base/data")
          .option("checkpointLocation", s"$base/chk")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }

      land(docs.filter(col("doc_id") <= mid))
      runOnce() // run 1: generation 1 admitted, state checkpointed
      land(docs.filter(col("doc_id") > mid))
      runOnce() // run 2: NEW query, SAME checkpoint — counts must resume

      val got = spark.read.parquet(s"$base/data")
        .select(col("source"), col("doc_id"), col("admit_idx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._3)).toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val want = docs
        .withColumn("admit_idx", row_number().over(w).cast(LongType))
        .filter(col("admit_idx") <= streaming.StreamingOps.QuotaCap)
        .select(col("source"), col("doc_id"), col("admit_idx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._3)).toSeq
      assert(got == want,
        "restarted quota must continue counts — union equals the batch quota")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(streaming.StreamingOps.ProviderKnob, v)
        case None => spark.conf.unset(streaming.StreamingOps.ProviderKnob)
      }
      graft.sources.BlockStore.dropStore(store)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(base.toFile)
    }
  }
}
