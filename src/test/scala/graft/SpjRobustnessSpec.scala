package graft

import graft.sources.BlockStore
import org.apache.spark.sql.functions._

/** Storage-partitioned-join ROBUSTNESS under the two layouts x37's
  * happy path never meets (r10 verdict ask #5):
  *
  *   1. WIDTH MISMATCH — two stores sharded at different widths must fall
  *      back to a normal Exchange-backed join and stay CORRECT. The
  *      reference rejects mismatched co-registrations at registration
  *      (`MapOutputTracker.scala:219-255` same-reducer-count check); the
  *      Spark-native guarantee is the planner's: incompatible
  *      `bucket(width, doc_id)` specs simply never elide the Exchange, so
  *      mismatch degrades to the ordinary plan instead of co-locating
  *      wrongly.
  *
  *   2. SKEWED / CHUNKED SHARDS — a same-width store whose shards each
  *      carry SEVERAL blocks (the layout a skewed ingest lands) must still
  *      join Exchange-free: the scan emits one keyed partition per block
  *      and Spark's key-grouped machinery groups (or, under
  *      `partiallyClusteredDistribution.enabled`, replicates against) the
  *      same-key partitions. Asserted with the conf ON and OFF — both
  *      must be correct and Exchange-free.
  */
class SpjRobustnessSpec extends SparkSpec {

  private def docs = Catalog.table(spark, sf, "documents")

  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("width-mismatched pair falls back to Exchange — and stays correct") {
    noBroadcast {
      val (cur, _) = BlockStore.ensureShardedSnapshots(spark, sf)
      val wide = BlockStore.ensureWidthMismatched(spark, sf)
      val joined = spark.table(s"graftblocks.`$cur`")
        .hint("merge")
        .join(spark.table(s"graftblocks.`$wide`")
          .select(col("doc_id"), col("n_chars").as("w_chars")), Seq("doc_id"))
        .select(col("doc_id"), col("n_chars"), col("w_chars"))
      val rows = joined.collect()
      // both stores hold the full corpus → self-join row count = |docs|,
      // and n_chars must agree with itself on every row
      assert(rows.length.toLong == docs.count(),
        "mismatched-width join lost or grew rows")
      assert(rows.forall(r => r.getLong(1) == r.getLong(2)),
        "mismatched-width join matched the WRONG rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"differing widths must fall back to a shuffled join, got:\n$plan")
    }
  }

  test("chunked (multi-block-per-shard) pair joins Exchange-free, " +
    "with and without partially-clustered distribution") {
    noBroadcast {
      val (cur, _) = BlockStore.ensureShardedSnapshots(spark, sf)
      val chunk = BlockStore.ensureChunkedSnapshot(spark, sf)
      // the fixture really is many-blocks-per-shard
      assert(BlockStore.blockCount(chunk) > BlockStore.SpjShards,
        "chunked fixture landed one block per shard — nothing to group")
      val expect = docs.count()
      val pcKey =
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
      val prev = spark.conf.getOption(pcKey)
      try {
        Seq("false", "true").foreach { pc =>
          spark.conf.set(pcKey, pc)
          val joined = spark.table(s"graftblocks.`$cur`")
            .hint("merge")
            .join(spark.table(s"graftblocks.`$chunk`")
              .select(col("doc_id"), col("n_chars").as("c_chars")),
              Seq("doc_id"))
            .select(col("doc_id"), col("n_chars"), col("c_chars"))
          val rows = joined.collect()
          assert(rows.length.toLong == expect,
            s"chunked SPJ join (pc=$pc) lost or grew rows")
          assert(rows.forall(r => r.getLong(1) == r.getLong(2)),
            s"chunked SPJ join (pc=$pc) matched the WRONG rows")
          val plan = joined.queryExecution.executedPlan.toString
          assert(plan.contains("SortMergeJoin") &&
            !plan.contains("Exchange hashpartitioning"),
            s"chunked same-width SPJ (pc=$pc) must stay Exchange-free:\n$plan")
        }
      } finally {
        prev match {
          case Some(v) => spark.conf.set(pcKey, v)
          case None => spark.conf.unset(pcKey)
        }
      }
    }
  }
}
