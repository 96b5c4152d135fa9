package graft

import org.apache.spark.sql.functions._

/** Demonstrates the AQE skew-join split — the engine's replacement for the
  * reference's heuristic reduce pre-scheduler (SURVEY.md §4 row 2): one hot
  * key would pin a whole reduce partition on one task; AQE splits it from
  * EXACT runtime MapStatus sizes, which is what the reference's offline
  * LinearRegression predictor only approximated. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot key's shuffle partition at join time") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16kb",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // left: 200k rows, 95% on key 0 (one hot shuffle partition);
      // right: 100 small keys
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 100)
          .as("k"), col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS queryExecution finalizes its
      // adaptive plan — count() runs a separate execution
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"), s"expected a skew-split shuffle read:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE converts a statically-SMJ join to broadcast from runtime sizes") {
    // The size-only estimator gives a Filter its CHILD's sizeInBytes (no
    // selectivity discount), so with a small broadcast threshold the
    // planner statically picks SortMergeJoin for a filtered-but-
    // "big-looking" side; at runtime the filtered shuffle is a few
    // hundred bytes and AQE re-plans the join as a broadcast — the
    // runtime-statistics re-plan SURVEY maps the reference's offline
    // predictor to (its other half being the skew split above).
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "4kb")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val orders = Catalog.table(spark, sf, "orders")
      val lineitem = Catalog.table(spark, sf, "lineitem")
      val tiny = orders.filter(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey"), col("o_orderdate"))
      val joined = lineitem.join(tiny, col("l_orderkey") === col("o_orderkey"))
      // BEFORE execution: the adaptive plan is not final and the initial
      // physical choice is a sort-merge join
      val initial = joined.queryExecution.executedPlan.toString
      assert(initial.contains("isFinalPlan=false") &&
        initial.contains("SortMergeJoin"),
        s"static plan should start as SMJ under the shrunken threshold:\n$initial")
      val n = joined.collect().length
      assert(n > 0, "join fixture selected nothing")
      val fin = joined.queryExecution.executedPlan.toString
      assert(fin.contains("isFinalPlan=true") &&
        fin.contains("BroadcastHashJoin"),
        s"AQE should have re-planned the join as broadcast:\n$fin")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
