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
}
