package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors the public API does not
  * expose in Spark 4: building a DataFrame from a hand-constructed
  * LogicalPlan (needed to surface custom logical operators like
  * graft.plans.AsOfJoinPlan). Standard extension-library pattern. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
