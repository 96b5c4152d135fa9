package graft

import org.apache.spark.sql.SparkSession

/** Debugging main: execute one frame and print its AQE-final plan.
  * `runMain graft.PlanPeek [sfDir] [registryQueryName]` — with no query
  * name it peeks dd6's candidate frame (the original hardwired target). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      "graft-plan-peek").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = args.lift(1) match {
      case Some(name) => SparkEntry.queries(name)(spark, dir)
      case None => operators.Dedup.ngramCandidateFrame(spark, dir)
    }
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"== count=$n in ${(System.nanoTime() - t0) / 1e9}s")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
