package graft

import org.apache.spark.sql.SparkSession

/** r19 optimization-lab main — the streaming micro-batch-floor rig the r18
  * verdict asked for: time each named registry query through the noop sink
  * exactly as Bench does, several runs back-to-back in one session, and for
  * s-family queries print the drained streaming query's per-micro-batch
  * `durationMs` phase breakdown (offset-log walCommit / queryPlanning /
  * addBatch / commitOffsets...) captured by
  * [[graft.streaming.StreamingOps.captureProgress]]. The gap between the
  * run's wall time and the sum of triggerExecution phases is the
  * start/stop/read-back floor the progress log cannot see. Usage:
  *   sbt "runMain graft.R19Probe <sfDir> <runs> <name> [<name>...]"
  */
object R19Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      "graft-r19probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { spark.range(1000).selectExpr("sum(id)").collect(): Unit }
    catch { case _: Throwable => }
    graft.streaming.StreamingOps.captureProgress = true
    names.foreach { n =>
      (1 to runs).foreach { i =>
        graft.streaming.StreamingOps.lastProgressJson = Nil
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"R19PROBE $n run$i t=$sec%.3f s")
        graft.streaming.StreamingOps.lastProgressJson
          .foreach(j => println(s"R19PROG $n $j"))
        System.gc()
      }
    }
    spark.stop()
  }
}
