package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** r18 optimization-lab main: for each named registry query, time the noop
  * sink exactly as Bench does and capture the ACTUAL executed (AQE-final)
  * plan of that very write via a QueryExecutionListener — printing
  * `df.queryExecution.executedPlan` after a write/count is a trap: those
  * actions run their OWN QueryExecution, so the dataset's plan stays
  * isFinalPlan=false and shows none of the runtime reuse/broadcast
  * decisions. Output: `<outDir>/<name>.txt` with the pre-execution
  * formatted plan plus the executed final plan. Usage:
  *   sbt "runMain graft.R18Probe <sfDir> <outDir> <name> [<name>...]"
  */
object R18Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      "graft-r18probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var lastPlan: String = "<none captured>"
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        lastPlan = qe.executedPlan.toString
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try { spark.range(1000).selectExpr("sum(id)").collect(): Unit }
    catch { case _: Throwable => }
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      lastPlan = "<none captured>"
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // the listener fires asynchronously on the listener bus — drain it so
      // lastPlan is THIS write's plan, not a stale one
      try org.apache.spark.GraftListenerBridge
        .drainListenerEvents(spark.sparkContext)
      catch { case _: Throwable => Thread.sleep(1000) }
      println(f"R18PROBE $n t=$sec%.2f s")
      java.nio.file.Files.write(outDir.resolve(s"$n.txt"),
        (s"== r18 probe: $n (noop-sink ${f"$sec%.2f"} s at cores=$cpus) ==\n\n" +
          formatted + "\n\n== executed (AQE-final) plan of the noop write ==\n" +
          lastPlan + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.gc()
    }
    spark.stop()
  }
}
