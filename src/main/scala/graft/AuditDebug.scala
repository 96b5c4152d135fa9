package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: reproduce audit-time construction failures with full traces.
  * Usage: runMain graft.AuditDebug <dir> name1,name2,...
  */
object AuditDebug {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      "graft-audit-debug").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"=== $n ===")
      try {
        val plan = SparkEntry.queries(n)(spark, dir).queryExecution.sparkPlan
        println(s"OK: ${plan.getClass.getSimpleName}")
      } catch {
        case e: Throwable =>
          e.printStackTrace()
          var c = e.getCause
          while (c != null) { println(s"CAUSE: $c"); c = c.getCause }
      }
    }
    spark.stop()
  }
}
