package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: run one registered query on a blown-up corpus and
  * print per-STAGE task-metric rollups (spill/shuffle/records), so a
  * scale-row's spill can be attributed to the plan stage that produced it.
  * Usage: runMain graft.ScaleProbe <dir> <queryName> */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      "graft-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_INIT_PARTITIONS").foreach(v =>
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", v))
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          System.err.println(f"[probe] stage=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"memSpill=${m.memoryBytesSpilled / 1e6}%9.1fMB " +
            f"diskSpill=${m.diskBytesSpilled / 1e6}%9.1fMB " +
            f"sRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.1fMB " +
            f"sWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB " +
            f"peakMem=${m.peakExecutionMemory / 1e6}%9.1fMB  ${si.name.takeWhile(_ != '\n').take(90)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    if (args.length > 2 && args(2) == "warmbase") {
      val tb = System.nanoTime()
      operators.Dedup.ensureNgramBase(spark, dir)
      System.err.println(f"[probe] base_build=${(System.nanoTime() - tb) / 1e9}%.1fs")
      spark.sparkContext.getRDDStorageInfo.foreach { i =>
        System.err.println(f"[probe] cached ${i.name.take(60)} parts=${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize / 1e6}%.1fMB disk=${i.diskSize / 1e6}%.1fMB")
      }
    }
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.mode("overwrite").format("noop").save()
    System.err.println(f"[probe] total=${(System.nanoTime() - t0) / 1e9}%.1fs")
    System.err.println("[probe-plan] " +
      df.queryExecution.executedPlan.toString.linesIterator
        .map(l => "\n[probe-plan] " + l).mkString)
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      System.err.println(f"[probe] cached ${i.name.take(60)} parts=${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize / 1e6}%.1fMB disk=${i.diskSize / 1e6}%.1fMB")
    }
    org.apache.spark.GraftListenerBridge.drainListenerEvents(spark.sparkContext)
    spark.stop()
  }
}
