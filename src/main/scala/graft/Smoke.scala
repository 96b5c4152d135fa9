package graft

/** Dev smoke runner mirroring the driver's t1 check: `entry` must return >0
  * rows on sf0.001. Usage: sbt "runMain graft.Smoke". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-smoke", 8)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}
