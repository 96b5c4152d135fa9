package graft

/** Throwaway dev main: time any registered query twice (cold/warm).
  * Usage: sbt "runMain graft.DevProbe <sfDir> <name> [<name>...]". */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_pricing_summary")
    val spark = Engine.session("graft-devprobe", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(Catalog.table(spark, dir, "documents").count())
    names.foreach { n =>
      time(n)(SparkEntry.queries(n)(spark, dir).count())
      time(s"${n}_warm")(SparkEntry.queries(n)(spark, dir).count())
    }
    spark.stop()
  }
}
