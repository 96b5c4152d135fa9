package graft

import org.apache.spark.sql.functions._

/** Dev profiling main. Usage: sbt "runMain graft.Profile <sfDir>". */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-profile", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(Catalog.table(spark, dir, "embeddings").count())
    time("sim1")(operators.Similarity.cosineTopK(spark, dir).count())
    time("sim1_again")(operators.Similarity.cosineTopK(spark, dir).count())
    time("mm2")(operators.Multimodal.decodeFeatures(spark, dir).count())
    time("mm2_again")(operators.Multimodal.decodeFeatures(spark, dir).count())
    time("dd3")(operators.Dedup.minhashNearDup(spark, dir).count())
    time("q19")(operators.Relational.q19Terasort(spark, dir).count())
    time("s1")(streaming.StreamingOps.tumblingWindow(spark, dir).count())
    spark.stop()
  }
}
