package graft

import org.apache.spark.sql.functions._

/** Dev profiling main: time the stages of dd3 in isolation.
  * Usage: sbt "runMain graft.Profile <sfDir>". */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-profile", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.functions.Text
    val tokenized = Text.withTokens(Catalog.table(spark, dir, "documents"))
    time("warmup")(tokenized.count())
    val withSh = tokenized
      .filter(size(col("_toks")) >= 3)
      .select(col("doc_id"), Text.shingles3(col("_toks")).as("sh"))
    time("withSh_count")(withSh.count())
    time("withSh_again")(withSh.count())
    val hashed = withSh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), (Text.sharedHash(col("s")) % 2147483647L).as("h"))
    time("hashed_agg")(hashed.agg(sum("h")).count())
    time("dd3_full")(operators.Dedup.minhashNearDup(spark, dir).count())
    spark.stop()
  }
}
