package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway A/B (r16 VERDICT ask #3): measure dd19's two verify shapes
  * (slim pair-attach vs dd16-style ride-in) at the production threshold
  * across blow-up factors. Usage: runMain graft.Dd19Ab [baseSf] [factors]
  */
object Dd19Ab {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 8, 16, 32))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      "graft-dd19-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tm = new BenchTaskMetricsListener
    spark.sparkContext.addSparkListener(tm)
    val sfName = java.nio.file.Paths.get(baseDir).getFileName.toString
    val outRoot = s"/tmp/graft-scale-$sfName"
    def timed(fn: (SparkSession, String) => DataFrame, dir: String): Unit = {
      org.apache.spark.GraftListenerBridge.drainListenerEvents(spark.sparkContext)
      val (sr0, sw0, sp0) = (tm.shuffleRead.get, tm.shuffleWrite.get, tm.spill.get)
      // row count via observe() on the SAME execution — a second
      // fn(...).count() would re-run the whole verify pipeline and
      // double the sweep's wall clock (review finding)
      val obs = org.apache.spark.sql.Observation()
      val t0 = System.nanoTime()
      fn(spark, dir)
        .observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.drainListenerEvents(spark.sparkContext)
      val sh = tm.shuffleRead.get - sr0 + tm.shuffleWrite.get - sw0
      val sp = tm.spill.get - sp0
      val rows = obs.get("n").asInstanceOf[Long]
      println(f"[dd19-ab] dir=$dir rows=$rows sec=$sec%.1f " +
        f"shuffleGB=${sh / 1e9}%.2f spillGB=${sp / 1e9}%.2f")
      try spark.catalog.clearCache() catch { case _: Throwable => }
    }
    factors.foreach { n =>
      val dir = Scale.ensureBlowup(spark, baseDir, outRoot, n)
      val cand = operators.Dedup.semanticDedupProdCandidates(spark, dir).count()
      val vecs = operators.Similarity.emb(spark, dir).count()
      println(s"[dd19-ab] x$n candidates=$cand corpus_x_bands=" +
        s"${vecs * graft.expr.RandomHyperplanes.ProdBands}")
      println(s"[dd19-ab] x$n PAIR-ATTACH:")
      timed(operators.Dedup.semanticDedupProd, dir)
      println(s"[dd19-ab] x$n RIDE-IN:")
      timed(operators.Dedup.semanticDedupProdRideIn, dir)
    }
    spark.stop()
  }
}
