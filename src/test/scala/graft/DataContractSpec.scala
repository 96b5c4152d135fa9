package graft

import org.apache.spark.sql.functions._

/** The r9 failure mode, made loud: Spark silently reads a re-encoded parquet
  * column through a stale user schema and produces garbage with zero errors.
  * [[Catalog.assertDataContract]] must catch that drift at Verify/Bench
  * startup with one precise message instead of 15 red oracle rows.
  */
class DataContractSpec extends SparkSpec {

  test("guard passes on the real testdata") {
    Catalog.assertDataContract(spark, sf) // must not throw
  }

  test("guard fails loudly on a drifted fixture, naming the table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-contract").toString
    // clone the tiny sf0.001 tables, then re-encode events.ts back to the
    // pre-r9 raw INT64 — exactly the drift that went silent last round
    Catalog.schemas.keys.foreach { name =>
      val df = spark.read.parquet(s"$sf/$name.parquet")
      val out =
        if (name == "events")
          df.withColumn("ts", unix_micros(col("ts").cast("timestamp")))
        else df
      out.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    val e = intercept[IllegalStateException] {
      Catalog.assertDataContract(spark, dir)
    }
    assert(e.getMessage.contains("DATA CONTRACT DRIFT"))
    assert(e.getMessage.contains("events"))
    // only events drifted — the other nine tables must not be named
    assert(!e.getMessage.contains("lineitem"))
  }

  test("guard fails loudly on an unreadable table path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-missing").toString
    val e = intercept[IllegalStateException] {
      Catalog.assertDataContract(spark, dir)
    }
    assert(e.getMessage.contains("unreadable"))
  }
}
