package graft

/** Streaming state AT SCALE: the default (HDFS-backed) state store keeps
  * every key's state on the executor HEAP — at 100 TB-corpus key
  * cardinalities (billions of users) that is an OOM, not a config problem.
  * The deploy answer is Spark's bundled RocksDB provider
  * (`spark.sql.streaming.stateStore.providerClass`): state lives off-heap /
  * on local SSD with the same exactly-once checkpoint contract.
  *
  * This spec proves the engine's stateful operators are PROVIDER-AGNOSTIC:
  * the s4 running-totals query (mapGroupsWithState, the most state-heavy
  * shape in the registry) produces bit-identical results under the RocksDB
  * provider vs the default. The provider class is read per-query from the
  * session conf at stream start, so a runtime `spark.conf.set` is the whole
  * swap — nothing in the operator code changes, which is the point.
  */
class RocksDbStateSpec extends SparkSpec {

  private val Knob = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("s4 stateful totals are identical under the RocksDB state store") {
    val dflt = streaming.StreamingOps.statefulTotals(spark, sf)
      .collect().map(_.toSeq)
    val prev = spark.conf.getOption(Knob)
    spark.conf.set(Knob, RocksDb)
    try {
      val rocks = streaming.StreamingOps.statefulTotals(spark, sf)
        .collect().map(_.toSeq)
      assert(rocks.nonEmpty)
      assert(rocks.toSeq == dflt.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Knob, v)
        case None    => spark.conf.unset(Knob)
      }
    }
  }
}
