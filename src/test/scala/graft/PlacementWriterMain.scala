package graft

import graft.sources.{BlockStore, Placement}

/** The SECOND JVM of the cross-process topology spec ([[CrossJvmSpec]]):
  * an independent writer process that lands deterministic shard blocks
  * through the pure placement function into a shared disk-tier layout
  * (`outDir/host-<h>/<store>/shard-<s>.bin`, the store's own block
  * encoding) — the reference's per-node client writing to the daemon it
  * resolves from the tracker (`deploy/ScacheMaster.scala:130-147`,
  * `Daemon.scala:33-37`), with the tracker state replaced by the pure
  * function both processes can evaluate. No Spark in this JVM: placement
  * and the block codec are the only shared contracts the spec exercises.
  *
  * args: outDir store nHosts nReplicas nShards rowsPerShard */
object PlacementWriterMain {

  /** The deterministic rows shard `s` carries — recomputed identically by
    * the parent spec (the cross-process agreement is the point). */
  def shardRows(shard: Int, n: Int): Array[BlockStore.DocRow] =
    Array.tabulate(n)(i => (shard * 1000L + i, s"doc-$shard-$i",
      s"l${i % 3}", s"s${i % 2}", (shard * 31 + i).toLong))

  def main(args: Array[String]): Unit = {
    val Array(outDir, store, nHostsS, nRepS, nShardsS, rowsS) = args
    val (nHosts, nRep, nShards, rows) =
      (nHostsS.toInt, nRepS.toInt, nShardsS.toInt, rowsS.toInt)
    (0 until nShards).foreach { shard =>
      val bytes = BlockStore.encodeRows(shardRows(shard, rows))
      Placement.hostsFor(store, shard, nHosts, nRep).foreach { h =>
        val dir = java.nio.file.Paths.get(outDir, s"host-$h", store)
        java.nio.file.Files.createDirectories(dir): Unit
        java.nio.file.Files.write(dir.resolve(s"shard-$shard.bin"), bytes): Unit
      }
    }
  }
}
