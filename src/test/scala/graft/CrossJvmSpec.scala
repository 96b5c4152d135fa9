package graft

import java.nio.file.{Files, Paths}

import graft.sources.{BlockStore, Placement}

/** CROSS-JVM topology: the reference's defining deployment is one master
  * plus per-node client JVMs exchanging blocks they place via tracker
  * state (`deploy/ScacheMaster.scala:130-147`, `Daemon.scala:33-37`).
  * Our Spark-native stance replaces the tracker with a PURE placement
  * function and the RPC data plane with the disk tier — which makes the
  * cross-process contract testable without a cluster: a genuinely
  * separate JVM ([[PlacementWriterMain]], forked here with no Spark in
  * it) writes shard blocks through the placement function into a shared
  * directory layout, and THIS process independently re-derives the same
  * placement, reads the bytes back, and serves them through the DSv2
  * connector. What that settles (the §2B gap): placement agreement needs
  * no shared mutable state, replicas are byte-identical wherever they
  * land, and the block encoding is a stable interchange format between
  * processes — the three properties a real multi-node deployment of the
  * store would stand on. */
class CrossJvmSpec extends SparkSpec {

  private val (nHosts, nRep, nShards, rowsPerShard) = (4, 1, 8, 20)

  test("a forked JVM lands blocks via the placement function; this JVM " +
    "re-derives the layout, reads the bytes, serves them via the connector") {
    val out = Files.createTempDirectory("graft-crossjvm").toString
    val store = "xproc-store"

    // fork the writer: same classpath, NO Spark session in the child —
    // the only shared contracts are the placement function and the codec
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val proc = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.PlacementWriterMain", out, store, nHosts.toString,
      nRep.toString, nShards.toString, rowsPerShard.toString)
      .redirectErrorStream(true).start()
    val log = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"writer JVM failed:\n$log")

    // 1: the on-disk layout matches THIS process's independent evaluation
    // of the placement function — file present exactly at primary+backup
    // hosts, absent everywhere else
    (0 until nShards).foreach { shard =>
      val hosts = Placement.hostsFor(store, shard, nHosts, nRep).toSet
      assert(hosts.size == nRep + 1, s"shard $shard placement degenerate")
      (0 until nHosts).foreach { h =>
        val p = Paths.get(out, s"host-$h", store,
          s"shard-$shard.bin")
        assert(Files.exists(p) == hosts.contains(h),
          s"shard $shard at host $h: layout disagrees with placement " +
            s"(expected hosts $hosts)")
      }
    }

    // 2: replicas are byte-identical wherever the function placed them
    (0 until nShards).foreach { shard =>
      val hosts = Placement.hostsFor(store, shard, nHosts, nRep)
      val bytes = hosts.map(h => Files.readAllBytes(
        Paths.get(out, s"host-$h", store, s"shard-$shard.bin")))
      assert(bytes.tail.forall(_.sameElements(bytes.head)),
        s"shard $shard replicas diverge across hosts")
    }

    // 3: the PARENT ingests each shard's primary replica through the
    // shared codec into its own store and serves it via the connector —
    // row-identical to the writer's deterministic input
    BlockStore.dropStore(store)
    (0 until nShards).foreach { shard =>
      val primary = Placement.hostsFor(store, shard, nHosts, nRep).head
      val rows = BlockStore.decodeRows(Files.readAllBytes(
        Paths.get(out, s"host-$primary", store,
          s"shard-$shard.bin")))
      BlockStore.stage(BlockStore.epochKey(store, 0), shard,
        BlockStore.Block(rows.map(_._1).min, rows.map(_._1).max, rows))
    }
    BlockStore.commitEpoch(store, 0, 0 until nShards)
    val got = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", store).load().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = (0 until nShards)
      .flatMap(s => PlacementWriterMain.shardRows(s, rowsPerShard))
      .sortBy(_._1)
    assert(got == want,
      "connector read of cross-JVM blocks diverged from the writer's input")
    BlockStore.dropStore(store)
  }
}
