package graft

import graft.sources.Placement
import org.scalatest.funsuite.AnyFunSuite

/** The store-level replication CONTRACT (reference:
  * `scache.shuffle.replication` backups, `MapOutputTracker.scala:193-217`)
  * as a pure-function spec — local[32] cannot demonstrate surviving a
  * node loss, so what is pinned is exactly what a multi-node deployment
  * would rely on: determinism, distinctness, and balance. */
class PlacementSpec extends AnyFunSuite {

  private val Hosts = 16
  private val Shards = 1024
  private val Replicas = 2

  private def all(store: String): Seq[Seq[Int]] =
    (0 until Shards).map(Placement.hostsFor(store, _, Hosts, Replicas))

  test("placement is a pure function: identical across calls and callers") {
    assert(all("storeA") == all("storeA"),
      "same (store, shard, cluster) must place identically every time")
    assert(all("storeA") != all("storeB"),
      "backup rotation should depend on the store (spread, not lockstep)")
  }

  test("primary + backups are distinct hosts, correct count, in range") {
    all("storeA").foreach { hs =>
      assert(hs.length == 1 + Replicas, s"expected 1+$Replicas hosts: $hs")
      assert(hs.distinct.length == hs.length, s"duplicate host in $hs")
      assert(hs.forall(h => h >= 0 && h < Hosts), s"host out of range: $hs")
    }
  }

  test("replication degrades gracefully on tiny clusters") {
    // nReplicas capped at nHosts-1; single host → primary only
    assert(Placement.hostsFor("s", 7, 1, 3) == Seq(0))
    val two = Placement.hostsFor("s", 7, 2, 3)
    assert(two.length == 2 && two.distinct.length == 2)
  }

  test("primaries are exactly round-robin balanced; backup load is spread") {
    val placements = all("storeA")
    val primaryLoad = placements.map(_.head).groupBy(identity).map(_._2.size)
    assert(primaryLoad.max == primaryLoad.min,
      s"round-robin primaries must balance exactly, got $primaryLoad")
    val backupLoad = (0 until Hosts).map { h =>
      placements.count(p => p.tail.contains(h))
    }
    val mean = Shards.toDouble * Replicas / Hosts
    assert(backupLoad.forall(l => l > mean * 0.5 && l < mean * 1.5),
      s"backup load skewed beyond ±50% of mean $mean: $backupLoad")
  }
}
