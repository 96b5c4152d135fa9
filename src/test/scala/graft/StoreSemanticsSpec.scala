package graft

import graft.sources.BlockStore

/** Property-style tests (seeded random sequences) over the block store's
  * TRANSACTIONAL semantics — the mechanisms the connector queries ride:
  * copy-on-write DELETE, commit-recorded version history, and the
  * streaming epoch watermark. Each property replays a random interaction
  * sequence against a trivial in-memory model; divergence anywhere fails
  * with the sequence that produced it. */
class StoreSemanticsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260814L)

  private def mkRows(lo: Long, n: Int): Array[BlockStore.DocRow] =
    Array.tabulate(n)(i => (lo + i, s"t${lo + i}",
      s"l${(lo + i) % 3}", s"s${(lo + i) % 4}", (lo + i) % 11))

  private def stageCommit(name: String, epoch: Long,
      blocks: Seq[Array[BlockStore.DocRow]]): Unit = {
    blocks.zipWithIndex.foreach { case (rs, pid) =>
      BlockStore.stage(BlockStore.epochKey(name, epoch), pid,
        BlockStore.Block(rs.map(_._1).min, rs.map(_._1).max, rs))
    }
    BlockStore.commitEpoch(name, epoch, blocks.indices)
  }

  private def visible(name: String): Seq[BlockStore.DocRow] =
    BlockStore.blocks(name).flatMap(_.rows)

  test("deleteWhere == filterNot for random predicates over random stores (property)") {
    (0 until 25).foreach { trial =>
      val name = s"prop-del-$trial"
      BlockStore.dropStore(name)
      var model = Vector.empty[BlockStore.DocRow]
      (0 until 1 + rnd.nextInt(4)).foreach { e =>
        val rows = mkRows(rnd.nextInt(1000).toLong, 1 + rnd.nextInt(40))
        stageCommit(name, e.toLong, Seq(rows))
        model ++= rows
      }
      // random predicate family mirroring the DELETE translator's surface
      val (mayMatch, rowPred, desc):
          (BlockStore.Block => Boolean, BlockStore.DocRow => Boolean, String) =
        rnd.nextInt(3) match {
          case 0 =>
            val l = s"l${rnd.nextInt(3)}"
            (b => b.langs.contains(l), r => r._3 == l, s"lang=$l")
          case 1 =>
            val cut = rnd.nextInt(1100).toLong
            (b => b.maxId >= cut, r => r._1 >= cut, s"id>=$cut")
          case _ =>
            val m = 2 + rnd.nextInt(5)
            (_ => true, r => r._1 % m == 0, s"id%$m==0")
        }
      val deleted = BlockStore.deleteWhere(name, mayMatch, rowPred)
      val want = model.filterNot(rowPred)
      assert(deleted == model.size - want.size,
        s"trial $trial ($desc): deleted-count diverged")
      assert(visible(name).sortBy(_._1) == want.sortBy(_._1).toSeq,
        s"trial $trial ($desc): surviving rows diverged from filterNot")
      // stats stay sound after the rewrite: every surviving block's
      // min/max bound its rows
      BlockStore.blocks(name).foreach { b =>
        assert(b.rows.forall(r => r._1 >= b.minId && r._1 <= b.maxId),
          s"trial $trial: rewritten block stats do not bound its rows")
      }
      BlockStore.dropStore(name)
    }
  }

  test("version history reproduces every commit state; replays never fork it (property)") {
    (0 until 15).foreach { trial =>
      val name = s"prop-tt-$trial"
      BlockStore.dropStore(name)
      var states = Vector.empty[Vector[BlockStore.DocRow]]
      var model = Vector.empty[BlockStore.DocRow]
      var epoch = 0L
      (0 until 2 + rnd.nextInt(5)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 | 1 => // streaming epoch append (occasionally REPLAYED)
            val rows = mkRows(rnd.nextInt(1000).toLong, 1 + rnd.nextInt(20))
            stageCommit(name, epoch, Seq(rows))
            model ++= rows
            states :+= model
            if (rnd.nextBoolean()) { // replay: must not fork history
              stageCommit(name, epoch, Seq(rows))
            }
            epoch += 1
          case _ if BlockStore.currentVersion(name) > 0 => // delete commit
            // (a delete against a never-committed store records nothing —
            // there is no state transition to version)
            val m = 2 + rnd.nextInt(4)
            BlockStore.deleteWhere(name, _ => true, _._1 % m == 0): Unit
            model = model.filterNot(_._1 % m == 0)
            states :+= model
          case _ => ()
        }
      }
      assert(BlockStore.currentVersion(name) == states.size,
        s"trial $trial: replays or commits miscounted versions")
      states.zipWithIndex.foreach { case (want, i) =>
        val snap = spark.read.format("graft.sources.BlockStoreSource")
          .option("store", name).option("versionAsOf", (i + 1).toString)
          .load().collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
        assert(snap == want.sortBy(_._1).toSeq,
          s"trial $trial: version ${i + 1} does not reproduce its commit state")
      }
      BlockStore.dropStore(name)
    }
  }

  test("vacuum/versionAsOf interleaved with commits/deletes/replays: " +
    "fenced retired reads, byte-identical survivors (property)") {
    (0 until 15).foreach { trial =>
      val name = s"prop-vac-$trial"
      BlockStore.dropStore(name)
      var states = Vector.empty[Vector[BlockStore.DocRow]]
      var model = Vector.empty[BlockStore.DocRow]
      var epoch = 0L
      var retiredBelow = 0 // versions 1..retiredBelow are vacuumed

      def readVersion(v: Int): Seq[BlockStore.DocRow] =
        spark.read.format("graft.sources.BlockStoreSource")
          .option("store", name).option("versionAsOf", v.toString)
          .load().collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).sortBy(_._1).toSeq

      def checkVersion(v: Int): Unit =
        if (v <= retiredBelow) {
          val ex = intercept[Exception] { readVersion(v) }
          assert(ex.getMessage.contains("vacuum"),
            s"trial $trial: retired v$v must fail naming the vacuum, " +
              s"got: ${ex.getMessage}")
        } else assert(readVersion(v) == states(v - 1).sortBy(_._1).toSeq,
          s"trial $trial: surviving v$v not byte-identical to its commit")

      (0 until 3 + rnd.nextInt(6)).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 => // epoch append, occasionally replayed
            val rows = mkRows(rnd.nextInt(1000).toLong, 1 + rnd.nextInt(20))
            stageCommit(name, epoch, Seq(rows))
            model ++= rows
            states :+= model
            if (rnd.nextBoolean()) stageCommit(name, epoch, Seq(rows))
            epoch += 1
          case 2 if BlockStore.currentVersion(name) > 0 => // delete commit
            val m = 2 + rnd.nextInt(4)
            BlockStore.deleteWhere(name, _ => true, _._1 % m == 0): Unit
            model = model.filterNot(_._1 % m == 0)
            states :+= model
          case 3 if BlockStore.currentVersion(name) > 0 => // vacuum
            val cur = BlockStore.currentVersion(name)
            val keep = 1 + rnd.nextInt(cur)
            BlockStore.vacuum(name, keep): Unit
            retiredBelow = math.max(retiredBelow, cur - keep)
          case 4 if BlockStore.currentVersion(name) > 0 => // random read
            checkVersion(1 + rnd.nextInt(BlockStore.currentVersion(name)))
          case _ => ()
        }
      }
      // closing sweep: EVERY version is either loudly fenced or
      // byte-identical to the state its commit produced
      (1 to BlockStore.currentVersion(name)).foreach(checkVersion)
      BlockStore.dropStore(name)
    }
  }

  test("vacuum retires old versions: refs released, reads fenced, tail intact") {
    val name = "vacuum-spec-store"
    BlockStore.dropStore(name)
    (0 until 5).foreach { e =>
      stageCommit(name, e.toLong, Seq(mkRows(e * 100L, 10)))
    }
    assert(BlockStore.currentVersion(name) == 5)
    val retired = BlockStore.vacuum(name, keepLast = 2)
    assert(retired == 3, s"expected versions 1-3 retired, got $retired")
    // vacuum is idempotent
    assert(BlockStore.vacuum(name, keepLast = 2) == 0)
    // retired versions fail LOUDLY; surviving tail still reproduces
    intercept[Exception] {
      spark.read.format("graft.sources.BlockStoreSource")
        .option("store", name).option("versionAsOf", "2").load().count()
    }
    val v4 = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", name).option("versionAsOf", "4").load().count()
    assert(v4 == 40, "surviving version must reproduce its commit state")
    // version numbers keep their absolute meaning after vacuum
    assert(BlockStore.currentVersion(name) == 5)
    BlockStore.dropStore(name)
  }
}
