package graft

import graft.operators.Similarity
import graft.sources.BlockStore

/** sim15's LANDED-INDEX serving contract (r10 verdict ask #4):
  *
  *   1. identity — the serve is row-identical to sim13's build-and-query
  *      path (same quantizer, cell argmin, ADC) so landing loses nothing;
  *   2. no rebuild — a serve after landing runs NO corpus-sized job: the
  *      only blocks it opens are the landed stores', counted with the
  *      x32/x35 reader-count discipline;
  *   3. cell pruning — a single-probe serve opens a strict subset of the
  *      index store's blocks (the dictionary stats carry the cell id, and
  *      the probed-cells filter skips the rest).
  */
class LandedIndexSpec extends SparkSpec {

  test("landed serve is row-identical to the build-and-query path") {
    val served = Similarity.landedAnnServe(spark, sf, 10)
      .collect().map(_.toSeq.toVector).toVector
    val built = SparkEntry.queries("sim13_ivf_pq")(spark, sf)
      .collect().map(_.toSeq.toVector).toVector
    assert(served == built,
      "serving from the landed index diverged from the rebuilt index")
  }

  test("incremental append reconstructs the full index exactly (sim16)") {
    val (idxStore, _) = Similarity.ensureAppendedIndex(spark, sf)
    // the two-generation store covers the whole corpus: every non-zero
    // vector has exactly one landed code row
    val landed = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", idxStore).load()
    val want = Catalog.table(spark, sf, "embeddings")
      .filter(org.apache.spark.sql.functions.expr(
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x)," +
          " 0D, (a, x) -> a + x)) > 0")).count()
    assert(landed.count() == want, "appended index lost or duplicated vectors")
    assert(landed.select("doc_id").distinct().count() == want,
      "appended index carries duplicate vec_ids")
    // serve over initial+appended generations ≡ the full rebuild
    val served = SparkEntry.queries("sim16_ann_append")(spark, sf)
      .collect().map(_.toSeq.toVector).toVector
    val built = SparkEntry.queries("sim13_ivf_pq")(spark, sf)
      .collect().map(_.toSeq.toVector).toVector
    assert(served == built,
      "O(batch) append drifted from the full-corpus build")
  }

  test("serve opens landed blocks only, cell-pruned (reader counts)") {
    val (idxStore, metaStore) = Similarity.ensureLandedIndex(spark, sf)
    val idxBlocks = BlockStore.blockCount(idxStore)
    val metaBlocks = BlockStore.blockCount(metaStore)
    assert(idxBlocks > 1, "index fixture must span multiple blocks")

    // single-probe serve: NProbe+1 of the ~|cells| cells → a strict
    // subset of the index blocks must open. Everything the serve reads
    // beyond the landed stores is the bounded probe row (parquet, not a
    // block store), so readersOpened deltas are entirely landed-block IO.
    val before = BlockStore.readersOpened.get()
    val rows = Similarity.landedAnnServe(spark, sf, 1).collect()
    val opened = BlockStore.readersOpened.get() - before
    assert(rows.nonEmpty, "single-probe serve returned nothing")
    assert(opened <= metaBlocks + idxBlocks,
      s"serve opened $opened blocks > landed total ${metaBlocks + idxBlocks}")
    assert(opened - metaBlocks < idxBlocks,
      s"cell pruning skipped nothing: ${opened - metaBlocks} of $idxBlocks " +
        "index blocks opened for a single probe")
  }

  test("sim19 range search: exact refine accepts exactly the candidates over tau") {
    import org.apache.spark.sql.functions._
    val got = Similarity.landedRangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "range search must return neighbors at this SF")
    // every emitted cosine clears the threshold (after 6-decimal rounding
    // the boundary can only move by < 5e-7)
    got.foreach { case (q, n, c) =>
      assert(c >= Similarity.RangeTau - 5e-7, s"pair ($q,$n) below tau: $c")
    }
    // range output agrees with the served top-k wherever both speak: any
    // served rank-1..k neighbor with cos_sim >= tau must be in the range
    // result with the SAME rounded cosine (shared quantizer + refine)
    val topk = Similarity.landedAnnServe(spark, sf, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotSet = got.map(t => (t._1, t._2)).toSet
    val exact = SparkEntry.queries("sim11_ivf_multiprobe")(spark, sf).collect()
      .filter(r => r.getDouble(3) >= Similarity.RangeTau)
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    exact.foreach { case (pair, cos) =>
      assert(gotSet.contains(pair),
        s"exact-rescored candidate $pair (cos $cos) missing from range result")
    }
    assert(topk.nonEmpty && exact.nonEmpty)
  }

  test("sim21 filtered search: every neighbor satisfies the predicate, k filled") {
    val rows = Similarity.landedFilteredTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 30, s"10 probes x k=3 expected, got ${rows.length}")
    rows.foreach { case (q, n, _, _) =>
      assert(n % 2 == 0, s"probe $q: neighbor $n violates the candidate filter")
    }
    // pre-filtering keeps k FILLED: ranks are contiguous 1..3 per probe
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L), s"probe $q ranks")
    }
    // filtered result is consistent with the unfiltered range search where
    // both speak: an even-id pair reported by sim19 with the same probe
    // must carry the identical rounded cosine here if ranked
    val range = Similarity.landedRangeSearch(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    rows.foreach { case (q, n, _, c) =>
      range.get((q, n)).foreach(rc => assert(rc == c,
        s"($q,$n): filtered cosine $c != range cosine $rc"))
    }
  }

  test("sim22 compaction: serve identical to tombstoned serve, tombstones gone") {
    val compacted = SparkEntry.queries("sim22_index_compact")(spark, sf)
      .collect().map(_.toSeq.toVector).toVector
    val tombstoned = SparkEntry.queries("sim18_index_delete")(spark, sf)
      .collect().map(_.toSeq.toVector).toVector
    assert(compacted == tombstoned,
      "compacted serve diverged from the tombstoned serve")
    // the compacted store physically contains no deleted id
    val (cIdx, _) = Similarity.ensureCompactedIndex(spark, sf)
    val (_, _, tomb) = Similarity.ensureTombstonedIndex(spark, sf)
    def ids(n: String) = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", n).load().select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = ids(cIdx).intersect(ids(tomb))
    assert(overlap.isEmpty, s"compacted store still holds deleted ids: $overlap")
  }
}
