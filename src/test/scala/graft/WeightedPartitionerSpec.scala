package graft

import graft.operators.WeightedKeyPartitioner

/** [[graft.operators.WeightedKeyPartitioner]] — the LPT half of the
  * reference's heuristic pre-scheduler (`sim/sim.py:223-263`), asserted on
  * an engineered skewed key histogram: balance beats hash partitioning,
  * aggregation results are partitioner-invariant, unknown keys degrade to
  * hash. */
class WeightedPartitionerSpec extends SparkSpec {

  // zipf-ish weights: key 0 is ~37% of all rows — a hash partition holding
  // it can never be balanced, but key-granular LPT can pack around it
  private val weights: Seq[(Any, Long)] =
    (0 until 64).map(k => (k: Any) -> (2000L / (k + 1)))
  private val numParts = 8

  private def loads(p: WeightedKeyPartitioner): Map[Int, Long] =
    weights.groupBy { case (k, _) => p.getPartition(k) }
      .map { case (b, ks) => b -> ks.map(_._2).sum }

  test("LPT packing stays within 4/3 of ideal where hash partitioning cannot") {
    val p = new WeightedKeyPartitioner(numParts, weights)
    val total = weights.map(_._2).sum
    val ideal = total.toDouble / numParts
    val lptMax = loads(p).values.max
    // the biggest single key exceeds the ideal bin: perfect balance is
    // impossible, but LPT must stay within max(heaviest key, 4/3 ideal)
    val bound = math.max(weights.map(_._2).max.toDouble, ideal * 4.0 / 3.0)
    assert(lptMax <= bound + 1, s"LPT max load $lptMax above bound $bound")
    // hash baseline: whichever partition holds key 0 carries its full
    // weight plus whatever else hashes there — strictly worse than LPT here
    val hashLoads = weights.groupBy { case (k, _) =>
      val h = k.hashCode % numParts; if (h < 0) h + numParts else h
    }.map { case (_, ks) => ks.map(_._2).sum }
    assert(lptMax < hashLoads.max,
      s"LPT ($lptMax) should beat hash (${hashLoads.max}) on this skew")
  }

  test("every partition id is in range and assignment is deterministic") {
    val p1 = new WeightedKeyPartitioner(numParts, weights)
    val p2 = new WeightedKeyPartitioner(numParts, weights)
    weights.foreach { case (k, _) =>
      val b = p1.getPartition(k)
      assert(b >= 0 && b < numParts)
      assert(b == p2.getPartition(k), s"nondeterministic assignment for $k")
    }
    assert(p1 == p2)
  }

  test("aggregation over the weighted partitioner matches the hash result") {
    val sc = spark.sparkContext
    val rows = sc.parallelize(
      (0 until 64).flatMap(k => Seq.fill((2000 / (k + 1)).toInt)(k -> 1L)), 16)
    val viaWeighted = rows
      .reduceByKey(new WeightedKeyPartitioner(numParts, weights), _ + _)
      .collect().toMap
    val viaHash = rows.reduceByKey(_ + _).collect().toMap
    assert(viaWeighted == viaHash, "partitioning strategy changed the aggregate")
  }

  test("locality swap honors preferences but never worsens max bin beyond 1.1x") {
    val lpt = new WeightedKeyPartitioner(numParts, weights)
    val lptMax = loads(lpt).values.max
    // full-locality preferences (frac 1.0 → acceptance probability 1) on a
    // scattered preferred-bin pattern, so plenty of keys want to move
    val locality = weights.map { case (k, _) =>
      (k, (k.asInstanceOf[Int] * 3) % numParts, 1.0) }
    val p = new WeightedKeyPartitioner(numParts, weights, locality)
    val maxAfter = loads(p).values.max
    assert(maxAfter <= (1.1 * lptMax).toLong,
      s"swap worsened max bin beyond 1.1x LPT: $maxAfter vs $lptMax")
    // the pass really moves keys onto their preferred bins (a no-op pass
    // would vacuously satisfy the bound)
    val moved = weights.count { case (k, _) =>
      p.getPartition(k) != lpt.getPartition(k) &&
        p.getPartition(k) == (k.asInstanceOf[Int] * 3) % numParts }
    assert(moved > 0, "no locality swap was ever accepted")
    // deterministic: same weights + locality + seed → identical partitioner
    assert(p == new WeightedKeyPartitioner(numParts, weights, locality))
    weights.foreach { case (k, _) =>
      val b = p.getPartition(k)
      assert(b >= 0 && b < numParts)
    }
  }

  test("balance cap holds on BOTH swap ends under chained adversarial swaps") {
    // every key prefers bin 0 with frac 1.0: each accepted swap pushes its
    // move-back set into a different origin bin (net +0.1w there), so
    // chained swaps stress the ORIGIN side of the cap — the side the first
    // fixture never pressured. The 1.1x-of-LPT invariant must hold for
    // every bin by construction, not just the fixture's max.
    val lptMax = loads(new WeightedKeyPartitioner(numParts, weights)).values.max
    val locality = weights.map { case (k, _) => (k, 0, 1.0) }
    val p = new WeightedKeyPartitioner(numParts, weights, locality)
    loads(p).foreach { case (bin, load) =>
      assert(load <= (1.1 * lptMax).toLong,
        s"bin $bin at $load exceeds 1.1x LPT max $lptMax")
    }
  }

  test("uniform-baseline locality fractions never trigger a swap") {
    // frac = 1/numPartitions normalizes to acceptance 0 (the reference's
    // (prob - 1/m)/(1 - 1/m)) — assignment must equal plain LPT exactly
    val locality = weights.map { case (k, _) =>
      (k, (k.asInstanceOf[Int] * 3) % numParts, 1.0 / numParts) }
    val p = new WeightedKeyPartitioner(numParts, weights, locality)
    val lpt = new WeightedKeyPartitioner(numParts, weights)
    weights.foreach { case (k, _) =>
      assert(p.getPartition(k) == lpt.getPartition(k))
    }
  }

  test("w1: real lineitem histogram packs within the 4/3 LPT bound, swap included") {
    val (hist, p) = WeightedKeyPartitioner.partitionerFor(spark, sf)
    val total = hist.map(_._2).sum
    val heaviest = hist.map(_._2).max
    // the collapsed key really is the skew the query advertises: it alone
    // exceeds the ideal bin, so hash partitioning cannot balance this
    val ideal = total.toDouble / operators.WeightedKeyPartitioner.NumBins
    assert(heaviest > ideal, s"fixture lost its skew: $heaviest <= $ideal")
    val binLoads = hist.groupBy { case (k, _) => p.getPartition(k) }
      .map { case (b, ks) => b -> ks.map(_._2).sum }
    // LPT bound, with the locality pass's documented 1.1x allowance on top
    val bound = math.max(heaviest.toDouble, ideal * 4.0 / 3.0) * 1.1
    assert(binLoads.values.max <= bound + 1,
      s"real-histogram max bin ${binLoads.values.max} above $bound")
    // and the registered query's result is partitioner-invariant: it must
    // equal the plain Catalyst groupBy on the same derived key
    import org.apache.spark.sql.functions._
    val viaQuery = operators.WeightedKeyPartitioner.weightedAgg(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaGroupBy = Catalog.table(spark, sf, "lineitem")
      .groupBy(when(col("l_suppkey") < operators.WeightedKeyPartitioner.CollapseBelow, 0L)
        .otherwise(col("l_suppkey")).as("skey"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_partkey")).as("sum_partkey"))
      .orderBy("skey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaQuery.nonEmpty && viaQuery == viaGroupBy,
      "weighted-partitioner aggregation diverged from the plain groupBy")
  }

  test("keys outside the weight map fall back to hash range") {
    val p = new WeightedKeyPartitioner(numParts, weights)
    (1000 until 1100).foreach { k =>
      val b = p.getPartition(k)
      assert(b >= 0 && b < numParts, s"fallback out of range for $k -> $b")
    }
    assert(p.getPartition(null) == 0)
  }
}
