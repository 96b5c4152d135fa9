package graft.operators

import org.apache.spark.Partitioner

/** Size-aware reduce partitioner — the Spark-native form of the reference's
  * heuristic shuffle pre-scheduler (reference `sim/sim.py:223-263`,
  * `schedule_with_pre`: a largest-first min-heap assignment of reduce
  * tasks to hosts from predicted reduce sizes, followed by a probabilistic
  * locality swap; predicted sizes come from the map-output size vectors the
  * reference tracks in `MapOutputTracker.scala`).
  *
  * The mapping, piece by piece:
  *   - "predicted reduce size per task" → per-KEY weights, obtainable in
  *     Spark from a cheap pre-aggregation (`groupBy(key).count`) or any
  *     prior statistics source;
  *   - "largest-first into the least-loaded host" → greedy LPT bin-packing
  *     of weighted keys into `numPartitions` bins, done ONCE driver-side
  *     over the (small) distinct-key weight list — never over rows;
  *   - "locality swap" → not re-implemented: executor-side locality is the
  *     task scheduler's job in Spark (locality wait / preferred locations),
  *     and runtime re-balancing of what this partitioner cannot predict is
  *     AQE's (see SkewJoinSpec for that half).
  *
  * Greedy LPT guarantees max-load ≤ (4/3 − 1/(3m)) × optimum for m bins —
  * so a key-weight skew that would pin a hash partition at ~p× the mean
  * lands within a constant of balanced. Keys absent from the weight map
  * (new data since the stats pass) fall back to hash partitioning, i.e.
  * the partitioner degrades to Spark's default rather than failing.
  *
  * When to use at 100 TB: a repeated heavy aggregation whose key
  * histogram is known (daily pipeline over stable keys) and whose skew is
  * too coarse for AQE's post-shuffle split (e.g. one key = 40% of rows in
  * a `reduceByKey` where splitting the key would break semantics).
  */
class WeightedKeyPartitioner(
    override val numPartitions: Int,
    weights: Seq[(Any, Long)]) extends Partitioner {
  require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")

  // deterministic LPT: sort by (weight desc, key-hash) so equal weights
  // break ties stably; min-heap of (load, bin) keyed by load then bin id
  private val assignment: Map[Any, Int] = {
    val heap = scala.collection.mutable.PriorityQueue
      .empty[(Long, Int)](Ordering.by[(Long, Int), (Long, Int)](x => (-x._1, -x._2)))
    (0 until numPartitions).foreach(b => heap.enqueue((0L, b)))
    val sorted = weights.sortBy { case (k, w) => (-w, k.hashCode) }
    val m = Map.newBuilder[Any, Int]
    sorted.foreach { case (k, w) =>
      val (load, bin) = heap.dequeue()
      m += (k -> bin)
      heap.enqueue((load + w, bin))
    }
    m.result()
  }

  private def fallback(key: Any): Int = {
    val h = if (key == null) 0 else key.hashCode % numPartitions
    if (h < 0) h + numPartitions else h
  }

  override def getPartition(key: Any): Int =
    assignment.getOrElse(key, fallback(key))

  override def equals(other: Any): Boolean = other match {
    case p: WeightedKeyPartitioner =>
      p.numPartitions == numPartitions && p.assignment == assignment
    case _ => false
  }
  override def hashCode(): Int = 31 * numPartitions + assignment.hashCode()
}
