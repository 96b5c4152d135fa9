package graft

import org.apache.spark.sql.functions._

/** Property-style tests (seeded random inputs): each custom codegen
  * Expression must agree with its composed-builtin reference on arbitrary
  * inputs — the expressions exist for SPEED, never for different
  * semantics. */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val init = { graft.expr.VectorExpressions.register(spark); () }

  test("sorted_intersect_count equals the array_intersect size on random long sets") {
    init
    val rnd = new scala.util.Random(20260812L)
    val cases = Seq.fill(40) {
      def set() = Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 50).distinct.sorted
      (set(), set())
    }
    val rows = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("sorted_intersect_count", col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(3), s"a=${r.getSeq[Long](0)} b=${r.getSeq[Long](1)}")
    }
  }

  test("vec_dot equals the interpreted ordered fold bit-for-bit on random vectors") {
    init
    val rnd = new scala.util.Random(42L)
    val cases = Seq.fill(40) {
      val n = rnd.nextInt(17)
      (Seq.fill(n)((rnd.nextDouble() - 0.5) * 2e3),
        Seq.fill(n)((rnd.nextDouble() - 0.5) * 2e3))
    }
    val rows = cases.toDF("a", "b")
      .select(
        call_function("vec_dot", col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("ref"))
      .collect()
    rows.foreach { r =>
      // bit-identical, not approximately equal: both are strict left folds
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"row $r")
    }
  }

  test("vec_dot null semantics match the fold (ragged and null-element inputs)") {
    init
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),          // ragged -> NULL
      (Seq(1.0, 2.0), Seq(3.0, 4.0))      // clean -> 11.0
    ).toDF("a", "b")
    val out = df.select(call_function("vec_dot", col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 11.0)
  }

  test("RangeRank equals the window formulation on random frames (property)") {
    // the two-pass distributed scan exists to REPLACE the unpartitioned
    // window — on arbitrary data (duplicate sort keys, zero weights,
    // skewed sizes) rank and exclusive prefix sum must match it exactly
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(20260813L)
    (0 until 5).foreach { trial =>
      val n = 50 + rnd.nextInt(200)
      val rows = Seq.tabulate(n) { i =>
        (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(5).toLong) // id, key (ties!), weight
      }
      val df = rows.toDF("id", "key", "w").repartition(7)
      val ranked = operators.RangeRank.withGlobalRank(df, "r", col("key"), col("id"))
      val ran = try ranked.df.select(col("id"), col("r")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally ranked.release()
      val win = Window.orderBy(col("key"), col("id"))
      val ref = df.withColumn("r", row_number().over(win) - 1)
        .select(col("id"), col("r")).collect()
        .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      assert(ran == ref, s"trial $trial: rank diverged from window")

      val summed = operators.RangeRank.withRunningTotal(df, "w", "cum",
        col("key"), col("id"))
      val got = try summed.df.select(col("id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally summed.release()
      val refSum = df.withColumn("cum",
          coalesce(sum(col("w")).over(win.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refSum, s"trial $trial: prefix sum diverged from window")
      assert(summed.total == rows.map(_._3).sum, s"trial $trial: grand total wrong")
    }
  }

  test("WeightedKeyPartitioner holds the LPT bound on random weight histograms (property)") {
    val rnd = new scala.util.Random(77L)
    (0 until 20).foreach { trial =>
      val bins = 2 + rnd.nextInt(15)
      val keys = 1 + rnd.nextInt(60)
      // heavy-tailed weights: exercise both the many-small and the
      // single-dominant regimes
      val ws: Seq[(Any, Long)] = (0 until keys).map { k =>
        (k: Any) -> (1L + (if (rnd.nextInt(4) == 0) rnd.nextInt(10000) else rnd.nextInt(50)).toLong)
      }
      val p = new operators.WeightedKeyPartitioner(bins, ws)
      val loads = ws.groupBy { case (k, _) => p.getPartition(k) }
        .map { case (_, g) => g.map(_._2).sum }
      val total = ws.map(_._2).sum
      // Graham's list-scheduling bound — the COMPUTABLE valid bound:
      // makespan <= total/m + (1 - 1/m)·heaviest. (4/3·max(heaviest,
      // total/m) is NOT valid on arbitrary inputs: four equal weights into
      // three bins has OPT = 2w but 4/3·max(w, 4w/3) = 16w/9 < 2w.)
      val heaviest = ws.map(_._2).max.toDouble
      val bound = total.toDouble / bins + (1.0 - 1.0 / bins) * heaviest
      assert(loads.max <= bound + 1,
        s"trial $trial (bins=$bins keys=$keys): max ${loads.max} above $bound")
      ws.foreach { case (k, _) =>
        val b = p.getPartition(k)
        assert(b >= 0 && b < bins)
      }
    }
  }

  test("Misra-Gries guarantee holds on random streams under random merge trees") {
    // the t14 contract: for ANY input and ANY partition/merge order, every
    // item with true frequency > N/k survives the k-counter summary, and
    // the summary never exceeds k entries. Seeded random streams with
    // Zipf-ish skew, split into random partials, merged in random order —
    // the shapes a real shuffle produces and a single fixture cannot cover.
    val mg = operators.MgAggregator
    val k = operators.TextAnalysis.MgCounters
    val rnd = new scala.util.Random(20260813L)
    (1 to 25).foreach { trial =>
      val vocab = 1 + rnd.nextInt(400)
      val n = 500 + rnd.nextInt(4000)
      // skew: token id ~ floor(vocab * u^3) concentrates mass on low ids
      val stream = Seq.fill(n) {
        val u = rnd.nextDouble()
        s"tok_${(vocab * u * u * u).toInt}"
      }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random partition into 1..12 partials, each reduced sequentially
      val partials = {
        val cuts = stream.grouped(1 + rnd.nextInt(stream.size / 2 + 1)).toSeq
        cuts.map(_.foldLeft(mg.zero)(mg.reduce))
      }
      // random-order pairwise merge tree
      var frontier = rnd.shuffle(partials).toVector
      while (frontier.size > 1) {
        val i = rnd.nextInt(frontier.size - 1)
        val merged = mg.merge(frontier(i), frontier(i + 1))
        frontier = (frontier.take(i) :+ merged) ++ frontier.drop(i + 2)
      }
      val sketch = frontier.head
      assert(sketch.size <= k, s"trial $trial: ${sketch.size} > k=$k entries")
      truth.foreach { case (t, c) =>
        if (c * k > n)
          assert(sketch.contains(t),
            s"trial $trial: $t freq=$c > N/k=${n / k} missing from sketch")
      }
    }
  }
}
