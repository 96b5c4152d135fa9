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
}
