package graft

import graft.operators.Relational
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q1 pricing summary: groups are (returnflag, linestatus) and counts add up") {
    val df = Relational.q1PricingSummary(spark, sf).collect()
    assert(df.nonEmpty)
    val total = df.map(_.getAs[Long]("count_order")).sum
    val liCount = Catalog.table(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= Sql.ts("1998-09-02")).count()
    assert(total == liCount)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("join edge cases: empty side, null keys, duplicate keys") {
    val left = Seq((1L, "a"), (2L, "b"), (2L, "b2")).toDF("k", "v")
    val rightEmpty = Seq.empty[(Long, String)].toDF("k", "w")
    assert(left.join(rightEmpty, Seq("k")).count() == 0)
    assert(left.join(rightEmpty, Seq("k"), "left_anti").count() == 3)

    val withNull = Seq((Some(1L), "a"), (None, "n")).toDF("k", "v")
    val right = Seq((Some(1L), "x"), (None, "y")).toDF("k", "w")
    // SQL null semantics: null keys never match
    assert(withNull.join(right, Seq("k")).count() == 1)

    // duplicate keys: |A ⋈ B| on key k = cntA(k) * cntB(k)
    val dupRight = Seq((2L, "p"), (2L, "q")).toDF("k", "w")
    assert(left.join(dupRight, Seq("k")).count() == 4)
  }

  test("set ops match Set algebra on generated data") {
    val a = (1 to 50).map(_.toLong)
    val b = (26 to 75).map(_.toLong)
    val da = a.toDF("x"); val db = b.toDF("x")
    assert(da.union(db).distinct.count() == (a.toSet ++ b.toSet).size)
    assert(da.intersect(db).count() == (a.toSet & b.toSet).size)
    assert(da.except(db).count() == (a.toSet -- b.toSet).size)
  }

  test("topk equals sort-take") {
    val top = Relational.q10TopK(spark, sf).collect().map(_.getAs[Double]("l_extendedprice"))
    val all = Catalog.table(spark, sf, "lineitem")
      .select("l_extendedprice").as[Double].collect().sorted(Ordering[Double].reverse).take(100)
    assert(top.sorted.sameElements(all.sorted))
  }

  test("salted aggregation equals plain aggregation") {
    val salted = Relational.q20SaltedAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = Catalog.table(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(Sql.dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
