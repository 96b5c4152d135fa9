package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The round-11 codegen Expressions claim BIT-IDENTITY with the
  * interpreted higher-order-function chains they replaced — a claim six
  * oracles now lean on (sim5/7/8/10/11/13/15/16 all quantize or encode
  * through them). This spec pins it by evaluating BOTH formulations over
  * randomized-plus-adversarial vectors in one job and demanding zero
  * mismatches, so any future drift in IEEE operation order fails here
  * before it fails a cross-engine hash compare. */
class ExprEquivalenceSpec extends SparkSpec {

  private def vectors(n: Int, dims: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    val random = Seq.fill(n)(Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
    val crafted = Seq(
      Seq.fill(dims)(1.0),                        // all-equal (max everywhere)
      Seq.fill(dims)(-1.0),                       // negative max
      Seq.tabulate(dims)(i => if (i == dims - 1) 1e-3 else 1e-9), // max last
      Seq.tabulate(dims)(i => (i - dims / 2) / 127.0), // grid-boundary halves
      Seq.fill(dims)(1e-300),                     // tiny magnitudes
      Seq.tabulate(dims)(i => if (i % 2 == 0) 0.5 else -0.5))
    random ++ crafted
  }

  test("vec_quant127 ≡ interpreted floor(x*127/max|x| + 0.5) HOF chain") {
    graft.expr.VectorExpressions.register(spark)
    import spark.implicits._
    val df = vectors(2000, 64).map(Tuple1(_)).toDF("e")
    val m = array_max(transform(col("e"), x => abs(x)))
    val legacy = transform(col("e"), x => floor(x * lit(127.0) / m + lit(0.5)))
    val mismatches = df
      .select(legacy.as("a"), call_function("vec_quant127", col("e")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(mismatches == 0, s"$mismatches vectors quantized differently")
  }

  test("hist_l1 ≡ inline Σ|a_i−b_i| + remainder-bucket term, and bounds levenshtein") {
    graft.expr.VectorExpressions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = "abcdefghij"
    def randStr(n: Int): String =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    // pairs: random, near-identical (few edits), identical, disjoint-ish
    val base = Seq.fill(200)(randStr(30 + rnd.nextInt(120)))
    val pairs = base.map { s =>
      val t = rnd.nextInt(4) match {
        case 0 => randStr(s.length)
        case 1 => s.updated(rnd.nextInt(s.length), 'z').toString
        case 2 => s
        case _ => s.drop(3) + "kk"
      }
      (s, t)
    }
    val tracked = "abcde".toSeq // deliberately PARTIAL: remainder is live
    def hist(c: org.apache.spark.sql.Column) =
      array(length(c) +: tracked.map(ch =>
        length(c) - length(replace(c, lit(ch.toString), lit("")))): _*)
    val df = pairs.toDF("s", "t")
      .select(col("s"), col("t"), hist(col("s")).as("ha"), hist(col("t")).as("hb"))
    // 1) expression ≡ the inline formulation it compresses
    val inline = (tracked.indices.map(i =>
      abs(element_at(col("ha"), i + 2) - element_at(col("hb"), i + 2))) :+
      abs((element_at(col("ha"), 1) - tracked.indices.map(i =>
          element_at(col("ha"), i + 2)).reduce(_ + _)) -
        (element_at(col("hb"), 1) - tracked.indices.map(i =>
          element_at(col("hb"), i + 2)).reduce(_ + _))))
      .reduce(_ + _)
    val l1 = call_function("hist_l1", col("ha"), col("hb"))
    assert(df.select(inline.as("a"), l1.as("b"))
      .filter(not(col("a") <=> col("b"))).count() == 0,
      "hist_l1 disagrees with the inline L1 formulation")
    // 2) the counting bound itself: levenshtein ≥ ceil(hist_l1 / 2) — the
    // exactness the dd15 prune rests on
    val violations = df
      .select(l1.as("l1"), levenshtein(col("s"), col("t")).as("ed"))
      .filter(col("ed") * 2 < col("l1")).count()
    assert(violations == 0, s"$violations pairs violate 2·edit ≥ hist_l1")
  }

  test("pq_nearest_code ≡ interpreted array_sort struct argmin (ties to low k)") {
    graft.expr.VectorExpressions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cwRaw = Seq.fill(8)(Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    // duplicate codeword pair: forces exact-tie distances → lowest k wins
    val codewords = cwRaw.updated(5, cwRaw(2))
    val cb = typedlit(codewords)
    val df = vectors(2000, 16).map(Tuple1(_)).toDF("e")
    // the pre-round-11 formulation, verbatim
    val entries = (0 until 8).map { k =>
      val cw = element_at(cb, k + 1)
      val d2 = aggregate(
        zip_with(col("e"), cw, (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x)
      struct(d2.as("d"), lit(k).as("k"))
    }
    val legacy = array_sort(array(entries: _*)).getItem(0).getField("k")
    val mismatches = df
      .select(legacy.as("a"),
        call_function("pq_nearest_code", col("e"), cb).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(mismatches == 0, s"$mismatches subvectors coded differently")
    // the planted duplicate really is chosen via the tie-break path for
    // its own exact vector (distance 0 to both k=2 and k=5 → k=2)
    val tie = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(codewords(5))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("e",
            org.apache.spark.sql.types.ArrayType(DoubleType), false))))
      .select(call_function("pq_nearest_code", col("e"), cb).as("k"))
      .head().getInt(0)
    assert(tie == 2, s"exact tie must resolve to the LOWEST index, got $tie")
  }

  test("rep_stats ≡ interpreted explode/hash/agg chain (r19 t17 kernel)") {
    graft.expr.VectorExpressions.register(spark)
    import graft.functions.Text
    import spark.implicits._
    // real corpus token arrays + adversarial synthetics: all-same doc
    // (max multiplicity = n), alternating pair (bigram max spans runs),
    // exactly two tokens, long tail of uniques with one planted triple
    val synthetic = Seq(
      Seq.fill(40)("x"),
      (0 until 40).map(i => if (i % 2 == 0) "a" else "b"),
      Seq("p", "q"),
      ((0 until 50).map(i => s"u$i") ++ Seq("t", "t", "t")))
      .map(s => Tuple1(s)).toDF("_toks")
    val corpus = Text.withTokens(
        Catalog.table(spark, "/root/testdata/sf0.01", "documents"))
      .select(col("_toks"))
    val df = corpus.unionByName(synthetic)
      .filter(size(col("_toks")) >= 2)
    val toks = col("_toks")
    val withId = df.withColumn("id", monotonically_increasing_id())
      .persist()
    try {
      // the pre-r19 formulation, verbatim: explode → sharedHash →
      // groupBy(id, h) → max count per id; adj via element_at equality
      def topLegacy(occ: org.apache.spark.sql.DataFrame, out: String) =
        occ.groupBy(col("id"), col("h")).agg(count(lit(1)).as("c"))
          .groupBy(col("id")).agg(max(col("c")).as(out))
      val tokTop = topLegacy(
        withId.select(col("id"), explode(toks).as("tok"))
          .select(col("id"), Text.sharedHash(col("tok")).as("h")), "lt")
      val bgs = transform(sequence(lit(1), size(toks) - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
      val bgTop = topLegacy(
        withId.select(col("id"), explode(bgs).as("bg"))
          .select(col("id"), Text.sharedHash(col("bg")).as("h")), "lb")
      val adjLegacy = size(filter(sequence(lit(1), size(toks) - 1), i =>
        element_at(toks, i) === element_at(toks, i + 1))).cast("long")
      val st = call_function("rep_stats", toks)
      val bad = withId.select(col("id"), adjLegacy.as("la"),
          st.getField("top_tok").as("kt"), st.getField("top_bg").as("kb"),
          st.getField("adj").as("ka"))
        .join(tokTop, Seq("id")).join(bgTop, Seq("id"))
        .filter(not(col("lt") <=> col("kt")) ||
          not(col("lb") <=> col("kb")) || not(col("la") <=> col("ka")))
        .count()
      assert(bad == 0, s"$bad docs disagree between rep_stats and the chain")
    } finally withId.unpersist(): Unit
  }
}
