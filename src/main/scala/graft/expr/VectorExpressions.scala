package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd sequential dot product of two double arrays.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)` — a
  * strict left-to-right fold, so results stay bit-identical to the DuckDB
  * oracle's ordered list fold — but evaluated as a single fused loop inside
  * whole-stage codegen instead of three interpreted higher-order functions
  * allocating an intermediate array per row. This is the (b)-tier custom
  * operator path from SURVEY.md §7.4: a native `Expression` where the
  * built-in combinators can't hit codegen.
  *
  * Null handling matches the fold it replaces exactly: NULL if either array
  * is null, if the lengths differ (zip_with null-pads the shorter side), or
  * if any element is null (null propagates through the sum).
  */
case class DoubleVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fold-equivalent semantics: length mismatch or any null element → NULL
    // (zip_with null-pads the shorter side; null * x propagates to the sum)
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd two-pointer intersection count of two SORTED long arrays.
  *
  * The hot loop of set-similarity verification (n-gram / shingle Jaccard):
  * with shingles pre-hashed to longs and sorted once map-side, every
  * candidate pair costs one branch-light O(n+m) primitive merge — no hash
  * set, no boxing, no per-row allocation. `array_intersect` on string
  * arrays builds a hash set of UTF8Strings per evaluation; at 100 TB the
  * verify stage evaluates this once per candidate pair, so the constant
  * factor is the whole stage.
  *
  * Contract: inputs are ascending-sorted arrays (the caller sorts after
  * hashing; `array_sort` places NULL elements last). NULL array → NULL;
  * NULL elements match nothing — since they sort last, the merge stops at
  * the first one, which is exact under null-never-equals semantics.
  * Duplicate values count per matched pair of runs' minimum (inputs here
  * are distinct-element sets, where it is exactly |∩|).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint> args, got " +
        s"${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    var done = false
    while (!done && i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) done = true // nulls sort last; no further matches
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { break; } // nulls sort last
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd int8-grid quantizer: `q_i = floor(x_i * 127 / max|x| + 0.5)`
  * as one fused loop, output `array<bigint>`.
  *
  * Bit-identical to the interpreted chain it replaces —
  * `transform(e, x => floor(x * 127.0 / array_max(transform(e, abs)) + 0.5))`
  * — same IEEE operation order (`((x * 127.0) / m) + 0.5`, `Math.floor`,
  * long cast), so the sim5/sim11 cross-engine exact-integer centroid
  * discipline is preserved. The interpreted chain evaluates three
  * higher-order functions per row (two of them re-computing `abs` over the
  * whole array); this was the measured hot spot of sim11's cell-selection
  * corpus pass (r10 verdict: 5.7–9.3× over baseline).
  *
  * Contract: input elements are non-null finite doubles (the callers drop
  * zero/null vectors first); a null array or any null element → NULL.
  * `m = 0` (all-zero vector) follows IEEE through: `0*127/0 = NaN`,
  * `(long) Math.floor(NaN) = 0` — same as the chain it replaces, but
  * callers filter those rows out before quantizing.
  */
case class Int8GridQuantize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_quant127 requires an array<double> arg, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "vec_quant127"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val av = java.lang.Math.abs(x.getDouble(i))
      if (av > m) m = av
      i += 1
    }
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      out(i) = java.lang.Math.floor(x.getDouble(i) * 127.0 / m + 0.5).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val av = ctx.freshName("av")
      val tmp = ctx.freshName("tmp")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; }
         |  else {
         |    double $av = java.lang.Math.abs($a.getDouble($i));
         |    if ($av > $m) { $m = $av; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long[] $tmp = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $tmp[$i] = (long) java.lang.Math.floor(
         |      $a.getDouble($i) * 127.0 / $m + 0.5);
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd product-quantization encoder step: the index of the nearest
  * (squared-L2) codeword to a subvector, ties to the LOWEST index.
  *
  * Replaces the interpreted per-subspace chain
  * `array_sort(array(struct(aggregate(zip_with(sub, cw, (x,c) => (x-c)*(x-c)),
  * 0.0, _+_), k)))[0].k` — K interpreted fold pipelines and a struct sort
  * per row per subspace, the PQ-encode hot spot shared by
  * sim10/sim13/sim15/sim16 and sim9's pq arms. Bit-identical semantics:
  * each distance is the same strict left-to-right IEEE fold, and `<`
  * keeps the first (lowest-k) minimum exactly as the (d, k) struct sort
  * did. Distances are sums of squares, so no -0.0/NaN ordering edge can
  * arise on finite inputs. NULL on a null array, a null element, or a
  * codeword/subvector length mismatch (zip_with's null-pad would poison
  * the fold the same way).
  */
case class PqNearestCode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_nearest_code requires (array<double>, array<array<double>>), got $l / $r")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "pq_nearest_code"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cws = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val kk = cws.numElements()
    var best = Double.PositiveInfinity
    var bestK = -1
    var k = 0
    while (k < kk) {
      if (cws.isNullAt(k)) return null
      val cw = cws.getArray(k)
      if (cw.numElements() != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || cw.isNullAt(i)) return null
        val d = x.getDouble(i) - cw.getDouble(i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bestK = k }
      k += 1
    }
    if (bestK < 0) null else bestK
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val kk = ctx.freshName("kk")
      val best = ctx.freshName("best"); val bestK = ctx.freshName("bestK")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val cw = ctx.freshName("cw"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |int $kk = $b.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestK = -1;
         |for (int $k = 0; $k < $kk && !${ev.isNull}; $k++) {
         |  if ($b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cw = $b.getArray($k);
         |  if ($cw.numElements() != $n) { ${ev.isNull} = true; break; }
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $cw.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $cw.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull} && $acc < $best) { $best = $acc; $bestK = $k; }
         |}
         |if ($bestK < 0) { ${ev.isNull} = true; }
         |${ev.value} = $bestK;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Builder with a real arity error instead of an IndexOutOfBounds from
    * exprs(1) when SQL text passes the wrong argument count. */
  def binaryBuilder(name: String, f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name, "expectedNum" -> "2",
        "actualNum" -> exprs.length.toString, "docroot" -> ""))
    f(exprs(0), exprs(1))
  }

  /** Codegen'd bucketed character-histogram L1 distance for the dd15
    * counting filter (Gravano et al.'s count bound).
    *
    * Contract: both args are equal-length `array<int>` whose LANE 0 is the
    * string's TOTAL length and lanes 1..n−1 are per-tracked-character
    * counts. Returns `Σ_{i≥1} |a_i − b_i| + |rem_a − rem_b|` where
    * `rem = a_0 − Σ_{i≥1} a_i` (the untracked-character remainder
    * bucket). One unit edit changes the full character histogram by
    * L1 ≤ 2, and collapsing untracked chars into the remainder only
    * shrinks the L1, so `levenshtein(a, b) ≥ ⌈hist_l1 / 2⌉` EXACTLY —
    * a prune at `hist_l1 > 2·k` never drops a pair within edit
    * distance k.
    *
    * Why an expression and not 38 column-level abs terms: the inline
    * form generates ~600 lines of ANSI checked arithmetic inside the
    * bucket join's generated method, blowing HotSpot's 8 KB
    * DontCompileHugeMethods limit — the whole join stage then runs
    * INTERPRETED (measured 2.3 µs per evaluation vs this loop's tens of
    * ns; the stage cost tripled instead of dropping). A tight primitive
    * loop keeps the generated method small and JIT-compiled. */
  case class IntHistL1(left: Expression, right: Expression)
    extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hist_l1 requires two array<int> args, got " +
          s"${left.dataType} / ${right.dataType}")
    }
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "hist_l1"
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements() || n == 0) null
      else {
        var i = 1; var acc = 0; var sa = 0; var sb = 0
        var isNull = false
        while (!isNull && i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) isNull = true
          else {
            val av = x.getInt(i); val bv = y.getInt(i)
            acc += math.abs(av - bv); sa += av; sb += bv
          }
          i += 1
        }
        if (isNull || x.isNullAt(0) || y.isNullAt(0)) null
        else {
          val ra = x.getInt(0) - sa; val rb = y.getInt(0) - sb
          acc + math.abs(ra - rb)
        }
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
        val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
        val ra = ctx.freshName("ra"); val rb = ctx.freshName("rb")
        s"""
           |int $n = $a.numElements();
           |int $acc = 0; int $sa = 0; int $sb = 0;
           |if ($n != $b.numElements() || $n == 0) { ${ev.isNull} = true; }
           |else {
           |  for (int $i = 1; $i < $n && !${ev.isNull}; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
           |    else {
           |      int $av = $a.getInt($i); int $bv = $b.getInt($i);
           |      $acc += ($av > $bv) ? ($av - $bv) : ($bv - $av);
           |      $sa += $av; $sb += $bv;
           |    }
           |  }
           |  if (!${ev.isNull} && ($a.isNullAt(0) || $b.isNullAt(0))) { ${ev.isNull} = true; }
           |  if (!${ev.isNull}) {
           |    int $ra = $a.getInt(0) - $sa; int $rb = $b.getInt(0) - $sb;
           |    $acc += ($ra > $rb) ? ($ra - $rb) : ($rb - $ra);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def unaryBuilder(name: String, f: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name, "expectedNum" -> "1",
        "actualNum" -> exprs.length.toString, "docroot" -> ""))
    f(exprs(0))
  }

  /** Register the engine's custom expressions in the session's function
    * registry (idempotent); callers then use `expr("vec_dot(a, b)")` /
    * `call_function`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", binaryBuilder("vec_dot", DoubleVectorDot), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      binaryBuilder("sorted_intersect_count", SortedLongIntersectCount), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_quant127", unaryBuilder("vec_quant127", Int8GridQuantize), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_nearest_code", binaryBuilder("pq_nearest_code", PqNearestCode), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_candidates", binaryBuilder("lsh_candidates", LshCandidates), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hist_l1", binaryBuilder("hist_l1", IntHistL1), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_interleave",
      binaryBuilder("zorder_interleave", ZOrderInterleave), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rep_stats", unaryBuilder("rep_stats", RepetitionStats), "built-in")
  }
}
