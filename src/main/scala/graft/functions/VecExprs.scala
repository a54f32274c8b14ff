package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for dense-vector kernels (SURVEY.md §4:
  * "custom Expression beats a Scala UDF"): whole-stage-codegen'd tight
  * loops over array<double>, replacing interpreted zip_with/aggregate
  * chains in the similarity/dedup/KNN hot paths (~10× per-row).
  *
  * Semantics contract: sequential i=0..n-1 accumulation — bit-identical
  * to both the higher-order-function formulation and the DuckDB oracles'
  * left-associated chains, so swapping these in changes nothing
  * observable. */
object VecExprs {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecSqDist(a: Column, b: Column): Column =
    ExpressionUtils.column(VecSqDist(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecNormSq(a: Column): Column =
    ExpressionUtils.column(VecNormSq(ExpressionUtils.expression(a)))
  def gammaln(a: Column): Column =
    ExpressionUtils.column(Gammaln(ExpressionUtils.expression(a)))
}

/** log Γ(x) (reference elementwise `gammaln`, dislib/data/array.py:
  * 1880-1956) via commons-math3's Lanczos logGamma (ships in Spark's
  * classpath) — emitted as a static call inside whole-stage codegen, so
  * it pipelines like a built-in math function. */
case class Gammaln(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects double input")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "gammaln"

  override def nullSafeEval(a: Any): Any =
    org.apache.commons.math3.special.Gamma.logGamma(a.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.commons.math3.special.Gamma.logGamma($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ aᵢ·bᵢ over the common prefix of two double arrays. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> inputs")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ-bᵢ)² over the common prefix of two double arrays. */
case class VecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> inputs")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ² of a double array. */
case class VecNormSq(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> input")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_normsq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** n nearest center indices by (squared distance, index) — centers ride
  * along as a reference object, so codegen emits one tight loop instead
  * of k unrolled 64-term chains (Janino compile time is O(k·dim) tree
  * size otherwise; with k=500 BASELINE-scale clustering the chains are
  * unusable). Distance accumulation is sequential per center — bitwise
  * identical to the unrolled-chain/`least(struct)` formulation, so the
  * KMeans oracle contract is preserved. */
case class VecNearestCenters(child: Expression, centers: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  // the flat-array codegen layout addresses center j at j*cols
  require(centers.forall(_.length == centers.head.length),
    "vec_nearest_centers requires uniform center dimensionality")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> input")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "vec_nearest_centers"

  private def distsOf(x: ArrayData): Array[Double] = {
    val p = x.numElements()
    centers.map { c =>
      var s = 0.0; var i = 0; val m = math.min(p, c.length)
      while (i < m) { val d = x.getDouble(i) - c(i); s += d * d; i += 1 }
      s
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val ds = distsOf(a.asInstanceOf[ArrayData])
    // mirror codegen's strict-< insertion exactly: a NaN or +Inf
    // distance never displaces the +Inf sentinel, so such centers are
    // unrankable and missing slots stay -1 (an all-NaN row → all -1)
    val nn = math.min(n, centers.length)
    val valid = ds.indices.filter(i => ds(i) < Double.PositiveInfinity)
      .sortBy(i => (ds(i), i))
    val out = Array.fill(nn)(-1)
    var t = 0
    while (t < nn && t < valid.length) { out(t) = valid(t); t += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // flat row-major center storage: one indirection + cache-linear inner
    // loop (a double[][] walk costs ~3× at k=500·dim=100 scale)
    val flat = Array.concat(scala.collection.immutable.ArraySeq.unsafeWrapArray(centers): _*)
    val cols = if (centers.isEmpty) 0 else centers(0).length
    val cRef = ctx.addReferenceObj("cflat", flat, "double[]")
    // clamp to the center count so codegen emits exactly min(n, k)
    // slots, like the interpreted path; BOTH paths pad any slot with no
    // rankable center (non-finite distances) with -1
    val nn = math.min(n, centers.length)
    nullSafeCodeGen(ctx, ev, a => {
      val bi = ctx.freshName("bi"); val bd = ctx.freshName("bd")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val m = ctx.freshName("m"); val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val pos = ctx.freshName("pos"); val off = ctx.freshName("off")
      val lim = ctx.freshName("lim"); val bound = ctx.freshName("bound")
      // exact early abandon: per-term distances are ≥ 0 so a partial sum
      // already above the current n-th best can never be inserted
      // (insertion needs strict <) — prune checked every 32 dims
      s"""
         |int[] $bi = new int[$nn]; double[] $bd = new double[$nn];
         |for (int $t = 0; $t < $nn; $t++) { $bd[$t] = Double.POSITIVE_INFINITY; $bi[$t] = -1; }
         |int $m = java.lang.Math.min($a.numElements(), $cols);
         |for (int $j = 0; $j < ${centers.length}; $j++) {
         |  int $off = $j * $cols;
         |  double $s = 0.0;
         |  double $bound = $bd[$nn - 1];
         |  int $i = 0;
         |  while ($i < $m) {
         |    int $lim = java.lang.Math.min($i + 32, $m);
         |    for (; $i < $lim; $i++) {
         |      double $d = $a.getDouble($i) - $cRef[$off + $i];
         |      $s += $d * $d;
         |    }
         |    if ($s > $bound) { $s = Double.POSITIVE_INFINITY; break; }
         |  }
         |  int $pos = $nn;
         |  while ($pos > 0 && $s < $bd[$pos - 1]) { $pos--; }
         |  if ($pos < $nn) {
         |    for (int $t = $nn - 1; $t > $pos; $t--) { $bd[$t] = $bd[$t-1]; $bi[$t] = $bi[$t-1]; }
         |    $bd[$pos] = $s; $bi[$pos] = $j;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Minimum squared distance to any center (same loop, scalar result). */
case class VecMinSqDist(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression {
  // the flat-array codegen layout addresses center j at j*cols
  require(centers.forall(_.length == centers.head.length),
    "vec_min_sqdist requires uniform center dimensionality")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double> input")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_min_sqdist"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val p = x.numElements()
    var best = Double.PositiveInfinity
    centers.foreach { c =>
      var s = 0.0; var i = 0; val m = math.min(p, c.length)
      while (i < m) { val d = x.getDouble(i) - c(i); s += d * d; i += 1 }
      if (s < best) best = s
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flat = Array.concat(scala.collection.immutable.ArraySeq.unsafeWrapArray(centers): _*)
    val cols = if (centers.isEmpty) 0 else centers(0).length
    val cRef = ctx.addReferenceObj("cflat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val m = ctx.freshName("m"); val d = ctx.freshName("d")
      val off = ctx.freshName("off"); val lim = ctx.freshName("lim")
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $m = java.lang.Math.min($a.numElements(), $cols);
         |for (int $j = 0; $j < ${centers.length}; $j++) {
         |  int $off = $j * $cols;
         |  double $s = 0.0;
         |  int $i = 0;
         |  while ($i < $m) {
         |    int $lim = java.lang.Math.min($i + 32, $m);
         |    for (; $i < $lim; $i++) {
         |      double $d = $a.getDouble($i) - $cRef[$off + $i];
         |      $s += $d * $d;
         |    }
         |    if ($s > $best) { $s = Double.POSITIVE_INFINITY; break; }
         |  }
         |  if ($s < $best) $best = $s;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
