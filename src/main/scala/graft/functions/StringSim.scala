package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler string similarity as native codegen'd Catalyst
  * expressions — the entity-resolution standard Spark itself lacks
  * (built-in `levenshtein` is edit distance; JW is the name-matching
  * measure every ER stack pairs with it). Conventions match DuckDB's
  * `jaro_similarity`/`jaro_winkler_similarity` exactly (the oracle):
  * match window ⌊max(l₁,l₂)/2⌋−1, transpositions = half the mismatched
  * matched-sequence positions, Winkler boost p=0.1 over the ≤4-char
  * common prefix applied only when jaro > 0.7, empty input → 0.
  *
  * Codegen emits a static call — the scan pipeline stays whole-stage
  * fused, no UDF boxing (same posture as [[Gammaln]]). */
object StringSim {
  def jaroSim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Jaro similarity on raw strings. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
  }

  /** Jaro–Winkler: boost only past the 0.7 threshold (DuckDB twin). */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var p = 0
    val max = math.min(4, math.min(s1.length, s2.length))
    while (p < max && s1.charAt(p) == s2.charAt(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}

abstract class StringSimExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
    }
  override def dataType: DataType = DoubleType
  protected def fn: String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    if (fn == "jaro") StringSim.jaro(s1, s2) else StringSim.jaroWinkler(s1, s2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.$fn($a.toString(), $b.toString())")
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends StringSimExpr {
  override def prettyName: String = "jaro_sim"
  override protected def fn: String = "jaro"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringSimExpr {
  override def prettyName: String = "jaro_winkler"
  override protected def fn: String = "jaroWinkler"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
