package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for dense-vector math over `array<double>` columns —
  * the engine's equivalent of dislib's per-block NumPy kernels
  * (reference: dislib/data/array.py:206-407 elementwise ops).
  *
  * All pure Catalyst expressions (codegen'd, no UDFs); folds are
  * sequential left-to-right so results are bit-reproducible and match
  * the DuckDB oracles' list arithmetic.
  */
object VectorFns {

  /** Cast a float/int array column to array<double>. */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = VecExprs.vecDot(a, b)

  def norm2(c: Column): Column = sqrt(VecExprs.vecNormSq(c))

  def cosine(a: Column, b: Column, an: Column, bn: Column): Column =
    dot(a, b) / (an * bn)

  /** Squared Euclidean distance between two array<double> columns. */
  def sqDist(a: Column, b: Column): Column = VecExprs.vecSqDist(a, b)

  /** Squared distance to a constant center (unrolled, codegen-friendly):
    * sum_i (v[i] - c_i)^2 with a fixed fold order matching SQL `+` chains. */
  def sqDistToConst(v: Column, center: Array[Double]): Column =
    center.zipWithIndex.map { case (c, i) =>
      val d = element_at(v, i + 1) - lit(c)
      d * d
    }.reduce(_ + _)

  /** Mirror of [[sqDistToConst]] for DuckDB oracle SQL (1-based lists). */
  def sqDistToConstSql(vExpr: String, center: Array[Double]): String =
    center.zipWithIndex.map { case (c, i) =>
      s"($vExpr[${i + 1}] - ($c)) * ($vExpr[${i + 1}] - ($c))"
    }.mkString(" + ")
}
