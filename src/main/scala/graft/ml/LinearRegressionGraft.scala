package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import graft.Tables
import graft.linalg.Decompositions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact OLS via distributed normal equations (reference:
  * dislib/regression/linear/base.py:17-348 — tree-reduced ZᵀZ / Zᵀy,
  * local solve; `arity` ≙ treeAggregate depth).
  *
  * Scale: one scan accumulates the (p+1)² Gram — only p² doubles cross
  * the wire per partition; the solve is a driver-side p×p Breeze op.
  */
object LinearRegressionGraft {

  final case class Model(intercept: Double, coefs: BDV[Double]) {
    def predictCol(features: Seq[String]): org.apache.spark.sql.Column =
      features.zipWithIndex.map { case (f, i) => col(f) * lit(coefs(i)) }
        .reduce(_ + _) + lit(intercept)
  }

  /** Fit y ~ features with intercept. */
  def fit(df: DataFrame, features: Seq[String], target: String): Model = {
    val p = features.length + 1 // [1, x...]
    val rows = df.select((lit(1.0) +: features.map(col) :+ col(target)).map(_.cast("double")): _*)
      .rdd.map(r => Array.tabulate(p + 1)(r.getDouble))
    // single pass: gram of [z | y] gives ZᵀZ (top-left) and Zᵀy (last col)
    val g = Decompositions.gram(rows, p + 1)
    val ztz = g(0 until p, 0 until p)
    val zty = g(0 until p, p)
    val beta = ztz \ BDV(zty.toArray)
    Model(beta(0), BDV(beta.toArray.drop(1)))
  }

  /** Gate query: 2-feature OLS on lineitem via centered normal equations
    * expressed entirely in DataFrame aggregates (no collect in the Spark
    * plan), mirrored by a Cramer-rule DuckDB oracle. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val means = li.agg(avg("l_quantity").as("mx1"), avg("l_discount").as("mx2"),
      avg("l_extendedprice").as("my"))
    val c = li.crossJoin(means)
      .select((col("l_quantity") - col("mx1")).as("x1"),
        (col("l_discount") - col("mx2")).as("x2"),
        (col("l_extendedprice") - col("my")).as("y"),
        col("mx1"), col("mx2"), col("my"))
    val s = c.agg(
      sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"), sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      first("mx1").as("mx1"), first("mx2").as("mx2"), first("my").as("my"))
    s.select(
      round((col("s22") * col("s1y") - col("s12") * col("s2y")) /
        (col("s11") * col("s22") - col("s12") * col("s12")), 6).as("b_qty"),
      round((col("s11") * col("s2y") - col("s12") * col("s1y")) /
        (col("s11") * col("s22") - col("s12") * col("s12")), 6).as("b_disc"),
      round(col("my")
        - (col("s22") * col("s1y") - col("s12") * col("s2y")) /
          (col("s11") * col("s22") - col("s12") * col("s12")) * col("mx1")
        - (col("s11") * col("s2y") - col("s12") * col("s1y")) /
          (col("s11") * col("s22") - col("s12") * col("s12")) * col("mx2"), 4)
        .as("intercept"))
  }

  val oracle: String =
    """WITH m AS (SELECT avg(l_quantity) AS mx1, avg(l_discount) AS mx2,
      |    avg(l_extendedprice) AS my FROM lineitem),
      |s AS (SELECT
      |    sum((l_quantity-mx1)*(l_quantity-mx1)) AS s11,
      |    sum((l_quantity-mx1)*(l_discount-mx2)) AS s12,
      |    sum((l_discount-mx2)*(l_discount-mx2)) AS s22,
      |    sum((l_quantity-mx1)*(l_extendedprice-my)) AS s1y,
      |    sum((l_discount-mx2)*(l_extendedprice-my)) AS s2y,
      |    any_value(mx1) AS mx1, any_value(mx2) AS mx2, any_value(my) AS my
      |  FROM lineitem CROSS JOIN m)
      |SELECT
      |  round((s22*s1y - s12*s2y) / (s11*s22 - s12*s12), 6) AS b_qty,
      |  round((s11*s2y - s12*s1y) / (s11*s22 - s12*s12), 6) AS b_disc,
      |  round(my - (s22*s1y - s12*s2y) / (s11*s22 - s12*s12) * mx1
      |           - (s11*s2y - s12*s1y) / (s11*s22 - s12*s12) * mx2, 4) AS intercept
      |FROM s""".stripMargin
}
