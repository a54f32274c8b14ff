package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic consensus ADMM (reference: dislib/optimization/admm/base.py:
  * 28-307 — per-row-block w-update, soft-threshold z, dual u, with the
  * reference's CVXPY local step replaced by a pluggable closed-form
  * solver; Lasso instance per dislib/regression/lasso/base.py:27-137).
  *
  * Spark-first shape: ONE scan builds per-block normal-equation
  * sufficient statistics (Gᵦ = XᵦᵀXᵦ, cᵦ = Xᵦᵀyᵦ — the partial-Gram
  * pattern of SURVEY.md §2.5); every ADMM iteration is then p-dimensional
  * arithmetic over B tiny blocks with zero further scans. At 100 TB the
  * data is read once; iterations cost B·p² driver flops (B = consensus
  * blocks, not partitions — blocks are hash-of-id so results are
  * engine-reproducible and cluster-layout-independent).
  */
object Admm {

  /** w-step solver: (G + ρI, rhs) → w. Default: Breeze LAPACK solve. */
  def lapackSolve(a: BDM[Double], b: BDV[Double]): BDV[Double] = a \ b

  /** Consensus Lasso over per-block stats: minimize
    * ½Σᵦ‖Xᵦw−yᵦ‖² + λ‖w‖₁ (no intercept).
    * `round6` applies the 6-decimal per-step parameter rounding contract
    * (identical in the DuckDB oracle, so trajectories match bitwise). */
  def consensusLasso(stats: Seq[(BDM[Double], BDV[Double])], p: Int,
      lambda: Double, rho: Double, iters: Int,
      solver: (BDM[Double], BDV[Double]) => BDV[Double] = lapackSolve,
      round6: Boolean = false): BDV[Double] = {
    def r6 = (x: Double) =>
      if (round6) BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else x
    val b = stats.length
    val kappa = lambda / (rho * b)
    var z = BDV.zeros[Double](p)
    val u = Array.fill(b)(BDV.zeros[Double](p))
    val w = Array.fill(b)(BDV.zeros[Double](p))
    for (_ <- 0 until iters) {
      for (i <- stats.indices) {
        val (g, c) = stats(i)
        val a = g.copy
        for (d <- 0 until p) a(d, d) += rho
        val rhs = c + (z - u(i)) * rho
        w(i) = solver(a, rhs).map(r6)
      }
      val zm = stats.indices.map(i => w(i) + u(i)).reduceLeft(_ + _) / b.toDouble
      z = zm.map { v =>
        r6(if (v > kappa) v - kappa else if (v < -kappa) v + kappa else 0.0)
      }
      for (i <- stats.indices)
        u(i) = (u(i) + w(i) - z).map(r6)
    }
    z
  }

  /** Distributed stats build: block = hash56(idCol) % B (deterministic,
    * layout-independent), one groupBy pass emits each block's Gram and
    * moment vector. */
  def blockStats(df: DataFrame, idCol: String, xCols: Seq[String], yCol: String,
      blocks: Int): Seq[(BDM[Double], BDV[Double])] = {
    val p = xCols.length
    val withB = df.withColumn("__b",
      pmod(TextFns.hash56(col(idCol).cast("string")), lit(blocks)))
    val gAggs = for (i <- 0 until p; j <- 0 until p if j >= i)
      yield round(sum(col(xCols(i)) * col(xCols(j))), 6).as(s"g_${i}_$j")
    val cAggs = (0 until p).map(i =>
      round(sum(col(xCols(i)) * col(yCol)), 6).as(s"c_$i"))
    val rows = withB.groupBy("__b").agg((gAggs ++ cAggs).head, (gAggs ++ cAggs).tail: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until blocks.toLong).map { b =>
      rows.get(b) match {
        case Some(r) =>
          val g = BDM.zeros[Double](p, p)
          for (i <- 0 until p; j <- 0 until p if j >= i) {
            g(i, j) = r.getAs[Double](s"g_${i}_$j"); g(j, i) = g(i, j)
          }
          (g, BDV(Array.tabulate(p)(i => r.getAs[Double](s"c_$i"))))
        case None => // empty hash block contributes a zero local problem
          (BDM.zeros[Double](p, p), BDV.zeros[Double](p))
      }
    }
  }

  val QueryLambda = 100.0
  val QueryRho = 50.0
  val QueryIters = 3
  val QueryBlocks = 4

  /** Closed-form 2×2 w-step with the exact operation order the SQL
    * oracle uses (LAPACK would differ in the last ulp). */
  def solve2(a: BDM[Double], rhs: BDV[Double]): BDV[Double] = {
    val det = a(0, 0) * a(1, 1) - a(0, 1) * a(0, 1)
    BDV((a(1, 1) * rhs(0) - a(0, 1) * rhs(1)) / det,
      (a(0, 0) * rhs(1) - a(0, 1) * rhs(0)) / det)
  }

  /** Gate query: consensus-Lasso coefficients for
    * l_extendedprice/50000 ~ (l_quantity/50, l_discount), 4 hash blocks,
    * 3 ADMM iterations under the rounding contract. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("rid"),
        (col("l_quantity") / 50).as("x0"), col("l_discount").as("x1"),
        (col("l_extendedprice") / 50000).as("y"))
    val stats = blockStats(li, "rid", Seq("x0", "x1"), "y", QueryBlocks)
    val z = consensusLasso(stats, 2, QueryLambda, QueryRho, QueryIters,
      solver = solve2, round6 = true)
    val spark2 = spark
    import spark2.implicits._
    z.toArray.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toSeq
      .toDF("feature", "coef").orderBy("feature")
  }

  /** DuckDB oracle: the identical 3 iterations unrolled — per-block
    * 2×2 closed-form solves, left-associated block sum for z̄,
    * soft-threshold, dual update, every parameter rounded to 6. */
  def oracle: String = {
    val b = QueryBlocks
    val (rho, kappa) = (QueryRho, QueryLambda / (QueryRho * b))
    def iteration(t: Int): String = {
      val wSolves = (0 until b).flatMap { i =>
        val (v0, v1) = (s"(s.c_0_$i + $rho * (p.z0 - p.u0_$i))",
          s"(s.c_1_$i + $rho * (p.z1 - p.u1_$i))")
        val det = s"((s.g00_$i + $rho) * (s.g11_$i + $rho) - s.g01_$i * s.g01_$i)"
        Seq(
          s"round(((s.g11_$i + $rho) * $v0 - s.g01_$i * $v1) / $det, 6) AS w0_$i",
          s"round(((s.g00_$i + $rho) * $v1 - s.g01_$i * $v0) / $det, 6) AS w1_$i")
      }.mkString(",\n    ")
      val zmRaw0 = (0 until b).map(i => s"(w.w0_$i + p.u0_$i)").mkString("(", " + ", s") / $b.0")
      val zmRaw1 = (0 until b).map(i => s"(w.w1_$i + p.u1_$i)").mkString("(", " + ", s") / $b.0")
      def soft(e: String) =
        s"round(CASE WHEN $e > $kappa THEN $e - $kappa WHEN $e < -$kappa THEN $e + $kappa ELSE 0.0 END, 6)"
      val uUpd = (0 until b).flatMap { i =>
        Seq(s"round((p.u0_$i + w.w0_$i) - z.z0, 6) AS u0_$i",
          s"round((p.u1_$i + w.w1_$i) - z.z1, 6) AS u1_$i")
      }.mkString(",\n    ")
      s"""w$t AS (SELECT
         |    $wSolves
         |  FROM p${t - 1} p CROSS JOIN s),
         |z$t AS (SELECT ${soft(zmRaw0)} AS z0, ${soft(zmRaw1)} AS z1
         |  FROM w$t w CROSS JOIN p${t - 1} p),
         |p$t AS (SELECT z.z0, z.z1,
         |    $uUpd
         |  FROM z$t z CROSS JOIN w$t w CROSS JOIN p${t - 1} p)""".stripMargin
    }
    val statCols = (0 until b).flatMap { i =>
      Seq(s"max(CASE WHEN b = $i THEN g00 END) AS g00_$i",
        s"max(CASE WHEN b = $i THEN g01 END) AS g01_$i",
        s"max(CASE WHEN b = $i THEN g11 END) AS g11_$i",
        s"max(CASE WHEN b = $i THEN c0 END) AS c_0_$i",
        s"max(CASE WHEN b = $i THEN c1 END) AS c_1_$i")
    }.mkString(",\n    ")
    val initCols = ((0 until b).flatMap(i =>
      Seq(s"0.0 AS u0_$i", s"0.0 AS u1_$i")) ++ Seq("0.0 AS z0", "0.0 AS z1"))
      .mkString(", ")
    s"""WITH d AS (SELECT l_quantity / 50 AS x0, l_discount AS x1,
       |    l_extendedprice / 50000 AS y,
       |    ${TextFns.hash56Sql("l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR")} % $b AS b
       |  FROM lineitem),
       |raw AS (SELECT b, round(sum(x0 * x0), 6) AS g00,
       |    round(sum(x0 * x1), 6) AS g01, round(sum(x1 * x1), 6) AS g11,
       |    round(sum(x0 * y), 6) AS c0, round(sum(x1 * y), 6) AS c1
       |  FROM d GROUP BY b),
       |s AS (SELECT
       |    $statCols
       |  FROM raw),
       |p0 AS (SELECT $initCols),
       |${(1 to QueryIters).map(iteration).mkString(",\n")}
       |SELECT 0::BIGINT AS feature, z0 AS coef FROM p$QueryIters
       |UNION ALL
       |SELECT 1::BIGINT, z1 FROM p$QueryIters
       |ORDER BY feature""".stripMargin
  }
}
