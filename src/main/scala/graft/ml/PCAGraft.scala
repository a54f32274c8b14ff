package graft.ml

import breeze.linalg.{eigSym, DenseMatrix => BDM, DenseVector => BDV}
import graft.Tables
import graft.linalg.Decompositions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA via tree-reduced scatter matrix + local eigendecomposition
  * (reference: dislib/decomposition/pca/base.py:20-527, method='eig':
  * partial scatter matrices `:316-373`, local `eigh` `:246-279`).
  *
  * Scale: identical shape to LinearRegression — one scan, p² partials,
  * driver-side eig of a p×p matrix; transform is a broadcast-free
  * projection expression.
  */
object PCAGraft {

  final case class Model(mean: BDV[Double], components: BDM[Double],
      explainedVariance: BDV[Double]) {
    /** Project onto the first `k` components as new columns pc1..pck. */
    def transform(df: DataFrame, features: Seq[String], k: Int): DataFrame =
      (0 until k).foldLeft(df) { (d, j) =>
        d.withColumn(s"pc${j + 1}",
          features.zipWithIndex.map { case (f, i) =>
            (col(f) - lit(mean(i))) * lit(components(i, j))
          }.reduce(_ + _))
      }
  }

  def fit(df: DataFrame, features: Seq[String]): Model = {
    val p = features.length
    val n = df.count()
    val meanRow = df.agg(avg(features.head).as("m0"),
      features.tail.zipWithIndex.map { case (f, i) => avg(f).as(s"m${i + 1}") }: _*).head()
    val mean = BDV(Array.tabulate(p)(meanRow.getDouble))
    val meanB = df.sparkSession.sparkContext.broadcast(mean)
    val rows = df.select(features.map(c => col(c).cast("double")): _*)
      .rdd.map { r =>
        val m = meanB.value
        Array.tabulate(p)(i => r.getDouble(i) - m(i))
      }
    val scatter = Decompositions.gram(rows, p)
    val cov = scatter / (n - 1.0)
    val eig = eigSym(cov)
    // descending eigenvalue order, deterministic sign (largest-|.| entry positive)
    val order = eig.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).map(_._2)
    val comps = BDM.tabulate(p, p) { (i, j) => eig.eigenvectors(i, order(j)) }
    for (j <- 0 until p) {
      val cl = comps(::, j)
      val mi = (0 until p).maxBy(i => math.abs(cl(i)))
      if (cl(mi) < 0) comps(::, j) := cl * -1.0
    }
    Model(mean, comps, BDV(order.map(eig.eigenvalues(_))))
  }

  /** Columns pre-scaled to O(1) by fixed constants so every covariance
    * entry rounds safely at 6 decimals (raw price variance is ~1e9 where
    * cross-engine agg-order noise exceeds 1e-6). */
  private val scaled4 = Seq(
    "l_quantity / 50" -> "q", "l_extendedprice / 50000" -> "p",
    "l_discount * 10" -> "d", "l_tax * 10" -> "t")

  /** Gate query: the sample covariance matrix of 4 (scaled) lineitem
    * columns in long format — the distributed heart of PCA(eig); the
    * local eig step is spec-tested since DuckDB has no eigensolver. */
  def covQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(scaled4.map { case (e, n) => expr(e).as(n) }: _*)
    val pairs = for (i <- scaled4.indices; j <- scaled4.indices if j >= i) yield (i, j)
    val aggs = pairs.map { case (i, j) =>
      round(covar_samp(col(scaled4(i)._2), col(scaled4(j)._2)), 6).as(s"c_${i}_$j") }
    val r = li.agg(aggs.head, aggs.tail: _*)
    val spark2 = spark
    import spark2.implicits._
    val row = r.head()
    pairs.map { case (i, j) => (i, j, row.getAs[Double](s"c_${i}_$j")) }
      .toDF("i", "j", "cov")
      .orderBy("i", "j")
  }

  val covOracle: String = {
    val rows = for (i <- scaled4.indices; j <- scaled4.indices if j >= i) yield
      s"SELECT $i AS i, $j AS j, round(covar_samp(${scaled4(i)._1}, ${scaled4(j)._1}), 6) AS cov FROM lineitem"
    rows.mkString("", "\nUNION ALL ", "\nORDER BY i, j")
  }

  /** Oracle-checked eigendecomposition invariants: Σλ = trace(cov) and
    * Σλ² = ‖cov‖²_F — both SQL-computable from covar_samp while the
    * eigenvalues themselves are not. A wrong scatter matrix, a wrong
    * (n-1) scaling, or a broken eigensolver each breaks at least one. */
  def invariantsQuery(spark: SparkSession, dir: String): DataFrame = {
    val feats = (1 to 8).map(i => s"e$i")
    val df = Tables.embeddings(spark, dir)
      .select((1 to 8).map(i =>
        element_at(col("embedding"), i).cast("double").as(s"e$i")): _*)
    val model = fit(df, feats)
    val ev = model.explainedVariance.toArray
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark2 = spark
    import spark2.implicits._
    Seq(("sum_eig", r8(ev.sum)), ("sum_eig_sq", r8(ev.map(x => x * x).sum)))
      .toDF("invariant", "value").orderBy("invariant")
  }

  val invariantsOracle: String =
    """WITH e AS (SELECT list_transform(embedding[1:8], x -> x::DOUBLE) AS v
      |    FROM embeddings),
      |idx AS (SELECT i, j FROM generate_series(1, 8) g(i)
      |    CROSS JOIN generate_series(1, 8) h(j)),
      |c AS (SELECT i, j, covar_samp(v[i], v[j]) AS cij
      |    FROM e CROSS JOIN idx GROUP BY i, j)
      |SELECT 'sum_eig' AS invariant, round(sum(cij) FILTER (WHERE i = j), 8) AS value FROM c
      |UNION ALL
      |SELECT 'sum_eig_sq', round(sum(cij * cij), 8) FROM c
      |ORDER BY invariant""".stripMargin

  /** Gate query: the full distributed PCA path (mean pass → treeAggregate
    * scatter → eigSym → sign convention) on TWO lineitem columns, where
    * DuckDB can replay the eigendecomposition in closed form (2×2
    * symmetric: λ = (a+c)/2 ± √(((a−c)/2)² + b²), eigenvectors from
    * (b, λ−a) / (λ−c, b)). The q/p pair has a large eigen-gap (~0.28),
    * so the rounded loadings are stable against agg-order noise. 8-dim
    * PCA stays covered by q_pca_cov + q_pca_invariants + MlSpec. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.lineitem(spark, dir)
      .select((col("l_quantity") / 50).as("q"), (col("l_extendedprice") / 50000).as("p"))
      .cache()
    val model = fit(df, Seq("q", "p"))
    df.unpersist(false)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = model.explainedVariance.toArray
    val spark2 = spark
    import spark2.implicits._
    (0 until 2).map { j =>
      (j + 1, r6(ev(j)), r6(model.components(0, j)), r6(model.components(1, j)))
    }.toDF("component", "variance", "load1", "load2")
      .orderBy("component")
  }

  /** Closed-form 2×2 eigendecomposition in SQL. The eigenvector basis
    * choice avoids cancellation ((b, λ₁−a) is safe because λ₁ ≥ c > a on
    * this data; (λ₂−c, b) symmetric for the small root); the sign
    * convention (largest-|entry| positive, first index on ties) matches
    * Model.fit. */
  val oracle: String =
    """WITH c AS (SELECT covar_samp(l_quantity/50, l_quantity/50) AS a,
      |    covar_samp(l_quantity/50, l_extendedprice/50000) AS b,
      |    covar_samp(l_extendedprice/50000, l_extendedprice/50000) AS cc
      |  FROM lineitem),
      |e AS (SELECT 1 AS component,
      |    (a+cc)/2 + sqrt((a-cc)*(a-cc)/4 + b*b) AS lam, a, b, cc FROM c
      |  UNION ALL
      |  SELECT 2, (a+cc)/2 - sqrt((a-cc)*(a-cc)/4 + b*b), a, b, cc FROM c),
      |u AS (SELECT component, lam,
      |    CASE WHEN component = 1 THEN b ELSE lam - cc END AS u1,
      |    CASE WHEN component = 1 THEN lam - a ELSE b END AS u2 FROM e),
      |nrm AS (SELECT component, lam,
      |    u1/sqrt(u1*u1 + u2*u2) AS w1, u2/sqrt(u1*u1 + u2*u2) AS w2 FROM u),
      |s AS (SELECT component, lam, w1, w2,
      |    CASE WHEN (CASE WHEN abs(w1) >= abs(w2) THEN w1 ELSE w2 END) < 0
      |      THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END AS f FROM nrm)
      |SELECT component, round(lam, 6) AS variance,
      |  round(f*w1, 6) AS load1, round(f*w2, 6) AS load2
      |FROM s ORDER BY component""".stripMargin
}
