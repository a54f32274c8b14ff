package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Estimator parity vs local Breeze/naive references (reference test
  * style: sklearn-oracle comparisons, tests/test_kmeans.py:66-80 etc.). */
class MlSpec extends SparkSpec {

  private def randDf(n: Int, p: Int, seed: Int) = {
    val rng = new java.util.Random(seed)
    val data = Array.fill(n)(Array.fill(p)(rng.nextGaussian()))
    val spark2 = spark
    import spark2.implicits._
    data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "v")
  }

  test("KMeansGraft matches a local Lloyd run with the same contract") {
    val n = 300; val p = 4; val k = 3; val iters = 4
    val rng = new java.util.Random(1)
    val data = Array.fill(n)(Array.fill(p)(rng.nextGaussian()))
    val spark2 = spark
    import spark2.implicits._
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "v")
    val model = KMeansGraft.fit(df, "v", "id", k, iters)

    // local reference with identical contract
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var centers = data.take(k).map(_.map(r6))
    for (_ <- 0 until iters) {
      val assign = data.map { v =>
        (0 until k).minBy(c => (centers(c).zip(v).map { case (ci, vi) =>
          (vi - ci) * (vi - ci) }.sum, c))
      }
      centers = (0 until k).map { c =>
        val pts = data.zip(assign).filter(_._2 == c).map(_._1)
        if (pts.isEmpty) centers(c)
        else Array.tabulate(p)(i => r6(pts.map(_(i)).sum / pts.length))
      }.toArray
    }
    for (c <- 0 until k; i <- 0 until p)
      assert(math.abs(model.centers(c)(i) - centers(c)(i)) < 1e-9,
        s"center $c dim $i: ${model.centers(c)(i)} vs ${centers(c)(i)}")
  }

  test("LinearRegressionGraft recovers known coefficients") {
    val n = 500
    val rng = new java.util.Random(2)
    val rows = Seq.tabulate(n) { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val y = 3.0 + 2.0 * x1 - 5.0 * x2 + rng.nextGaussian() * 0.01
      (x1, x2, y)
    }
    val spark2 = spark
    import spark2.implicits._
    val df = rows.toDF("x1", "x2", "y")
    val m = LinearRegressionGraft.fit(df, Seq("x1", "x2"), "y")
    assert(math.abs(m.intercept - 3.0) < 0.01)
    assert(math.abs(m.coefs(0) - 2.0) < 0.01)
    assert(math.abs(m.coefs(1) + 5.0) < 0.01)
    // predictCol reproduces the fit on the training data within noise
    val mse = df.withColumn("pred", m.predictCol(Seq("x1", "x2")))
      .agg(avg(pow(col("y") - col("pred"), 2))).head().getDouble(0)
    assert(mse < 0.001)
  }

  test("PCAGraft matches Breeze covariance eigendecomposition") {
    val n = 400; val p = 5
    val rng = new java.util.Random(3)
    // correlated data: x * A so the spectrum is non-trivial
    val a = BDM.fill(p, p)(rng.nextGaussian())
    val data = Array.fill(n) {
      val x = BDV.fill(p)(rng.nextGaussian())
      (a * x).toArray
    }
    val spark2 = spark
    import spark2.implicits._
    val df = data.map(v => (v(0), v(1), v(2), v(3), v(4)))
      .toSeq.toDF("f1", "f2", "f3", "f4", "f5")
    val model = PCAGraft.fit(df, Seq("f1", "f2", "f3", "f4", "f5"))
    // local reference
    val x = new BDM(p, n, data.flatten).t
    val mean = BDV.tabulate(p)(i => breeze.linalg.sum(x(::, i)) / n)
    val cx = BDM.tabulate(n, p)((i, j) => x(i, j) - mean(j))
    val cov = (cx.t * cx) / (n - 1.0)
    val eig = breeze.linalg.eigSym(cov)
    val evDesc = eig.eigenvalues.toArray.sorted.reverse
    for (i <- 0 until p)
      assert(math.abs(model.explainedVariance(i) - evDesc(i)) < 1e-8)
    // components are orthonormal
    val c = model.components
    val gram = c.t * c
    for (i <- 0 until p; j <- 0 until p)
      assert(math.abs(gram(i, j) - (if (i == j) 1.0 else 0.0)) < 1e-8)
  }

  test("Scalers: transform + inverse roundtrip") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq.tabulate(100)(i => (i * 1.5 + 3, i * -0.5)).toDF("a", "b")
    val sm = Scalers.fitStandard(df, Seq("a", "b"))
    val back = sm.inverse(sm.transform(df))
    val errS = back.agg(max(abs(col("a_orig") - col("a")))).head().getDouble(0)
    assert(errS < 1e-9)
    val mm = Scalers.fitMinMax(df, Seq("a", "b"))
    val back2 = mm.inverse(mm.transform(df))
    val errM = back2.agg(max(abs(col("b_orig") - col("b")))).head().getDouble(0)
    assert(errM < 1e-9)
    // scaled ranges
    val t = mm.transform(df).agg(min("a_mm"), max("a_mm")).head()
    assert(t.getDouble(0) == 0.0 && t.getDouble(1) == 1.0)
  }

  test("Scalers: constant column scales to 0, never NaN/Inf (sklearn zero-scale guard)") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq.tabulate(10)(i => (i.toDouble, 5.0)).toDF("a", "b")
    val s = Scalers.fitStandard(df, Seq("a", "b")).transform(df)
      .select("b_std").collect().map(_.getDouble(0))
    assert(s.forall(_ == 0.0), s"constant column must scale to 0, got ${s.toSeq}")
    val m = Scalers.fitMinMax(df, Seq("b")).transform(df)
      .select("b_mm").collect().map(_.getDouble(0))
    assert(m.forall(v => !v.isNaN && !v.isInfinite), s"got ${m.toSeq}")
  }

  test("daviesBouldin: positive ratios, self excluded, DB is the worst-ratio mean") {
    val rows = KMeansGraft.daviesBouldin(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == KMeansGraft.K)
    val worsts = rows.map { r =>
      assert(r.getInt(r.fieldIndex("worst_j")) != r.getInt(r.fieldIndex("cluster")))
      assert(r.getLong(r.fieldIndex("ratio_micro")) > 0L)
      assert(r.getDouble(r.fieldIndex("s6")) >= 0.0)
      r.getLong(r.fieldIndex("ratio_micro"))
    }
    val db = rows.head.getLong(rows.head.fieldIndex("db_micro"))
    assert(rows.forall(_.getLong(rows.head.fieldIndex("db_micro")) == db))
    assert(db == worsts.sum / worsts.length)
    // the worst ratio for i must be >= every other (i, j) ratio — spot
    // check via symmetry: worst_i >= ratio against its own worst partner
    assert(db > 0L)
  }
}
