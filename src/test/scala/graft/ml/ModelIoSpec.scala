package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Save/load roundtrips: the loaded model must predict identically
  * (reference: tests around save_model/load_model for each estimator). */
class ModelIoSpec extends SparkSpec {
  private def tmp(): String = Files.createTempDirectory("graft-model").toString

  test("KMeans model roundtrip preserves assignments") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new java.util.Random(1)
    val df = Seq.tabulate(200)(i => (i.toLong, Array.fill(4)(rng.nextGaussian())))
      .toDF("id", "v").cache()
    val m = KMeansGraft.fit(df, "v", "id", 3, 3)
    val path = tmp()
    ModelIO.saveKMeans(spark, path, m)
    val m2 = ModelIO.loadKMeans(spark, path)
    assert(m2.centers.map(_.toSeq).toSeq == m.centers.map(_.toSeq).toSeq)
    val a1 = df.withColumn("c", m.assignCol(col("v"))).collect().map(_.getInt(2))
    val a2 = df.withColumn("c", m2.assignCol(col("v"))).collect().map(_.getInt(2))
    assert(a1.toSeq == a2.toSeq)
  }

  test("LinearRegression / PCA / StandardScaler roundtrips") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new java.util.Random(2)
    val df = Seq.tabulate(200) { _ =>
      val a = rng.nextGaussian(); val b = rng.nextGaussian()
      (a, b, 1.0 + 2 * a - b + rng.nextGaussian() * 0.01)
    }.toDF("a", "b", "y")
    val lr = LinearRegressionGraft.fit(df, Seq("a", "b"), "y")
    val p1 = tmp(); ModelIO.saveLinearRegression(spark, p1, lr)
    val lr2 = ModelIO.loadLinearRegression(spark, p1)
    assert(lr2.intercept == lr.intercept && lr2.coefs == lr.coefs)

    val pca = PCAGraft.fit(df, Seq("a", "b", "y"))
    val p2 = tmp(); ModelIO.savePca(spark, p2, pca)
    val pca2 = ModelIO.loadPca(spark, p2)
    assert(pca2.mean == pca.mean)
    assert(pca2.explainedVariance == pca.explainedVariance)
    assert((pca2.components - pca.components).toArray.forall(_ == 0.0))

    val sc1 = Scalers.fitStandard(df, Seq("a", "b"))
    val p3 = tmp(); ModelIO.saveStandardScaler(spark, p3, sc1)
    assert(ModelIO.loadStandardScaler(spark, p3).stats == sc1.stats)

    val mm = Scalers.fitMinMax(df, Seq("a", "b")).copy(range = (-1.0, 1.0))
    val p4 = tmp(); ModelIO.saveMinMaxScaler(spark, p4, mm)
    val mm2 = ModelIO.loadMinMaxScaler(spark, p4)
    assert(mm2.stats == mm.stats && mm2.range == mm.range)
    // loaded model reproduces the transform exactly
    val t1 = mm.transform(df).select("a_mm", "b_mm").collect().map(_.toSeq)
    val t2 = mm2.transform(df).select("a_mm", "b_mm").collect().map(_.toSeq)
    assert(t1.toSeq == t2.toSeq)

    // a real column literally named "__range__" must round-trip intact
    // (range is stored out of band via the kind column, not a sentinel row)
    val hostile = Scalers.MinMaxModel(
      Map("__range__" -> (2.0, 9.0), "a" -> (0.0, 1.0)), (-3.0, 3.0))
    val p5 = tmp(); ModelIO.saveMinMaxScaler(spark, p5, hostile)
    val h2 = ModelIO.loadMinMaxScaler(spark, p5)
    assert(h2.stats == hostile.stats && h2.range == hostile.range)
  }

  test("GMM / CSVM roundtrips preserve parameters and predictions") {
    val rng = new java.util.Random(3)
    val data = Seq.tabulate(200) { i =>
      val c = if (i % 2 == 0) 2.0 else -2.0
      (i.toLong, Array(c + rng.nextGaussian() * 0.3, c + rng.nextGaussian() * 0.3))
    }
    val rows = sc.parallelize(data, 4)
    val gm = GmmGraft.fit(rows, 2, GmmGraft.Full, maxIter = 5)
    val p1 = tmp(); ModelIO.saveGmm(spark, p1, gm)
    val gm2 = ModelIO.loadGmm(spark, p1)
    assert(gm2.weights.toSeq == gm.weights.toSeq)
    assert(gm2.means.map(_.toScalaVector).toSeq == gm.means.map(_.toScalaVector).toSeq)
    assert(gm2.covs.zip(gm.covs).forall { case (a, b) => (a - b).toArray.forall(_ == 0.0) })

    val svm = CascadeSvmGraft.fit(
      rows.map { case (_, v) => (v, if (v(0) > 0) 1.0 else -1.0) },
      c = 1.0, CascadeSvmGraft.Rbf(0.5), maxIter = 1, sweeps = 10)
    val p2 = tmp(); ModelIO.saveCsvm(spark, p2, svm)
    val svm2 = ModelIO.loadCsvm(spark, p2)
    data.foreach { case (_, v) =>
      assert(svm2.predict(v) == svm.predict(v))
      assert(svm2.decision(v) == svm.decision(v))
    }
  }
}
