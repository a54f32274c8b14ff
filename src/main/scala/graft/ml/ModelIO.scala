package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Model persistence (reference: every estimator's save_model/load_model,
  * e.g. dislib/cluster/kmeans/base.py:218-324, data/util/model.py:20-73 —
  * JSON/CBOR there; parquet here, the engine's native format, so models
  * round-trip through the same IO stack as data and stay readable by any
  * Spark/DuckDB/Arrow tool). */
object ModelIO {

  private def writeMatrix(spark: SparkSession, path: String,
      name: String, m: Array[Array[Double]]): Unit = {
    import spark.implicits._
    m.zipWithIndex.map { case (row, i) => (name, i, row) }
      .toSeq.toDF("name", "idx", "values")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def readMatrix(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy("idx")
      .collect().map(_.getSeq[Double](2).toArray)

  def saveKMeans(spark: SparkSession, path: String, m: KMeansGraft.Model): Unit =
    writeMatrix(spark, path, "centers", m.centers)

  def loadKMeans(spark: SparkSession, path: String): KMeansGraft.Model =
    KMeansGraft.Model(readMatrix(spark, path))

  def saveLinearRegression(spark: SparkSession, path: String,
      m: LinearRegressionGraft.Model): Unit =
    writeMatrix(spark, path, "coef", Array(Array(m.intercept) ++ m.coefs.toArray))

  def loadLinearRegression(spark: SparkSession, path: String): LinearRegressionGraft.Model = {
    val r = readMatrix(spark, path).head
    LinearRegressionGraft.Model(r.head, BDV(r.tail: _*))
  }

  def savePca(spark: SparkSession, path: String, m: PCAGraft.Model): Unit = {
    val p = m.mean.length
    val rows = Array(m.mean.toArray, m.explainedVariance.toArray) ++
      (0 until p).map(i => (0 until m.components.cols).map(j => m.components(i, j)).toArray)
    writeMatrix(spark, path, "pca", rows)
  }

  def loadPca(spark: SparkSession, path: String): PCAGraft.Model = {
    val rows = readMatrix(spark, path)
    val mean = BDV(rows(0): _*)
    val ev = BDV(rows(1): _*)
    val p = mean.length
    val comps = BDM.tabulate(p, rows(2).length)((i, j) => rows(2 + i)(j))
    PCAGraft.Model(mean, comps, ev)
  }

  def saveGmm(spark: SparkSession, path: String, m: GmmGraft.Model): Unit = {
    val k = m.weights.length
    val p = m.means(0).length
    val rows = Array(m.weights) ++
      m.means.map(_.toArray) ++
      m.covs.flatMap(c => (0 until p).map(i => (0 until p).map(j => c(i, j)).toArray))
    writeMatrix(spark, path, s"gmm_$k", rows)
  }

  def loadGmm(spark: SparkSession, path: String): GmmGraft.Model = {
    val name = spark.read.parquet(path).select("name").head().getString(0)
    val k = name.stripPrefix("gmm_").toInt
    val rows = readMatrix(spark, path)
    val weights = rows(0)
    val p = rows(1).length
    val means = (0 until k).map(i => BDV(rows(1 + i): _*)).toArray
    val covs = (0 until k).map { c =>
      BDM.tabulate(p, p)((i, j) => rows(1 + k + c * p + i)(j))
    }.toArray
    GmmGraft.Model(weights, means, covs, Double.NaN, 0)
  }

  def saveCsvm(spark: SparkSession, path: String, m: CascadeSvmGraft.Model): Unit = {
    val kernelRow = m.kernel match {
      case CascadeSvmGraft.Linear => Array(0.0, 0.0, m.c)
      case CascadeSvmGraft.Rbf(g) => Array(1.0, g, m.c)
    }
    writeMatrix(spark, path, "csvm",
      Array(kernelRow, m.svY, m.alphas) ++ m.svX)
  }

  def loadCsvm(spark: SparkSession, path: String): CascadeSvmGraft.Model = {
    val rows = readMatrix(spark, path)
    val kernel = if (rows(0)(0) == 0.0) CascadeSvmGraft.Linear
      else CascadeSvmGraft.Rbf(rows(0)(1))
    CascadeSvmGraft.Model(kernel, rows(0)(2), rows.drop(3), rows(1), rows(2))
  }

  def saveStandardScaler(spark: SparkSession, path: String,
      m: Scalers.StandardModel): Unit = {
    import spark.implicits._
    m.stats.toSeq.map { case (c, (mu, sd)) => (c, mu, sd) }
      .toDF("col", "mean", "sd").write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadStandardScaler(spark: SparkSession, path: String): Scalers.StandardModel =
    Scalers.StandardModel(spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap)

  /** MinMax persists the fitted (lo, hi) per column plus the output
    * range (reference persists every estimator, data/util/model.py:20-73).
    * The range row is distinguished by an out-of-band `kind` column — a
    * model fitted on ANY real column name (including "__range__")
    * round-trips intact. */
  def saveMinMaxScaler(spark: SparkSession, path: String,
      m: Scalers.MinMaxModel): Unit = {
    import spark.implicits._
    val rows = m.stats.toSeq.map { case (c, (lo, hi)) => ("stat", c, lo, hi) } :+
      (("range", "", m.range._1, m.range._2))
    rows.toDF("kind", "col", "lo", "hi")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadMinMaxScaler(spark: SparkSession, path: String): Scalers.MinMaxModel = {
    val rows = spark.read.parquet(path).collect()
    val stats = rows.filter(_.getString(0) == "stat")
      .map(r => r.getString(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    val range = rows.find(_.getString(0) == "range")
      .map(r => (r.getDouble(2), r.getDouble(3)))
      .getOrElse(throw new IllegalStateException(s"no range row in $path"))
    Scalers.MinMaxModel(stats, range)
  }
}
