package graft.ml

import breeze.linalg.{cholesky, diag, DenseMatrix => BDM, DenseVector => BDV}
import graft.Tables
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gaussian mixture EM with full/tied/diag/spherical covariances
  * (reference: dislib/cluster/gm/base.py:27-554; covariance variants
  * `:738-886` — MLlib's GaussianMixture only does full, so the variants
  * are custom here; the E/M pattern is the reference's partial
  * log-prob + weighted-moment accumulators, SURVEY.md §2.5).
  *
  * One treeAggregate per iteration carries k·(1+p+p²) doubles of
  * sufficient statistics — independent of row count, so the 100 TB plan
  * is maxIter scans of cached data with tiny reductions (dislib's
  * `arity` ≙ treeAggregate depth).
  *
  * Deterministic init: means = first k rows by id, covariances = global
  * data variance, uniform weights.
  */
object GmmGraft {
  sealed trait CovType
  case object Full extends CovType
  case object Tied extends CovType
  case object Diag extends CovType
  case object Spherical extends CovType

  final case class Model(weights: Array[Double], means: Array[BDV[Double]],
      covs: Array[BDM[Double]], logLikelihood: Double, iterations: Int)

  private final case class CompDensity(logW: Double, mean: BDV[Double],
      rooti: BDM[Double], logDet: Double) {
    /** log N(x; mean, cov) + log w via the Cholesky root inverse. */
    def logProb(x: BDV[Double]): Double = {
      val c = x - mean
      val z = rooti * c
      val p = x.length
      logW - 0.5 * (p * math.log(2 * math.Pi) + logDet + (z dot z))
    }
  }

  private def densities(weights: Array[Double], means: Array[BDV[Double]],
      covs: Array[BDM[Double]]): Array[CompDensity] =
    weights.indices.map { j =>
      val l = cholesky(covs(j))
      val p = means(j).length
      val logDet = 2.0 * (0 until p).map(i => math.log(l(i, i))).sum
      // rooti = L^-1 (lower-triangular solve of identity)
      val rooti = breeze.linalg.inv(l)
      CompDensity(math.log(weights(j)), means(j), rooti, logDet)
    }.toArray

  def fit(rows: RDD[(Long, Array[Double])], k: Int, covType: CovType,
      maxIter: Int = 20, tol: Double = 1e-4, reg: Double = 1e-6): Model = {
    val p = rows.first()._2.length
    val n = rows.count()
    val sc = rows.sparkContext
    // deterministic init
    val initMeans = rows.sortByKey().take(k).map(r => BDV(r._2))
    val globalMean = rows.values.treeAggregate(BDV.zeros[Double](p))(
      (a, v) => a + BDV(v), _ + _) / n.toDouble
    val globalVar = rows.values.treeAggregate(BDV.zeros[Double](p))(
      (a, v) => { val c = BDV(v) - globalMean; a + (c *:* c) }, _ + _) / n.toDouble
    val initCov = diag(globalVar + reg)
    var weights = Array.fill(k)(1.0 / k)
    var means = initMeans
    var covs = Array.fill(k)(initCov.copy)
    var prevLL = Double.NegativeInfinity
    var ll = Double.NegativeInfinity
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val dens = sc.broadcast(densities(weights, means, covs))
      // sufficient stats: [k](rsum, rx(p), rxx(p,p)), loglik
      val zero = (Array.fill(k)(0.0), Array.fill(k)(BDV.zeros[Double](p)),
        Array.fill(k)(BDM.zeros[Double](p, p)), 0.0)
      val (rs, rx, rxx, llSum) = rows.values.treeAggregate(zero)(
        seqOp = { case ((ars, arx, arxx, all), varr) =>
          val x = BDV(varr)
          val lps = dens.value.map(_.logProb(x))
          val mx = lps.max
          val probs = lps.map(lp => math.exp(lp - mx))
          val s = probs.sum
          var j = 0
          while (j < k) {
            val r = probs(j) / s
            ars(j) += r
            arx(j) += x * r
            arxx(j) += (x * x.t) * r
            j += 1
          }
          (ars, arx, arxx, all + mx + math.log(s))
        },
        combOp = { case ((a1, b1, c1, l1), (a2, b2, c2, l2)) =>
          (Array.tabulate(k)(j => a1(j) + a2(j)),
            Array.tabulate(k)(j => b1(j) + b2(j)),
            Array.tabulate(k)(j => c1(j) + c2(j)), l1 + l2)
        }, depth = 2)
      dens.destroy()
      weights = rs.map(_ / n)
      means = Array.tabulate(k)(j => rx(j) / rs(j))
      val raw = Array.tabulate(k) { j =>
        val m = means(j)
        rxx(j) / rs(j) - (m * m.t)
      }
      covs = covType match {
        case Full => raw.map(c => regularize(c, reg))
        case Diag => raw.map(c => regularize(diag(diag(c)), reg))
        case Spherical => raw.map { c =>
          val v = breeze.linalg.trace(c) / p
          regularize(BDM.eye[Double](p) * v, reg)
        }
        case Tied =>
          val pooled = weights.indices.map(j => raw(j) * weights(j)).reduce(_ + _)
          Array.fill(k)(regularize(pooled, reg))
      }
      ll = llSum
      converged = math.abs(ll - prevLL) < tol * math.abs(ll)
      prevLL = ll
      it += 1
    }
    Model(weights, means, covs, ll, it)
  }

  private def regularize(c: BDM[Double], reg: Double): BDM[Double] = {
    val r = c.copy
    for (i <- 0 until r.rows) r(i, i) += reg
    r
  }

  /** Gate query (rows-only): diag GMM, k=4 on embeddings dims 1..4;
    * per-component weight and mean norm. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        array((1 to 4).map(i => element_at(col("embedding"), i).cast("double")): _*))
      .rdd.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .cache()
    val m = fit(rows, k = 4, Diag, maxIter = 10)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark2 = spark
    import spark2.implicits._
    m.weights.indices.map { j =>
      (j, r4(m.weights(j)), r4(breeze.linalg.norm(m.means(j))))
    }.toDF("component", "weight", "mean_norm").orderBy("component")
  }
}
