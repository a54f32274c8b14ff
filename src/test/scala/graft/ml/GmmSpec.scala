package graft.ml

import breeze.linalg.{norm, DenseVector => BDV}
import graft.SparkSpec

/** GMM EM recovery on separated blobs, all covariance types
  * (reference test style: tests/test_gm.py parameter-recovery checks). */
class GmmSpec extends SparkSpec {

  private def blobs(seed: Int): Seq[(Long, Array[Double])] = {
    val rng = new java.util.Random(seed)
    val c1 = Array(3.0, 0.0, -2.0)
    val c2 = Array(-3.0, 1.0, 2.0)
    Seq.tabulate(400) { i =>
      val c = if (i % 2 == 0) c1 else c2
      (i.toLong, Array.tabulate(3)(d => c(d) + rng.nextGaussian() * 0.4))
    }
  }

  private def check(covType: GmmGraft.CovType): Unit = {
    val rows = sc.parallelize(blobs(11), 4)
    val m = GmmGraft.fit(rows, k = 2, covType, maxIter = 30)
    assert(m.weights.sum > 0.999 && m.weights.sum < 1.001)
    assert(math.abs(m.weights(0) - 0.5) < 0.05, s"weights ${m.weights.toSeq}")
    val t1 = BDV(3.0, 0.0, -2.0); val t2 = BDV(-3.0, 1.0, 2.0)
    val d1 = math.min(norm(m.means(0) - t1), norm(m.means(0) - t2))
    val d2 = math.min(norm(m.means(1) - t1), norm(m.means(1) - t2))
    assert(d1 < 0.15 && d2 < 0.15, s"$covType means: ${m.means.toSeq}")
    // the two fitted means find *different* true centers
    assert(norm(m.means(0) - m.means(1)) > 3.0)
    // recovered variance scale ~ 0.16 on the diagonal
    val avgVar = (0 until 3).map(i => m.covs(0)(i, i)).sum / 3
    assert(avgVar > 0.08 && avgVar < 0.35, s"$covType avg var $avgVar")
  }

  test("full covariance recovers blob structure") { check(GmmGraft.Full) }
  test("diag covariance recovers blob structure") { check(GmmGraft.Diag) }
  test("spherical covariance recovers blob structure") { check(GmmGraft.Spherical) }
  test("tied covariance recovers blob structure") { check(GmmGraft.Tied) }

  test("log-likelihood is finite and improves over one-iteration fit") {
    val rows = sc.parallelize(blobs(12), 4)
    val m1 = GmmGraft.fit(rows, 2, GmmGraft.Full, maxIter = 1, tol = 0)
    val m20 = GmmGraft.fit(rows, 2, GmmGraft.Full, maxIter = 20, tol = 0)
    assert(!m1.logLikelihood.isNaN && !m20.logLikelihood.isNaN)
    assert(m20.logLikelihood >= m1.logLikelihood - 1e-6,
      s"${m20.logLikelihood} < ${m1.logLikelihood}")
  }

  test("predict hard-assigns each blob to one component") {
    val rows = sc.parallelize(blobs(11), 4)
    val m = GmmGraft.fit(rows, 2, GmmGraft.Full, maxIter = 15)
    val labels = GmmGraft.predict(m, rows).collect().toMap
    assert(labels.size == 400)
    // even ids were drawn around c1, odd around c2 — each side must map
    // to exactly one (distinct) component
    val even = labels.collect { case (id, l) if id % 2 == 0 => l }.toSet
    val odd = labels.collect { case (id, l) if id % 2 == 1 => l }.toSet
    assert(even.size == 1 && odd.size == 1 && even != odd,
      s"even→$even odd→$odd")
  }
}
