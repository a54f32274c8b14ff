package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import graft.SparkSpec

/** Estimator init-mode parity with the reference (kmeans/base.py:201-216
  * init='random'/ndarray; gm/base.py:479-552 init_params='kmeans'/'random').
  *
  * The GMM kmeans-init case is checked against a LOCAL plain-Scala EM
  * oracle that shares no code with GmmGraft: identical init replayed
  * locally, then full-covariance EM on the collected points. */
class InitModesSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- KMeans: explicit ndarray init (mirrors tests/test_kmeans.py:32-44) ----

  test("KMeans Given-centers init reproduces hand-computed centers") {
    val spark2 = spark
    import spark2.implicits._
    val pts = Seq((0L, Array(1.0, 2.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(-1.0, -2.0)), (3L, Array(-2.0, -1.0)))
    val df = pts.toDF("id", "v")
    val m = KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 5,
      init = KMeansGraft.Init.Given(Array(Array(1.0, 1.0), Array(-1.0, -1.0))))
    // hand-computed: cluster 0 = {(1,2),(2,1)} → (1.5,1.5); cluster 1 → (-1.5,-1.5)
    assert(m.centers(0).toSeq == Seq(1.5, 1.5))
    assert(m.centers(1).toSeq == Seq(-1.5, -1.5))
  }

  test("KMeans Given-centers init validates shape") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((0L, Array(1.0, 2.0))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 1,
        init = KMeansGraft.Init.Given(Array(Array(1.0, 1.0, 1.0), Array(0.0, 0.0, 0.0))))
    }
  }

  test("KMeans random init converges to the toy optimum and tol stops early") {
    val spark2 = spark
    import spark2.implicits._
    val pts = Seq((0L, Array(1.0, 2.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(-1.0, -2.0)), (3L, Array(-2.0, -1.0)))
    val df = pts.toDF("id", "v")
    val m = KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 10,
      init = KMeansGraft.Init.Random(666L), tol = 1e-4)
    val got = m.centers.map(_.toSeq).toSet
    assert(got == Set(Seq(1.5, 1.5), Seq(-1.5, -1.5)), s"centers ${m.centers.map(_.toSeq).toSeq}")
    // once centers stop moving the Σ‖Δc‖ < tol² criterion fires before maxIter
    assert(m.iterations < 10, s"expected early stop, ran ${m.iterations}")
    // same seed → identical trajectory
    val m2 = KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 10,
      init = KMeansGraft.Init.Random(666L), tol = 1e-4)
    assert(m2.centers.map(_.toSeq).toSeq == m.centers.map(_.toSeq).toSeq)
  }

  test("KMeans blasAssign path matches the exact path on separated blobs") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new java.util.Random(31L)
    val pts = (0 until 300).map { i =>
      val c = i % 3 match {
        case 0 => Array(0.0, 0.0, 0.0)
        case 1 => Array(10.0, 0.0, 5.0)
        case _ => Array(0.0, 10.0, -5.0)
      }
      (i.toLong, Array.tabulate(3)(d => c(d) + rng.nextGaussian() * 0.3))
    }
    val df = pts.toDF("id", "v").cache()
    val exact = KMeansGraft.fit(df, "v", "id", k = 3, maxIter = 4)
    val blas = KMeansGraft.fit(df, "v", "id", k = 3, maxIter = 4,
      blasAssign = true)
    df.unpersist(false)
    // same assignments every pass on separated data; per-iteration round6
    // absorbs the summation-order drift → identical rounded centers
    assert(blas.centers.map(_.toSeq).toSeq == exact.centers.map(_.toSeq).toSeq)
  }

  test("KMeans blasAssign skips NaN rows exactly like the exact path") {
    val spark2 = spark
    import spark2.implicits._
    val pts = Seq((0L, Array(0.0, 0.0)), (1L, Array(0.2, 0.0)),
      (2L, Array(5.0, 5.0)), (3L, Array(5.2, 5.0)),
      (4L, Array(Double.NaN, 1.0))) // must not poison any center
    val df = pts.toDF("id", "v")
    val given = KMeansGraft.Init.Given(Array(Array(0.0, 0.0), Array(5.0, 5.0)))
    val exact = KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 2, init = given)
    val blas = KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 2, init = given,
      blasAssign = true)
    assert(exact.centers.forall(_.forall(x => !x.isNaN)))
    assert(blas.centers.map(_.toSeq).toSeq == exact.centers.map(_.toSeq).toSeq)
  }

  test("KMeans blasAssign skips ±Inf rows exactly like the exact path") {
    val spark2 = spark
    import spark2.implicits._
    // an Inf feature gives the blas expansion a -Inf score that would
    // win every argmin and poison the center sums; the exact path's
    // (x-c)² chain yields +Inf distances that lose to the sentinel
    val pts = Seq((0L, Array(0.0, 0.0)), (1L, Array(0.2, 0.0)),
      (2L, Array(5.0, 5.0)), (3L, Array(5.2, 5.0)),
      (4L, Array(Double.PositiveInfinity, 1.0)),
      (5L, Array(Double.NegativeInfinity, 2.0)))
    val df = pts.toDF("id", "v")
    val given = KMeansGraft.Init.Given(Array(Array(0.0, 0.0), Array(5.0, 5.0)))
    val exact = KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 2, init = given)
    val blas = KMeansGraft.fit(df, "v", "id", k = 2, maxIter = 2, init = given,
      blasAssign = true)
    assert(exact.centers.forall(_.forall(java.lang.Double.isFinite)))
    assert(blas.centers.map(_.toSeq).toSeq == exact.centers.map(_.toSeq).toSeq)
  }

  test("GMM blasDiag E-step matches the fused kernel on separated blobs") {
    val sc = spark.sparkContext
    val rows = sc.parallelize(blobPts(17).toSeq, 4)
      .map { case (id, v) => (id, v) }
    val fused = GmmGraft.fit(rows, k = 2, GmmGraft.Diag, maxIter = 4, tol = 0)
    val blas = GmmGraft.fit(rows, k = 2, GmmGraft.Diag, maxIter = 4, tol = 0,
      blasDiag = true)
    // identical EM trajectory up to the expansion's fp rounding
    fused.weights.indices.foreach { j =>
      assert(math.abs(fused.weights(j) - blas.weights(j)) < 1e-9)
      (0 until 2).foreach { d =>
        assert(math.abs(fused.means(j)(d) - blas.means(j)(d)) < 1e-8)
        assert(math.abs(fused.covs(j)(d, d) - blas.covs(j)(d, d)) < 1e-8)
      }
    }
    assert(math.abs(fused.logLikelihood - blas.logLikelihood)
      < 1e-6 * math.abs(fused.logLikelihood))
  }

  test("GMM blasFull E-step matches the fused kernel for Full and Tied") {
    val sc = spark.sparkContext
    val rows = sc.parallelize(blobPts(23).toSeq, 4)
      .map { case (id, v) => (id, v) }
    Seq(GmmGraft.Full, GmmGraft.Tied).foreach { ct =>
      val fused = GmmGraft.fit(rows, k = 2, ct, maxIter = 4, tol = 0)
      val blas = GmmGraft.fit(rows, k = 2, ct, maxIter = 4, tol = 0,
        blasFull = true)
      // identical EM trajectory up to the whitened expansion's fp rounding
      fused.weights.indices.foreach { j =>
        assert(math.abs(fused.weights(j) - blas.weights(j)) < 1e-9, s"$ct w$j")
        (0 until 2).foreach { d =>
          assert(math.abs(fused.means(j)(d) - blas.means(j)(d)) < 1e-8, s"$ct m$j$d")
          (0 until 2).foreach { e =>
            assert(math.abs(fused.covs(j)(d, e) - blas.covs(j)(d, e)) < 1e-8,
              s"$ct cov$j($d,$e)")
          }
        }
      }
      assert(math.abs(fused.logLikelihood - blas.logLikelihood)
        < 1e-6 * math.abs(fused.logLikelihood), s"$ct ll")
    }
  }

  // ---- GMM: kmeans-responsibility init vs a local EM oracle ----

  /** Two well-separated 2-D blobs, deterministic. */
  private def blobPts(seed: Int): Array[(Long, Array[Double])] = {
    val rng = new java.util.Random(seed)
    Array.tabulate(80) { i =>
      val c = if (i % 2 == 0) Array(0.0, 0.0) else Array(6.0, 6.0)
      (i.toLong, Array(c(0) + rng.nextGaussian() * 0.5, c(1) + rng.nextGaussian() * 0.5))
    }
  }

  /** Local Lloyd replica of KMeansGraft.fit(Init.Random(seed), tol=1e-4):
    * uniform [0,1)^dim row-major seeded centers, (sqdist, idx) argmin with
    * left-associated accumulation, per-iteration round6 of means, empty
    * cluster keeps its center, stop when Σ‖Δc‖ < tol². */
  private def localKmeans(pts: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int, tol: Double): Array[Array[Double]] = {
    val dim = pts(0).length
    val rng = new java.util.Random(seed)
    var centers = Array.fill(k, dim)(rng.nextDouble())
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val sums = Array.fill(k)(new Array[Double](dim + 1))
      pts.foreach { x =>
        var best = 0; var bd = Double.PositiveInfinity
        for (j <- 0 until k) {
          var s = 0.0
          for (d <- 0 until dim) { val t = x(d) - centers(j)(d); s += t * t }
          if (s < bd) { bd = s; best = j }
        }
        for (d <- 0 until dim) sums(best)(d) += x(d)
        sums(best)(dim) += 1.0
      }
      val next = Array.tabulate(k) { j =>
        if (sums(j)(dim) > 0) Array.tabulate(dim)(d => r6(sums(j)(d) / sums(j)(dim)))
        else centers(j)
      }
      it += 1
      val shift = (0 until k).map { j =>
        math.sqrt((0 until dim).map(d =>
          (centers(j)(d) - next(j)(d)) * (centers(j)(d) - next(j)(d))).sum)
      }.sum
      done = tol > 0 && shift < tol * tol
      centers = next
    }
    centers
  }

  /** Local full-covariance EM (2-D, 2 components) from explicit init. */
  private def localEm(pts: Array[Array[Double]], w0: Array[Double],
      m0: Array[Array[Double]], c0: Array[Array[Double]], iters: Int, reg: Double)
    : (Array[Double], Array[Array[Double]], Array[Array[Double]]) = {
    val n = pts.length
    val k = w0.length
    var (w, mu, cv) = (w0, m0, c0) // cv(j) = [a, b, d] of [[a,b],[b,d]]
    for (_ <- 0 until iters) {
      val rs = new Array[Double](k)
      val rx = Array.fill(k)(new Array[Double](2))
      val rxx = Array.fill(k)(new Array[Double](3)) // xx, xy, yy moments
      var llSum = 0.0
      pts.foreach { x =>
        val lp = Array.tabulate(k) { j =>
          val Array(a, b, d) = cv(j)
          val det = a * d - b * b
          val cx = x(0) - mu(j)(0); val cy = x(1) - mu(j)(1)
          val q = (d * cx * cx - 2 * b * cx * cy + a * cy * cy) / det
          math.log(w(j)) - 0.5 * (2 * math.log(2 * math.Pi) + math.log(det) + q)
        }
        val mx = lp.max
        val es = lp.map(v => math.exp(v - mx))
        val s = es.sum
        llSum += mx + math.log(s)
        for (j <- 0 until k) {
          val r = es(j) / s
          rs(j) += r
          rx(j)(0) += x(0) * r; rx(j)(1) += x(1) * r
          rxx(j)(0) += x(0) * x(0) * r
          rxx(j)(1) += x(0) * x(1) * r
          rxx(j)(2) += x(1) * x(1) * r
        }
      }
      w = rs.map(_ / n)
      mu = Array.tabulate(k)(j => Array(rx(j)(0) / rs(j), rx(j)(1) / rs(j)))
      cv = Array.tabulate(k) { j =>
        Array(rxx(j)(0) / rs(j) - mu(j)(0) * mu(j)(0) + reg,
          rxx(j)(1) / rs(j) - mu(j)(0) * mu(j)(1),
          rxx(j)(2) / rs(j) - mu(j)(1) * mu(j)(1) + reg)
      }
    }
    (w, mu, cv)
  }

  test("GMM kmeans-resp init matches a local EM oracle on blobs") {
    val data = blobPts(7)
    val rows = sc.parallelize(data.toSeq, 4)
    val seed = 123L
    val iters = 4
    val reg = 1e-6
    val dist = GmmGraft.fit(rows, k = 2, GmmGraft.Full, maxIter = iters,
      tol = 0, reg = reg, init = GmmGraft.GmmInit.KMeansResp(seed))

    // local oracle: replay the identical init (kmeans labels → one-hot
    // resp → weights/means/covs), then run plain EM the same #iterations
    val pts = data.map(_._2)
    val centers = localKmeans(pts, 2, seed, maxIter = 10, tol = 1e-4)
    val k = 2
    val eps10 = 10 * 2.220446049250313e-16
    val rs = new Array[Double](k)
    val rx = Array.fill(k)(new Array[Double](2))
    val rxx = Array.fill(k)(new Array[Double](3))
    pts.foreach { x =>
      var best = 0; var bd = Double.PositiveInfinity
      for (j <- 0 until k) {
        var s = 0.0
        for (d <- 0 until 2) { val t = x(d) - centers(j)(d); s += t * t }
        if (s < bd) { bd = s; best = j }
      }
      rs(best) += 1.0
      rx(best)(0) += x(0); rx(best)(1) += x(1)
      rxx(best)(0) += x(0) * x(0); rxx(best)(1) += x(0) * x(1); rxx(best)(2) += x(1) * x(1)
    }
    val rsS = rs.map(_ + eps10)
    val w0 = rsS.map(_ / pts.length)
    val m0 = Array.tabulate(k)(j => Array(rx(j)(0) / rsS(j), rx(j)(1) / rsS(j)))
    val c0 = Array.tabulate(k) { j =>
      Array(rxx(j)(0) / rsS(j) - m0(j)(0) * m0(j)(0) + reg,
        rxx(j)(1) / rsS(j) - m0(j)(0) * m0(j)(1),
        rxx(j)(2) / rsS(j) - m0(j)(1) * m0(j)(1) + reg)
    }
    val (w, mu, cv) = localEm(pts, w0, m0, c0, iters, reg)

    for (j <- 0 until k) {
      assert(math.abs(dist.weights(j) - w(j)) < 1e-6,
        s"w($j): ${dist.weights(j)} vs ${w(j)}")
      assert(math.abs(dist.means(j)(0) - mu(j)(0)) < 1e-6 &&
        math.abs(dist.means(j)(1) - mu(j)(1)) < 1e-6,
        s"mean($j): ${dist.means(j)} vs ${mu(j).toSeq}")
      assert(math.abs(dist.covs(j)(0, 0) - cv(j)(0)) < 1e-6 &&
        math.abs(dist.covs(j)(0, 1) - cv(j)(1)) < 1e-6 &&
        math.abs(dist.covs(j)(1, 1) - cv(j)(2)) < 1e-6,
        s"cov($j): ${dist.covs(j)} vs ${cv(j).toSeq}")
    }
    // and the fit actually separates the blobs
    val msSorted = dist.means.map(_(0)).sorted
    assert(msSorted(0) < 1.0 && msSorted(1) > 5.0, s"means ${dist.means.toSeq}")
  }

  test("GMM Given init returns the explicit parameters (normalized weights) at maxIter=0") {
    val data = blobPts(21)
    val rows = sc.parallelize(data.toSeq, 4)
    val w0 = Array(3.0, 1.0) // → 0.75 / 0.25 after normalization
    val m0 = Array(Array(0.0, 0.0), Array(6.0, 6.0))
    val eye = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val m = GmmGraft.fit(rows, k = 2, GmmGraft.Full, maxIter = 0,
      init = GmmGraft.GmmInit.Given(w0, m0, Array(eye, eye)))
    assert(m.weights.toSeq == Seq(0.75, 0.25))
    assert(m.means(0).toArray.toSeq == Seq(0.0, 0.0) &&
      m.means(1).toArray.toSeq == Seq(6.0, 6.0))
    assert(m.covs(0)(0, 0) == 1.0 && m.covs(0)(0, 1) == 0.0)
    // and EM from the given params separates the blobs
    val m2 = GmmGraft.fit(rows, k = 2, GmmGraft.Full, maxIter = 5, tol = 0,
      init = GmmGraft.GmmInit.Given(w0, m0, Array(eye, eye)))
    assert(math.abs(m2.weights(0) - 0.5) < 0.05, s"weights ${m2.weights.toSeq}")
    assert(m2.means(0)(0) < 1.0 && m2.means(1)(0) > 5.0)
  }

  test("GMM random-resp init is seed-deterministic and partitioning-invariant") {
    val data = blobPts(13)
    val fit1 = GmmGraft.fit(sc.parallelize(data.toSeq, 4), k = 2, GmmGraft.Diag,
      maxIter = 3, tol = 0, init = GmmGraft.GmmInit.RandomResp(99L))
    // different partition count → identical params (per-row seeding)
    val fit2 = GmmGraft.fit(sc.parallelize(data.toSeq, 7), k = 2, GmmGraft.Diag,
      maxIter = 3, tol = 0, init = GmmGraft.GmmInit.RandomResp(99L))
    for (j <- 0 until 2) {
      assert(math.abs(fit1.weights(j) - fit2.weights(j)) < 1e-9)
      assert(breeze.linalg.norm(fit1.means(j) - fit2.means(j)) < 1e-9)
    }
    assert(math.abs(fit1.weights.sum - 1.0) < 1e-9)
    // different seed → different init trajectory
    val fit3 = GmmGraft.fit(sc.parallelize(data.toSeq, 4), k = 2, GmmGraft.Diag,
      maxIter = 0, tol = 0, init = GmmGraft.GmmInit.RandomResp(7L))
    val fit4 = GmmGraft.fit(sc.parallelize(data.toSeq, 4), k = 2, GmmGraft.Diag,
      maxIter = 0, tol = 0, init = GmmGraft.GmmInit.RandomResp(99L))
    assert(breeze.linalg.norm(fit3.means(0) - fit4.means(0)) > 1e-6)
  }
}
