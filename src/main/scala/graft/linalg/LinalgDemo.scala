package graft.linalg

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.SparkSession

/** Runnable tour of the DsArray/Decompositions public API — the
  * library-surface smoke: blocked GEMM, TSQR, kron, randomized SVD,
  * each checked against a local Breeze computation. Exits nonzero on
  * any mismatch, so it doubles as an end-to-end health check:
  * `sbt "runMain graft.linalg.LinalgDemo"`. */
object LinalgDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val rng = new java.util.Random(99)
    val a = BDM.fill(50, 20)(rng.nextGaussian())
    val b = BDM.fill(20, 10)(rng.nextGaussian())
    def maxAbs(m: BDM[Double]) = breeze.linalg.max(breeze.numerics.abs(m))
    var failed = false
    def report(name: String, err: Double, tol: Double): Unit = {
      val ok = err < tol
      if (!ok) failed = true
      println(f"$name%-10s maxerr=$err%.3e  ${if (ok) "ok" else "FAIL"}")
    }

    val da = DsArray.fromBreeze(sc, a, 16, 7)
    val db = DsArray.fromBreeze(sc, b, 7, 4)
    report("matmul", maxAbs((da %*% db).collect() - a * b), 1e-10)
    report("add", maxAbs((da + da).collect() - (a + a)), 1e-12)
    report("transpose", maxAbs(da.transpose.collect() - a.t), 1e-12)

    val rows = sc.parallelize((0 until 50).map(i => (i.toLong, a(i, ::).t.toArray)), 4)
    val (q, r) = Decompositions.tsqr(rows, 20)
    val qm = BDM.zeros[Double](50, 20)
    q.collect().foreach { case (i, v) => qm(i.toInt, ::) := BDV(v).t }
    report("tsqr", maxAbs(qm * r - a), 1e-8)

    val a4 = a(0 to 3, 0 to 2).copy
    val b3 = b(0 to 2, 0 to 1).copy
    report("kron", maxAbs(DsArray.kron(
      DsArray.fromBreeze(sc, a4, 2, 2), DsArray.fromBreeze(sc, b3, 2, 2)).collect()
      - breeze.linalg.kron(a4, b3)), 1e-12)

    report("hadamard", maxAbs(da.hadamard(da).collect() - (a *:* a)), 1e-12)
    report("concat", maxAbs(da.concatRows(da).collect() - BDM.vertcat(a, a)), 1e-12)
    report("axis0sum", {
      val cs = da.applyAlongAxis(0)(m =>
        breeze.linalg.sum(m(::, breeze.linalg.*)).t, _ + _).collect()
      val exp = breeze.linalg.sum(a(::, breeze.linalg.*)).t
      (0 until 20).map(j => math.abs(cs(0, j) - exp(j))).max
    }, 1e-10)

    val (s, _) = Decompositions.randomizedSvd(rows, 20, 3)
    val sTrue = breeze.linalg.svd.reduced(a).singularValues
    report("randsvd", math.abs(s(0) - sTrue(0)) / sTrue(0), 0.05)

    spark.stop()
    if (failed) sys.exit(1)
  }
}
