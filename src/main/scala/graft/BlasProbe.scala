package graft
/** Temporary probe: which netlib BLAS implementation loads, and dgemm throughput. */
object BlasProbe {
  def main(args: Array[String]): Unit = {
    val blas = dev.ludovic.netlib.blas.BLAS.getInstance()
    println(s"BLAS impl: ${blas.getClass.getName}")
    val p = 100; val kp = 5000; val b = 1024
    val a = Array.fill(kp * p)(1.0); val x = Array.fill(p * b)(1.0); val g = new Array[Double](kp * b)
    // warmup
    blas.dgemm("N", "N", kp, b, p, 1.0, a, 0, kp, x, 0, p, 0.0, g, 0, kp)
    val t0 = System.nanoTime()
    var i = 0
    while (i < 10) { blas.dgemm("N", "N", kp, b, p, 1.0, a, 0, kp, x, 0, p, 0.0, g, 0, kp); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"dgemm (5000x100)x(100x1024) x10: $sec%.2fs = ${10.0 * 2 * kp.toDouble * p * b / sec / 1e9}%.1f GFlop/s")
    // dsyrk vs dgemm for the GMM M-step rank-b update shape (p=100,
    // b=1024): dsyrk does half the flops but through Java8BLAS.dsyrkK
    // (VectorBLAS overrides only daxpy/dscal in netlib 3.0.4 — verified
    // via javap), while dgemm runs the blocked dgebp kernels
    val xs = Array.fill(p * b)(0.5)
    val c = new Array[Double](p * p)
    blas.dsyrk("U", "N", p, b, 1.0, xs, 0, p, 1.0, c, 0, p)
    var t1 = System.nanoTime(); i = 0
    while (i < 200) { blas.dsyrk("U", "N", p, b, 1.0, xs, 0, p, 1.0, c, 0, p); i += 1 }
    val sSyrk = (System.nanoTime() - t1) / 1e9
    println(f"dsyrk p=$p b=$b x200: $sSyrk%.2fs = ${200.0 * p.toDouble * p * b / sSyrk / 1e9}%.1f GFlop/s (half-flop count)")
    blas.dgemm("N", "T", p, p, b, 1.0, xs, 0, p, xs, 0, p, 1.0, c, 0, p)
    t1 = System.nanoTime(); i = 0
    while (i < 200) { blas.dgemm("N", "T", p, p, b, 1.0, xs, 0, p, xs, 0, p, 1.0, c, 0, p); i += 1 }
    val sGem = (System.nanoTime() - t1) / 1e9
    println(f"dgemm NT p=$p b=$b x200: $sGem%.2fs = ${200.0 * 2 * p.toDouble * p * b / sGem / 1e9}%.1f GFlop/s (full flops)")
    println(f"wall ratio dsyrk/dgemmNT: ${sSyrk / sGem}%.2f (>1 means dgemm wins despite 2x flops)")
  }
}
