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
  }
}
