package graft.ml

import graft.SparkSpec

/** DBSCAN parity vs a local O(n²) reference with identical rules
  * (coreness incl. self ≥ minPts; core clusters = connected components
  * of core-core ≤ eps edges; border → min-id core neighbor; else noise).
  * Mirrors the reference's sklearn-oracle test style (tests/test_dbscan.py). */
class DbscanSpec extends SparkSpec {

  private def localDbscan(pts: Array[Array[Double]], eps: Double, minPts: Int): Array[Long] = {
    val n = pts.length
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val neigh = Array.tabulate(n)(i =>
      (0 until n).filter(j => j != i && d2(pts(i), pts(j)) <= eps * eps))
    val core = Array.tabulate(n)(i => neigh(i).size + 1 >= minPts)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- 0 until n if core(i); j <- neigh(i) if core(j)) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    Array.tabulate(n) { i =>
      if (core(i)) find(i).toLong
      else {
        val cs = neigh(i).filter(core)
        if (cs.nonEmpty) find(cs.min).toLong else -1L
      }
    }
  }

  test("grid DBSCAN matches local reference on blobs + noise") {
    val rng = new java.util.Random(5)
    val blob1 = Array.fill(60)(Array(rng.nextGaussian() * 0.05 + 1.0, rng.nextGaussian() * 0.05 + 1.0))
    val blob2 = Array.fill(60)(Array(rng.nextGaussian() * 0.05 - 1.0, rng.nextGaussian() * 0.05 - 1.0))
    val noise = Array.fill(20)(Array(rng.nextDouble() * 6 - 3, rng.nextDouble() * 6 - 3))
    val pts = blob1 ++ blob2 ++ noise
    val eps = 0.15; val minPts = 5

    val expected = localDbscan(pts, eps, minPts)

    val spark2 = spark
    import spark2.implicits._
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "v")
    val got = DbscanGraft.fit(df, "id", "v", eps, minPts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got.size == pts.length, "every point labeled exactly once")
    // noise sets identical
    val expNoise = expected.zipWithIndex.filter(_._1 == -1L).map(_._2.toLong).toSet
    val gotNoise = got.filter(_._2 == -1L).keySet
    assert(gotNoise == expNoise, s"noise mismatch: ${gotNoise.diff(expNoise)} vs ${expNoise.diff(gotNoise)}")
    // cluster partitions identical (labels are min-ids in both impls)
    for (i <- pts.indices if expected(i) != -1L)
      assert(got(i.toLong) == expected(i), s"point $i: ${got(i.toLong)} vs ${expected(i)}")
    // sanity: exactly 2 real clusters
    assert(got.values.filter(_ != -1L).toSet.size == 2)
  }
}
