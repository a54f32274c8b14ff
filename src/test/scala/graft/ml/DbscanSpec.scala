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

  test("dense-cell salting splits a one-cell pathological input across salt keys") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    // 600 points, ALL in grid cell "0,0" → 360k pairs on one join key unsalted
    val one = (0 until 600).map(i => (i.toLong, Array(0.001 * (i % 20), 0.001 * (i / 20)), "0,0"))
      .toDF("id", "v", "cell")
    val salts = DbscanGraft.cellSalts(one, budget = 10000L)
    assert(salts.isDefined, "a 600-point cell must exceed a 10k pair budget")
    val sf = salts.get.collect()
    assert(sf.length == 1 && sf(0).getInt(1) == 36, s"expected factor ceil(600²/10k)=36, got ${sf.toSeq}")
    val joined = DbscanGraft.epsPairJoin(one, one, salts, lit(true))
    val perKey = joined.groupBy(col("a.cell"), col("a.__salt")).count().collect()
    assert(perKey.length == 36, s"pair work must spread over 36 salt keys, got ${perKey.length}")
    val maxKey = perKey.map(_.getLong(2)).max
    // per-key pairs ≈ ceil(600/36)·600 = 10200 — bounded by ~budget, not 360k
    assert(maxKey <= 10200, s"max per-key pairs $maxKey")
    assert(perKey.map(_.getLong(2)).sum == 600L * 600L, "identical pair set, just split")
  }

  test("salted fit (pathological budget) produces identical labels to the local reference") {
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
    // budget 500 forces the salted path through ALL three eps-joins
    val got = DbscanGraft.fit(df, "id", "v", eps, minPts, pairBudget = 500L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- pts.indices)
      assert(got(i.toLong) == expected(i), s"point $i: ${got(i.toLong)} vs ${expected(i)}")
  }
}
