package graft.operators

import graft.SparkSpec

/** The df-cap candidate-generation knob must not lose true near-dup
  * pairs at sane caps (exact Jaccard is unchanged; only hot shingles
  * leave the inverted index) — and must genuinely restrict candidates
  * when driven to extremes. */
class DedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("ngramJaccard with dfCap finds the same pairs as uncapped") {
    val base = Dedup.ngramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.ngramJaccard(spark, dir, dfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.nonEmpty, "expected planted near-dups")
    assert(capped == base,
      s"dfCap changed results: missing ${base.diff(capped)}, extra ${capped.diff(base)}")
  }

  test("the auto dfCap heuristic (√N, floor 64) preserves all pairs and scales sanely") {
    // formula: floor applies below 64² docs, √N above
    assert(Dedup.autoDfCap(500) == 64)
    assert(Dedup.autoDfCap(4096) == 64)
    assert(Dedup.autoDfCap(1000000) == 1000)
    assert(Dedup.autoDfCap(10000000000L) == 100000)
    // dfCap = -1 routes through the heuristic and loses nothing here
    val base = Dedup.ngramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto = Dedup.ngramJaccard(spark, dir, dfCap = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == base,
      s"auto cap changed results: missing ${base.diff(auto)}, extra ${auto.diff(base)}")
  }

  test("an extreme dfCap genuinely restricts candidate generation") {
    val base = Dedup.ngramJaccard(spark, dir).count()
    // near-dup pairs share shingles with df >= 2, so dfCap=1 must find nothing
    val starved = Dedup.ngramJaccard(spark, dir, dfCap = 1).count()
    assert(starved == 0 && base > 0, s"starved=$starved base=$base")
  }

  test("autoNlist keeps IVF cell occupancy tracking √N on a synthetic corpus") {
    // the heuristic itself: ⌈√N⌉ floored at the gate shape
    assert(Similarity.autoNlist(100) == 16)
    assert(Similarity.autoNlist(10000) == 100)
    assert(Similarity.autoNlist(1000000000L) == 31623)
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val n = 4096L
    val rng = new java.util.Random(5)
    val vecs = Seq.tabulate(n.toInt)(i =>
      (i.toLong, Array.fill(8)(rng.nextDouble()))).toDF("vec_id", "sv")
    val nlist = Similarity.autoNlist(n) // 64 = √4096
    assert(nlist == 64)
    val model = graft.ml.KMeansGraft.fit(vecs, "sv", "vec_id", nlist, maxIter = 3)
    val occ = vecs.withColumn("cell", model.assignCol(col("sv")))
      .groupBy("cell").agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect()
    val sqrtN = math.sqrt(n.toDouble)
    assert(occ.sum == n)
    // mean occupancy IS √N by construction; the quantizer must spread
    // mass so the worst cell stays within a small factor of it (the
    // within-cell pair budget: max_occ² ≪ N²/nlist of a frozen quantizer)
    val mean = occ.sum.toDouble / occ.length
    assert(mean <= sqrtN * 1.5, s"mean occupancy $mean vs sqrtN $sqrtN")
    assert(occ.max <= 8 * sqrtN, s"max occupancy ${occ.max} vs sqrtN $sqrtN")
  }

  test("minhashCalibration buckets contain exactly their error band") {
    val rows = Dedup.minhashCalibration(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getLong(r.fieldIndex("err_bucket"))
      val n = r.getLong(r.fieldIndex("n_pairs"))
      val est = r.getLong(r.fieldIndex("avg_est_bp"))
      val exact = r.getLong(r.fieldIndex("avg_exact_bp"))
      assert(n > 0)
      assert(est >= 0 && est <= 10000 && exact >= 0 && exact <= 10000)
      // every pair in bucket b has est−exact inside b's truncation band
      // ((b−1)·500, (b+1)·500) — per-bucket truncated means can wander
      // one unit, so assert the band with that slack
      val d = est - exact
      assert(d > (b - 1) * 500 - 2 && d < (b + 1) * 500 + 2, s"b=$b d=$d")
    }
  }
}
