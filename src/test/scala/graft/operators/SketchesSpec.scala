package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant suite for the engine-portable sketches: Count-Min's
  * one-sided error guarantee and HLL's accuracy/idempotence, plus
  * partitioning invariance for both (sketch state must combine
  * associatively — the property that makes them map-side at 100 TB). */
class SketchesSpec extends SparkSpec {

  private def tokenStream(rows: Seq[String]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("w")
  }

  test("countMin never underestimates and is exact on collision-free cells") {
    val spark2 = spark
    import spark2.implicits._
    // heavy-tailed synthetic stream: word_i appears (50 - i) times
    val stream = (0 until 40).flatMap(i => Seq.fill(50 - i)(s"word_$i"))
    val got = Sketches.countMinDf(tokenStream(stream)).collect()
    assert(got.length == Sketches.CmsTopK)
    got.foreach { r =>
      val (t, e, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(e >= t, s"CMS must never underestimate: ${r.getString(0)}")
      assert(over == e - t)
    }
    // top-k selection is by true count: word_0 (50×) must lead
    assert(got.head.getString(0) == "word_0" && got.head.getLong(1) == 50L)
  }

  test("countMin is partitioning-invariant (partial sketches combine)") {
    val stream = (0 until 30).flatMap(i => Seq.fill(30 - i)(s"t$i"))
    val a = Sketches.countMinDf(tokenStream(stream)).collect().toSeq
    val b = Sketches.countMinDf(tokenStream(stream).repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("hll raw regime lands within 3 standard errors on 5000 distinct values") {
    val spark2 = spark
    import spark2.implicits._
    val tw = (1 to 5000).map(i => ("big", s"v$i")).toDF("scope", "v")
    val r = Sketches.hllDistinctDf(tw).collect()(0)
    assert(r.getLong(2) == Sketches.HllBuckets.toLong, "all buckets hit")
    val est = r.getLong(4)
    // sigma ~ 1.04/sqrt(64) ~ 13% -> 3 sigma = 39%
    assert(math.abs(est - 5000L) < 5000 * 0.39, s"est $est too far from 5000")
  }

  test("hll overlap: identical sets merge idempotently, shifted sets estimate the intersection") {
    val spark2 = spark
    import spark2.implicits._
    // A == C (identical values, different scope): union must equal the
    // single estimate EXACTLY (register max-merge idempotence), so
    // est_overlap == est_a; B shifts by half — overlap truth is 500
    val tw = ((1 to 1000).map(i => ("A", s"v$i")) ++
      (501 to 1500).map(i => ("B", s"v$i")) ++
      (1 to 1000).map(i => ("C", s"v$i"))).toDF("scope", "v")
    val r = Sketches.hllOverlapDf(tw).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6)))).toMap
    val (estA, _, unionAC, overlapAC, trueAC) = r(("A", "C"))
    assert(unionAC == estA, "A==C: merged registers ARE A's registers")
    assert(overlapAC == estA && trueAC == 1000L)
    val (_, _, _, overlapAB, trueAB) = r(("A", "B"))
    assert(trueAB == 500L)
    // inclusion-exclusion compounds three ~13%-sigma estimates: allow
    // 3 sigma of the 1500-element union on either side of 500
    assert(math.abs(overlapAB - 500L) < 1500 * 0.39,
      s"A∩B est $overlapAB too far from 500")
  }

  test("hll small regime (linear counting) is near-exact and duplicate-insensitive") {
    val spark2 = spark
    import spark2.implicits._
    val once = (1 to 4).map(i => ("s", s"x$i")).toDF("scope", "v")
    val tripled = (1 to 4).flatMap(i => Seq.fill(3)(("s", s"x$i"))).toDF("scope", "v")
    val a = Sketches.hllDistinctDf(once).collect()(0)
    val b = Sketches.hllDistinctDf(tripled).collect()(0)
    // registers are max-merged: multiplicity cannot change any column
    assert(a.toSeq == b.toSeq)
    assert(math.abs(a.getLong(4) - 4L) <= 1, s"linear counting est ${a.getLong(4)}")
  }

  test("hll is partitioning-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val tw = (1 to 800).map(i => (s"g${i % 3}", s"v$i")).toDF("scope", "v")
    val a = Sketches.hllDistinctDf(tw).collect().toSeq
    val b = Sketches.hllDistinctDf(tw.repartition(11)).collect().toSeq
    assert(a.sortBy(_.getString(0)) == b.sortBy(_.getString(0)))
  }

  test("quantileSketch brackets the exact quantile within the 1/64 bound") {
    val spark2 = spark
    import spark2.implicits._
    // heavy-tailed deterministic values spanning several octaves
    val vals = (1L to 5000L).map(i => 1L + (i * i * 7919L) % 3000000L)
    val df = vals.toDF("cents")
    val got = Sketches.quantileSketchDf(spark, df).collect()
    assert(got.length == 4)
    val sorted = vals.sorted
    got.foreach { r =>
      val q = r.getLong(r.fieldIndex("q_bp"))
      val n = r.getLong(r.fieldIndex("n"))
      val rnk = r.getLong(r.fieldIndex("rnk"))
      val lo = r.getLong(r.fieldIndex("est_lo_cents"))
      val hi = r.getLong(r.fieldIndex("est_hi_cents"))
      assert(n == vals.length)
      assert(rnk == (q * n + 9999) / 10000)
      val exact = sorted((rnk - 1).toInt) // type-1 quantile
      assert(lo <= exact && exact <= hi, s"q=$q: $lo <= $exact <= $hi")
      // guaranteed relative width: (hi - lo + 1)·64 ≤ lo when sh > 0
      assert(hi == lo || (hi - lo + 1) * 64 <= lo, s"q=$q width")
    }
    // mergeability: the census is partitioning-invariant
    val a = Sketches.quantileSketchDf(spark, df.repartition(1)).collect().toSeq
    val b = Sketches.quantileSketchDf(spark, df.repartition(13)).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
