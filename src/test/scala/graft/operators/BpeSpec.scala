package graft.operators

import graft.SparkSpec

/** Hand-computed BPE merge sequences, including the pinned
  * separator-consumption behavior on repeated-symbol runs. */
class BpeSpec extends SparkSpec {

  private def run(wc: Seq[(String, Long)]) = {
    val spark2 = spark
    import spark2.implicits._
    TextAnalysis.bpeTrainDf(spark, wc.toDF("w", "cnt")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("low/lower/lowest learns the classic merge sequence") {
    // v0: "l o w"x3, "l o w e r", "l o w e s t"
    // s1: (l,o)=5 ties (o,w)=5 -> "l o" wins lexicographically
    // s2: (lo,w)=5; s3: (low,e)=2; s4: 1-count tie -> "lowe r"; s5: "lowe s"
    val got = run(Seq(("low", 3L), ("lower", 1L), ("lowest", 1L)))
    assert(got == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L),
      (4, "lowe", "r", 1L), (5, "lowe", "s", 1L)))
  }

  test("repeated-symbol run merges greedily with consumed separator") {
    // "a a a a" counts 3 overlapping (a,a) pairs; the merge pass yields
    // "aa a a" (separator consumed), then "aa aa", then "aaaa" - and
    // with nothing left to merge only 3 of 5 steps emit
    val got = run(Seq(("aaaa", 2L)))
    assert(got == Seq((1, "a", "a", 6L), (2, "a", "a", 2L), (3, "aa", "aa", 2L)))
  }
}
