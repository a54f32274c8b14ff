package graft.operators

import graft.SparkSpec

/** Hand-computed Stupid-Backoff bigram surprisal: seen pair, backoff
  * pair, unseen-history skip, unseen-continuation skip. */
class BigramSpec extends SparkSpec {

  test("seen/backoff/skip pair classes score as hand-computed") {
    val spark2 = spark
    import spark2.implicits._
    // train "a b a c": c1(a)=2 b=1 c=1, T=4; bigrams a-b, b-a, a-c
    // test "a b z c a q":
    //   a-b seen:   ln(c1(a)/c2) = ln 2        -> 693147
    //   b-z:        w2 unseen -> skip
    //   z-c:        history unseen -> skip
    //   c-a backoff: ln(10T/(4*c1(a))) = ln 5  -> 1609438
    //   a-q:        w2 unseen -> skip
    val docs = Seq(
      (0L, "a b a c", true),
      (1L, "a b z c a q", false)).toDF("doc_id", "text", "is_train")
    val got = TextAnalysis.bigramSurprisalDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = (693147L + 1609438L) / 2
    assert(got == Seq((1L, 2L, expected)))
  }
}
