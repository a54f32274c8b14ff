package graft.operators

import graft.SparkSpec

/** Hand-computed TF-IDF cosine cases for the sparse similarity ranker. */
class SparseCosineSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], q: Long, k: Int) = {
    val spark2 = spark
    import spark2.implicits._
    Similarity.sparseCosineDf(rows.toDF("doc_id", "text"), q, k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
      .toSeq
  }

  test("identical doc ranks first at cosine 1.0; disjoint doc is not a candidate") {
    val got = run(Seq(
      (0L, "apple banana"),
      (10L, "apple banana"),   // identical -> cosine exactly 1.0
      (11L, "apple cherry"),   // one shared word
      (12L, "durian durian")   // no shared word -> inverted index never pairs it
    ), q = 1, k = 5)
    assert(got.map(t => (t._1, t._2, t._3)) == Seq((0L, 1, 10L), (0L, 2, 11L)))
    assert(got(0)._4 == 1.0)
    // idf milli-nats: apple ln(4/3)->288, banana ln2->693, cherry ln4->1386
    // cos(0,11) = 288*288 / sqrt((288^2+693^2)*(288^2+1386^2))
    val expected = 82944.0 / math.sqrt(563193.0 * 2003940.0)
    assert(math.abs(got(1)._4 - expected) < 1e-6)
  }

  test("equal-cosine candidates break ties on neighbor id ascending") {
    // the 4th disjoint doc keeps idf(x), idf(y) > 0 (df < N); without it
    // every weight is ln(N/N)=0 and all norms vanish
    val got = run(Seq(
      (0L, "x y"),
      (7L, "x y"),
      (5L, "x y"),
      (9L, "zz")), q = 1, k = 5)
    assert(got.map(_._3) == Seq(5L, 7L))
    assert(got.forall(_._4 == 1.0))
  }
}
