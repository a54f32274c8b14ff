package graft.operators

import graft.SparkSpec

/** BM25 ranking properties: length normalization, tf saturation, and a
  * hand-computed score. */
class Bm25Spec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], terms: Seq[String], k: Int = 10) = {
    val spark2 = spark
    import spark2.implicits._
    Similarity.bm25Df(rows.toDF("doc_id", "text"), terms, k)
      .collect().map(r => (r.getLong(1), r.getDouble(r.length - 1))).toSeq
  }

  test("same tf, shorter doc wins (length normalization)") {
    val got = run(Seq(
      (1L, "kw aa"),
      (2L, "kw aa bb cc dd ee ff gg hh ii")), Seq("kw"))
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(0)._2 > got(1)._2)
  }

  test("tf saturates: 4x the tf gives far less than 4x the per-term score") {
    // same length docs, tf 1 vs 4
    val got = run(Seq(
      (1L, "kw aa aa aa"),
      (2L, "kw kw kw kw")), Seq("kw"))
    val byDoc = got.toMap
    assert(byDoc(2L) > byDoc(1L))
    assert(byDoc(2L) < 2.5 * byDoc(1L), s"saturation violated: $byDoc")
  }

  test("hand-computed single-term score") {
    // docs: d1="kw xx" (dl=2, tf=1), d2="yy zz" (dl=2, tf=0)
    // N=2, df=1, avgdl=2 -> idf=ln((2-1+0.5)/1.5+1)=ln(2)
    // sat = 1*2.2 / (1 + 1.2*(0.25+0.75*(2/2))) = 2.2/2.2 = 1
    val got = run(Seq((1L, "kw xx"), (2L, "yy zz")), Seq("kw"))
    val byDoc = got.toMap
    assert(math.abs(byDoc(1L) - math.log(2.0)) < 5e-5)
    assert(byDoc(2L) == 0.0)
  }
}
