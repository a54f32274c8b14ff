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

  test("prfSearch: expansion only adds positive term mass; ranks stay strict") {
    val rows = Similarity.prfSearch(spark, "/root/testdata/sf0.001").collect()
    val stages = rows.groupBy(_.getString(0))
    assert(stages.keySet == Set("base", "expanded"))
    stages.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      // strict leaderboard: scores non-increasing with rank, ids tie-break
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) > b.getLong(3) ||
            (a.getLong(3) == b.getLong(3) && a.getLong(2) < b.getLong(2)))
        case _ => ()
      }
    }
    // every BM25 cell is positive, so per-doc scores can only grow with
    // extra query terms: the expanded winner must outscore the base winner
    val baseTop = stages("base").minBy(_.getInt(1)).getLong(3)
    val expTop = stages("expanded").minBy(_.getInt(1)).getLong(3)
    assert(expTop >= baseTop, s"$expTop vs $baseTop")
  }

  test("tripletEval: one triple per vector, exact label census, bp identity") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val sizes = graft.Tables.embeddings(spark, dir)
      .groupBy(col("label").cast("long")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.tripletEval(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet == sizes.keySet)
    rows.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("n_triples") == sizes(r.getLong(0)), s"label ${r.getLong(0)}")
      assert(g("n_violations") >= 0 && g("n_violations") <= g("n_triples"))
      assert(g("violation_bp") == g("n_violations") * 10000 / g("n_triples"))
    }
  }

  test("dpCounts: reproducible release, floored at zero, Laplace-bounded") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val a = Pii.dpCounts(spark, dir).collect().map(_.toSeq)
    val b = Pii.dpCounts(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "seeded noise must be reproducible")
    val truth = graft.Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("n")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      val (nation, noisy) = (r(0).asInstanceOf[Number].longValue, r(1).asInstanceOf[Long])
      assert(noisy >= 0L)
      // Laplace(b=1) from a 56-bit seed: |noise| <= |ln 2^-56| < 39
      assert(math.abs(noisy - truth(nation)) <= 40L, s"nation $nation")
    }
  }
}
