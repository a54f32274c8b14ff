package graft.operators

import graft.SparkSpec

/** Bloom-decontamination invariants: no false negatives (flagged ⊇
  * exact truth), agreement of the truth column with the exact
  * decontaminate operator, and ~zero false positives when the filter is
  * ~empty (9 set bits in 2^14 — per-probe collision odds ~1e-10). */
class BloomDeconSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, String, Boolean)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "source", "text", "is_bench")
  }

  test("flagged superset of truth; truth matches exact decontaminate") {
    val docs = df(Seq(
      (0L, "srcA", "alpha beta gamma delta", true),
      (1L, "srcA", "xx alpha beta gamma yy", false), // shares a 3-gram
      (2L, "srcA", "alpha beta delta qq rr", false), // 2-gram only -> clean
      (3L, "srcB", "p q r s t u", false)))
    val got = Dedup.bloomDecontaminateDf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.foreach { case (_, _, flagged, truth, fp) =>
      assert(flagged >= truth && fp == flagged - truth)
    }
    val exact = Dedup.decontaminateDf(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    got.foreach { case (src, _, _, truth, _) => assert(truth == exact(src)) }
    // near-empty filter: no false positives at these odds
    assert(got.map(_._5).sum == 0L)
    assert(got.find(_._1 == "srcA").get._4 == 1L, "doc 1 is truly contaminated")
  }
}
