package graft.operators

import graft.SparkSpec

/** Hand-computed cases for the LLM-pipeline text operators added in
  * round 4: benchmark decontamination and sequence packing. */
class TextOpsSpec extends SparkSpec {

  test("decontaminate flags exactly the corpus docs sharing a 3-gram with the bench set") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      // benchmark doc holds the 3-gram "alpha beta gamma"
      (0L, "srcA", "alpha beta gamma", true),
      // shares that 3-gram inside a longer text → contaminated
      (1L, "srcA", "xx alpha beta gamma yy", false),
      // shares only a 2-gram ("alpha beta"), never a full 3-gram → clean
      (2L, "srcA", "alpha beta delta", false),
      // disjoint vocabulary → clean
      (3L, "srcB", "p q r s t", false)
    ).toDF("doc_id", "source", "text", "is_bench")
    val got = Dedup.decontaminateDf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("srcA", 2L, 1L, 0.5),
      ("srcB", 1L, 0L, 0.0)))
  }

  test("sequencePack assigns packs by global start offset and counts straddlers") {
    val spark2 = spark
    import spark2.implicits._
    // token counts by doc_id order: 3, 4, 2, 5 → starts 0, 3, 7, 9
    val docs = Seq(
      (10L, "a b c"),       // start 0, end 2  → pack 0
      (11L, "d e f g"),     // start 3, end 6  → starts pack 0, ends pack 1 (budget 5)
      (12L, "h i"),         // start 7, end 8  → pack 1
      (13L, "j k l m n")    // start 9, end 13 → starts pack 1, ends pack 2
    ).toDF("doc_id", "text")
    val r = TextAnalysis.sequencePackDf(docs, budget = 5L).collect()(0)
    assert(r.getLong(0) == 4L, "n_docs")
    assert(r.getLong(1) == 14L, "total_tokens")
    assert(r.getLong(2) == 3L, "n_packs = max end pack + 1")
    assert(r.getLong(3) == 2L, "docs 11 and 13 straddle boundaries")
    assert(math.abs(r.getDouble(4) - 4.0 / 3.0) < 1e-3, "avg docs per pack")
  }
}
