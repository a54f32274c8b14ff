package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-traced funnel for the composed end-to-end pipeline: each stage
  * (quality, dedup, decontamination, budget selection) drops exactly
  * the intended document. */
class PipelineE2eSpec extends SparkSpec {

  test("each pipeline stage drops the intended doc") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      // benchmark doc (excluded from corpus; source of contamination)
      (0L, "bench", "alpha beta gamma delta epsilon zeta eta theta iota kappa", true),
      // quality but contaminated (shares 3-gram "alpha beta gamma")
      (1L, "A", "alpha beta gamma one two three four five six seven", false),
      // quality, clean, unique -> the sole survivor
      (2L, "A", "red green blue cyan magenta yellow black white pink gray", false),
      // exact duplicate of doc 2 -> dedup loser
      (3L, "A", "red green blue cyan magenta yellow black white pink gray", false),
      // too short -> quality reject
      (4L, "A", "aa bb cc", false)
    ).toDF("doc_id", "source", "text", "is_bench")
    val got = TextAnalysis.pipelineE2eDf(docs).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "A")
    assert(r.getLong(1) == 4L, "n_raw")
    assert(r.getLong(2) == 3L, "n_quality: docs 1,2,3")
    assert(r.getLong(3) == 2L, "n_dedup winners: docs 1,2")
    assert(r.getLong(4) == 1L, "n_clean: doc 2 (doc 1 contaminated)")
    assert(r.getLong(5) == 1L && r.getLong(6) == 10L,
      "selection keeps the straddling survivor")
  }
}
