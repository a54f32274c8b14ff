package graft.operators

import graft.SparkSpec

/** Hand-traced incremental dedup: within-batch loser, cross-epoch
  * duplicate, and genuinely new content each counted once. */
class IncrementalDedupSpec extends SparkSpec {

  test("within/cross/new classes partition the batch") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (0L, "A", "aaa", true),   // history
      (1L, "A", "aaa", false),  // cross-epoch dup (winner of its hash)
      (2L, "A", "bbb", false),  // new (winner)
      (3L, "A", "bbb", false),  // within-batch loser to 2
      (4L, "A", "ccc", false),  // new
      (5L, "B", "ddd", false)   // new, source with no history
    ).toDF("doc_id", "source", "text", "is_hist")
    val got = Dedup.incrementalDedupDf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("A", 1L, 4L, 1L, 1L, 2L),
      ("B", 0L, 1L, 0L, 0L, 1L)))
  }
}
