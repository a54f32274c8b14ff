package graft.operators

import graft.SparkSpec

/** PQ invariants on exactly-quantizable data: when every vector IS a
  * codebook pattern, encoding is lossless, so ADC distance equals the
  * exact squared distance (0 for same-pattern, 4.0 for adjacent). */
class PqSpec extends SparkSpec {

  test("lossless regime: ADC = exact sqdist, ties break on vec_id") {
    val spark2 = spark
    import spark2.implicits._
    // 8 patterns p_c = [c*0.25]*64 (0.25 is binary-exact, so the
    // round-6 Lloyd contract is a no-op); ids 0..7 seed first-k init,
    // ids 8..39 repeat pattern id%8
    val rows = (0L until 40L).map { id =>
      val c = (id % 8).toDouble
      (id, Seq.fill(64)(c * 0.25))
    }
    val got = Similarity.pqTopKDf(rows.toDF("vec_id", "v"), 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val q0 = got.filter(_._1 == 0L).sortBy(_._2)
    // 4 same-pattern twins at ADC 0 in id order, then the nearest other
    // pattern (|dc|=1 -> 64*(0.25)^2 = 4.0), smallest id = pattern 1
    assert(q0.map(t => (t._3, t._4)).toSeq ==
      Seq((8L, 0.0), (16L, 0.0), (24L, 0.0), (32L, 0.0), (1L, 4.0)))
    // symmetric check for a middle pattern: nearest other pattern is c-1
    val q5 = got.filter(_._1 == 5L).sortBy(_._2)
    assert(q5.map(_._3).toSeq == Seq(13L, 21L, 29L, 37L, 4L))
    assert(q5.last._4 == 4.0)
  }
}
