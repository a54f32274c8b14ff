package graft.operators

import graft.SparkSpec

/** Hand-simulated synchronous LPA: two triangles joined by a bridge
  * resolve into one community per clique after 3 passes (labels traced
  * by hand with the count-desc, min-label tie-break). */
class LabelPropSpec extends SparkSpec {

  private def edges(rows: Seq[(Long, Long)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("a", "b")
  }

  test("two bridged triangles settle into per-clique communities") {
    // K3 {1,2,3} + K3 {4,5,6} + bridge 3-4; 3 sync passes by hand:
    // p1: 1->2 2->1 3->1 4->3 5->4 6->4
    // p2: 1->1 2->1 3->1 4->4 5->3 6->3
    // p3: 1->1 2->1 3->1 4->3 5->3 6->3
    val e = edges(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)))
    val got = Graph.labelPropPairs(e, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (3L, 3L)))
  }

  test("result is partitioning-invariant") {
    val rows = (1L to 40L).flatMap(i => Seq((i, i + 40L), ((i % 40) + 1, i + 40L)))
    val a = Graph.labelPropPairs(edges(rows), 10).collect().toSeq
    val b = Graph.labelPropPairs(edges(rows).repartition(7), 10).collect().toSeq
    assert(a == b)
  }
}
