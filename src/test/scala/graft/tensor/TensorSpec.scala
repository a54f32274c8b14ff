package graft.tensor

import graft.SparkSpec

/** ds-tensor surface parity (reference test style: tests/test_tensor.py
  * — shape bookkeeping, cat, elementwise, shuffle preserve contents). */
class TensorSpec extends SparkSpec {

  test("random tensors are deterministic per (seed, id) and reshape-safe") {
    val t1 = TensorSet.random(spark, 10, Seq(3, 4), seed = 9)
    val t2 = TensorSet.random(spark, 10, Seq(3, 4), seed = 9)
    val a = t1.ds.collect().sortBy(_.tensor_id)
    val b = t2.ds.collect().sortBy(_.tensor_id)
    assert(a.zip(b).forall { case (x, y) => x.data.sameElements(y.data) })
    val r = t1.changeShape(Seq(4, 3)).ds.collect().sortBy(_.tensor_id)
    assert(r.forall(_.shape == Seq(4, 3)))
    assert(a.zip(r).forall { case (x, y) => x.data.sameElements(y.data) })
    intercept[Exception](t1.changeShape(Seq(5, 5)).ds.collect())
  }

  test("cat + elementwise + shuffle preserve multiset of contents") {
    val t = TensorSet.random(spark, 6, Seq(2, 2), seed = 3)
    val doubled = t.elementwise(_ * 2.0)
    val both = t.cat(doubled, idOffset = 100)
    assert(both.ds.count() == 12)
    val sums = both.summary.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for (i <- 0 until 6)
      assert(math.abs(sums(i + 100L) - 2.0 * sums(i)) < 1e-12)
    val sh = both.shuffle(seed = 5)
    assert(sh.summary.collect().map(_.getDouble(3)).sorted
      .sameElements(both.summary.collect().map(_.getDouble(3)).sorted))
    assert(both.rechunk(3).ds.rdd.getNumPartitions == 3)
  }
}
