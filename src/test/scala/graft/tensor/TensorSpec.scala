package graft.tensor

import graft.SparkSpec

/** ds-tensor surface parity (reference test style: tests/test_tensor.py
  * — shape bookkeeping, cat, elementwise, shuffle preserve contents). */
class TensorSpec extends SparkSpec {

  test("loadDataset: dir of .npy files → tensors in path order, header shapes") {
    def npy(dims: Seq[Int], vals: Array[Double]): Array[Byte] = {
      val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': (${dims.mkString(", ")}), }"
      val pad = 64 - ((10 + dict.length + 1) % 64)
      val header = dict + (" " * pad) + "\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte,
        'P'.toByte, 'Y'.toByte, 1.toByte, 0.toByte))
      bos.write(header.length & 0xff); bos.write((header.length >> 8) & 0xff)
      bos.write(header.getBytes("US-ASCII"))
      val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      bos.write(bb.array()); bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-tensors")
    try {
      val a = Array.tabulate(24)(_.toDouble)       // 2×3×4 3-D tensor
      val b = Array.tabulate(6)(i => i * 0.5)      // 2×3 matrix
      java.nio.file.Files.write(dir.resolve("t0_a.npy"), npy(Seq(2, 3, 4), a))
      java.nio.file.Files.write(dir.resolve("t1_b.npy"), npy(Seq(2, 3), b))
      val ts = TensorSet.loadDataset(spark, dir.toString)
      val rows = ts.summary.collect().sortBy(_.getLong(0))
      assert(rows.length == 2)
      assert(rows(0).getString(1) == "2x3x4" && rows(0).getInt(2) == 24 &&
        math.abs(rows(0).getDouble(3) - a.sum) < 1e-12)
      assert(rows(1).getString(1) == "2x3" && rows(1).getInt(2) == 6 &&
        math.abs(rows(1).getDouble(3) - b.sum) < 1e-12)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

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
