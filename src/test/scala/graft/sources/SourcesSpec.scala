package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** I/O roundtrips + shuffle permutation invariants (reference test
  * style: tests/test_data_utils.py / test_utils.py). */
class SourcesSpec extends SparkSpec {

  private val created = scala.collection.mutable.ArrayBuffer.empty[String]
  private def tmp(): String = {
    val d = Files.createTempDirectory("graft-io").toString
    created += d
    d
  }

  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    created.foreach { d =>
      Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
        .toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    }
    super.afterAll()
  }

  test("csv text roundtrip with header and column drop") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1, "a", 1.5), (2, "b", -0.5), (3, "c", 2.25))
      .toDF("id", "name", "x")
    val dir = tmp() + "/csv"
    Sources.saveText(df, dir, mergeRows = true)
    val back = Sources.loadText(spark, dir, header = false)
      .toDF("id", "name", "x")
    assert(back.count() == 3)
    assert(back.agg(sum("x")).head().getDouble(0) == 3.25)
    val dropped = Sources.loadText(spark, dir).drop("_c0")
    assert(dropped.columns.length == 2)
  }

  test("parquet roundtrip preserves schema and values") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0))).toDF("id", "v")
    val dir = tmp() + "/pq"
    Sources.saveParquet(df, dir)
    val back = Sources.loadParquet(spark, dir)
    // nullability flags legitimately differ after a parquet roundtrip
    assert(back.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    assert(back.orderBy("id").collect().map(_.getSeq[Double](1).sum).toSeq == Seq(3.0, 7.0))
  }

  test("orc roundtrip preserves schema and values, pushes filters to the scan") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, 2.5, "a"), (2L, 7.5, "b"), (3L, 1.0, "a")).toDF("id", "x", "g")
    val dir = tmp() + "/orc"
    Sources.saveOrc(df, dir)
    val back = Sources.loadOrc(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 2.5), (2L, 7.5), (3L, 1.0)))
    // predicate pushdown reaches the ORC scan like it does for parquet
    val plan = back.filter(org.apache.spark.sql.functions.col("x") > 2.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(x,2.0)"),
      s"ORC scan must receive the pushed filter:\n$plan")
  }

  test("libsvm load yields sparse features") {
    val dir = tmp()
    val f = new java.io.PrintWriter(s"$dir/data.libsvm")
    f.println("1.0 1:0.5 3:1.5")
    f.println("0.0 2:2.0")
    f.close()
    val df = Sources.loadSvmlight(spark, s"$dir/data.libsvm", numFeatures = 4)
    assert(df.columns.toSet == Set("label", "features"))
    val rows = df.orderBy(org.apache.spark.sql.functions.desc("label")).collect()
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(0).getAs[org.apache.spark.ml.linalg.Vector](1).apply(2) == 1.5)
  }

  test("npy roundtrip: v1 f8 C-order + f4 fortran-order, dir vstack in path order") {
    // fixture bytes built to the .npy format spec (v1 header, 64-aligned)
    def npyBytes(rows: Int, cols: Int, vals: Array[Double],
        f4: Boolean, fortran: Boolean): Array[Byte] = {
      val descr = if (f4) "<f4" else "<f8"
      val dict = s"{'descr': '$descr', 'fortran_order': ${if (fortran) "True" else "False"}, 'shape': ($rows, $cols), }"
      val padLen = 64 - ((10 + dict.length + 1) % 64)
      val header = dict + (" " * padLen) + "\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte,
        'P'.toByte, 'Y'.toByte, 1.toByte, 0.toByte))
      bos.write(header.length & 0xff); bos.write((header.length >> 8) & 0xff)
      bos.write(header.getBytes("US-ASCII"))
      val w = if (f4) 4 else 8
      val bb = java.nio.ByteBuffer.allocate(vals.length * w)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // vals is row-major; emit in the declared storage order
      for (t <- vals.indices) {
        val pos = if (fortran) (t % rows) * cols + (t / rows) else t
        if (f4) bb.putFloat(vals(pos).toFloat) else bb.putDouble(vals(pos))
      }
      bos.write(bb.array())
      bos.toByteArray
    }
    val dir = tmp() + "/npy"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val a = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)          // 2×3 C-order
    val b = Array(0.5, -1.5, 2.5, 7.0, 8.0, -9.0)        // 2×3, f4 fortran
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a_first.npy"),
      npyBytes(2, 3, a, f4 = false, fortran = false))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b_second.npy"),
      npyBytes(2, 3, b, f4 = true, fortran = true))
    val d = Sources.loadNpy(spark, dir, rowsPerBlock = 2, colsPerBlock = 2)
    assert(d.rows == 4 && d.cols == 3)
    val got = d.collect()
    val exp = (a ++ b).grouped(3).toArray
    for (i <- 0 until 4; j <- 0 until 3)
      assert(math.abs(got(i, j) - exp(i)(j)) < 1e-6,
        s"($i,$j): ${got(i, j)} vs ${exp(i)(j)}")
  }

  test("saveNpy: load→save→load bit-equality, strip-per-block-row layout") {
    val src = tmp() + "/npy_src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // one irregular 5×3 array (seeded values), loaded with 2-row blocks
    val rng = new java.util.Random(17)
    val vals = Array.fill(15)(rng.nextGaussian())
    def header(rows: Int, cols: Int): Array[Byte] = {
      val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': ($rows, $cols), }"
      val padLen = 64 - ((10 + dict.length + 1) % 64)
      val h = dict + (" " * padLen) + "\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte,
        'P'.toByte, 'Y'.toByte, 1.toByte, 0.toByte))
      bos.write(h.length & 0xff); bos.write((h.length >> 8) & 0xff)
      bos.write(h.getBytes("US-ASCII"))
      val bb = java.nio.ByteBuffer.allocate(rows * cols * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      bos.write(bb.array())
      bos.toByteArray
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/a.npy"), header(5, 3))
    val d = Sources.loadNpy(spark, src, rowsPerBlock = 2, colsPerBlock = 2)
    val out = tmp() + "/npy_out"
    Sources.saveNpy(d, out)
    // 5 rows at 2 per block-row → 3 strip files, zero-padded names
    val written = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(written.toSeq == Seq("part-00000.npy", "part-00001.npy", "part-00002.npy"))
    val d2 = Sources.loadNpy(spark, out, rowsPerBlock = 2, colsPerBlock = 2)
    assert(d2.rows == 5 && d2.cols == 3)
    val got = d2.collect(); val orig = d.collect()
    for (i <- 0 until 5; j <- 0 until 3) {
      // bit-exact: '<f8' in, '<f8' out, no rounding anywhere
      assert(java.lang.Double.doubleToLongBits(got(i, j)) ==
        java.lang.Double.doubleToLongBits(orig(i, j)), s"bits differ at ($i,$j)")
      assert(got(i, j) == vals(i * 3 + j))
    }
  }

  test("npz: STORED roundtrip bit-exact; DEFLATED (savez_compressed) reads too") {
    val src = tmp() + "/npz_src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val rng = new java.util.Random(23)
    val vals = Array.fill(12)(rng.nextGaussian())
    // write a 6×2 array via the production writer, then package it
    val spark2 = spark
    import org.apache.spark.mllib.linalg.Vectors
    import org.apache.spark.mllib.linalg.distributed.IndexedRow
    val d = graft.linalg.DsArray.fromIndexedRows(
      sc.parallelize((0 until 6).map(i =>
        IndexedRow(i.toLong, Vectors.dense(vals(i * 2), vals(i * 2 + 1))))),
      6, 2, 2, 2)
    Sources.saveNpy(d, s"$src/strips")
    val zdir = tmp() + "/npz_z"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(zdir))
    Sources.saveNpz(s"$src/strips", s"$zdir/a.npz")
    val back = Sources.loadNpz(spark, zdir, 2, 2)
    assert(back.rows == 6 && back.cols == 2)
    val got = back.collect()
    for (i <- 0 until 6; j <- 0 until 2)
      assert(java.lang.Double.doubleToLongBits(got(i, j)) ==
        java.lang.Double.doubleToLongBits(vals(i * 2 + j)), s"bits at ($i,$j)")
    // DEFLATED container (numpy savez_compressed) must read identically
    val zdir2 = tmp() + "/npz_z2"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(zdir2))
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(s"$zdir2/a.npz")))
    new java.io.File(s"$src/strips").listFiles().sortBy(_.getName).foreach { f =>
      zout.putNextEntry(new java.util.zip.ZipEntry(f.getName)) // DEFLATED default
      zout.write(java.nio.file.Files.readAllBytes(f.toPath))
      zout.closeEntry()
    }
    zout.close()
    val back2 = Sources.loadNpz(spark, zdir2, 3, 2).collect()
    for (i <- 0 until 6; j <- 0 until 2)
      assert(back2(i, j) == vals(i * 2 + j), s"deflated at ($i,$j)")
  }

  test("mdcrd roundtrip: fixed-width snapshots with a ragged last line") {
    // 2 snapshots × 4 atoms × 3 coords = 24 floats → 10+10+4 per snapshot? No:
    // values stream continuously after the title line, 10 per line.
    val vals = Array.tabulate(24)(i => (i - 12) * 1.125)
    val body = vals.map(v => f"$v%8.3f").grouped(10).map(_.mkString).mkString("\n")
    val dir = tmp() + "/mdcrd"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/traj.mdcrd"),
      ("generated test trajectory\n" + body + "\n").getBytes("US-ASCII"))
    val d = Sources.loadMdcrd(spark, dir, nAtoms = 4)
    assert(d.rows == 2 && d.cols == 12)
    val got = d.collect()
    for (i <- 0 until 2; j <- 0 until 12)
      assert(math.abs(got(i, j) - vals(i * 12 + j)) < 1e-9)
  }

  test("partition pruning: the year filter lands in PartitionFilters") {
    val spark2 = spark
    import spark2.implicits._
    val base = Files.createTempDirectory("graft-pp-spec").toString
    val df = Seq(
      (1L, "1994-03-01", 10.0), (2L, "1995-06-15", 20.0),
      (3L, "1995-11-30", 30.0), (4L, "1996-01-02", 40.0)
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_year", year(to_date(col("o_orderdate"))))
    df.write.partitionBy("o_year").parquet(s"$base/t")
    val pruned = Sources.prunedMonthlyAgg(spark.read.parquet(s"$base/t"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"expected pruning:\n$plan")
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("o_year"), s"filter must be on the partition key: $pf")
    // the data filter must NOT degrade into a post-scan Filter on o_year
    assert(!plan.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("o_year")), plan)
    val got = pruned.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((6, 1L, 2000L), (11, 1L, 3000L)), got.mkString(","))
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(base)).iterator().asScala
      .toSeq.reverse.foreach(p => Files.deleteIfExists(p))
  }

  test("shuffle is a seeded permutation: same multiset, same order across runs") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 500).toDF("x")
    val s1 = Sources.shuffle(df, seed = 9).collect().map(_.getInt(0)).toSeq
    val s2 = Sources.shuffle(df, seed = 9).collect().map(_.getInt(0)).toSeq
    assert(s1 == s2, "same seed → same permutation")
    assert(s1.sorted == (1 to 500), "permutation preserves the multiset")
    assert(s1 != (1 to 500), "actually shuffled")
    val s3 = Sources.shuffle(df, seed = 10).collect().map(_.getInt(0)).toSeq
    assert(s3 != s1, "different seed → different permutation")
  }
}
