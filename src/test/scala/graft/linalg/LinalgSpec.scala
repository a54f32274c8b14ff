package graft.linalg

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import breeze.linalg.{kron => bkron, svd => bsvd}
import graft.SparkSpec

/** Linalg parity vs local Breeze — the test style of the reference
  * (tests/test_array.py, test_qr.py, test_svd.py: golden invariants and
  * NumPy-oracle comparison; SURVEY.md §5). */
class LinalgSpec extends SparkSpec {
  private def rand(r: Int, c: Int, seed: Int): BDM[Double] = {
    val rng = new java.util.Random(seed)
    BDM.fill(r, c)(rng.nextGaussian())
  }
  private def maxAbs(m: BDM[Double]): Double = breeze.linalg.max(breeze.numerics.abs(m))

  test("fromBreeze/collect roundtrip with irregular edge blocks") {
    val a = rand(17, 13, 1)
    val d = DsArray.fromBreeze(sc, a, 5, 4)
    assert(maxAbs(d.collect() - a) < 1e-12)
    assert(d.rows == 17 && d.cols == 13)
  }

  test("matmul matches Breeze GEMM across mismatched grids") {
    val a = rand(20, 15, 2); val b = rand(15, 9, 3)
    val da = DsArray.fromBreeze(sc, a, 7, 5)
    val db = DsArray.fromBreeze(sc, b, 5, 4)
    assert(maxAbs((da %*% db).collect() - a * b) < 1e-10)
  }

  test("add/subtract/transpose/scalar ops") {
    val a = rand(12, 8, 4); val b = rand(12, 8, 5)
    val da = DsArray.fromBreeze(sc, a, 4, 4)
    val db = DsArray.fromBreeze(sc, b, 4, 4)
    assert(maxAbs((da + db).collect() - (a + b)) < 1e-12)
    assert(maxAbs((da - db).collect() - (a - b)) < 1e-12)
    assert(maxAbs(da.transpose.collect() - a.t) < 1e-12)
    assert(maxAbs((da * 2.5).collect() - (a * 2.5)) < 1e-12)
    assert(maxAbs(da.mapBlocks(math.exp).collect() -
      breeze.numerics.exp(a)) < 1e-12)
  }

  test("eye / zeros / full / random determinism") {
    assert(maxAbs(DsArray.eye(sc, 9, 4).collect() - BDM.eye[Double](9)) == 0.0)
    assert(maxAbs(DsArray.zeros(sc, 5, 7, 2, 3).collect()) == 0.0)
    assert(DsArray.full(sc, 3, 3, 2, 2, 2.5).collect().toArray.forall(_ == 2.5))
    val r1 = DsArray.random(sc, 10, 6, 3, 3, seed = 7).collect()
    val r2 = DsArray.random(sc, 10, 6, 3, 3, seed = 7).collect()
    assert(maxAbs(r1 - r2) == 0.0)
    // rectangular eye (array.py:1462-1511): global diagonal, zero elsewhere
    val e = DsArray.eye(sc, 5, 8, 3).collect()
    val exp = BDM.tabulate[Double](5, 8)((i, j) => if (i == j) 1.0 else 0.0)
    assert(maxAbs(e - exp) == 0.0)
    assert(maxAbs(DsArray.eye(sc, 8, 5, 3).collect()
      - BDM.tabulate[Double](8, 5)((i, j) => if (i == j) 1.0 else 0.0)) == 0.0)
  }

  test("conj is identity on real tiles; replaceBlock swaps one tile only") {
    val m = BDM.tabulate[Double](5, 5)((i, j) => i * 5.0 + j)
    val a = DsArray.fromBreeze(sc, m, 2, 2)
    assert(maxAbs(a.conj.collect() - m) == 0.0)
    val nb = BDM.fill(2, 2)(-1.0)
    val swapped = a.replaceBlock(1, 1, nb).collect()
    val exp = m.copy
    exp(2 to 3, 2 to 3) := nb
    assert(maxAbs(swapped - exp) == 0.0)
    // shape-mismatched replacement is rejected
    intercept[org.apache.spark.SparkException] {
      a.replaceBlock(2, 2, nb).collect()
    }
  }

  test("kron matches Breeze kron") {
    val a = rand(4, 3, 6); val b = rand(3, 2, 7)
    val da = DsArray.fromBreeze(sc, a, 2, 2)
    val db = DsArray.fromBreeze(sc, b, 2, 2)
    assert(maxAbs(DsArray.kron(da, db).collect() - bkron(a, b)) < 1e-12)
  }

  test("kron wide B: tile assembly, no whole-row materialization") {
    val a = rand(3, 2, 31); val b = rand(2, 40, 32)
    val da = DsArray.fromBreeze(sc, a, 2, 2)
    val db = DsArray.fromBreeze(sc, b, 2, 8)
    assert(maxAbs(DsArray.kron(da, db).collect() - bkron(a, b)) < 1e-12)
  }

  test("fancy indexing: row/col lists in order (dups allowed), 2-D slice") {
    val a = rand(9, 7, 21)
    val d = DsArray.fromBreeze(sc, a, 4, 3)
    val rIdx = Seq(5L, 0L, 5L, 2L)
    val gr = d.selectRows(rIdx).collect()
    for ((ri, k) <- rIdx.zipWithIndex; j <- 0 until 7)
      assert(gr(k, j) == a(ri.toInt, j))
    val cIdx = Seq(6, 1, 3)
    val gc = d.selectCols(cIdx).collect()
    for (i <- 0 until 9; (cj, k) <- cIdx.zipWithIndex)
      assert(gc(i, k) == a(i, cj))
    val g2 = d.slice2D(2, 8, 1, 5).collect()
    assert(maxAbs(g2 - a(2 to 7, 1 to 4).copy) < 1e-12)
    // chained: rows then cols, both order-preserving
    val gb = d.selectRows(rIdx).selectCols(cIdx).collect()
    for ((ri, k) <- rIdx.zipWithIndex; (cj, l) <- cIdx.zipWithIndex)
      assert(gb(k, l) == a(ri.toInt, cj))
  }

  test("sparse COO tiles: blocks stay sparse; gram/matmul/transpose match dense") {
    val rng = new java.util.Random(41)
    val entries = for {
      i <- 0 until 30; j <- 0 until 10 if rng.nextDouble() < 0.2
    } yield (i.toLong, j.toLong, rng.nextGaussian())
    val dense = BDM.zeros[Double](30, 10)
    entries.foreach { case (i, j, v) => dense(i.toInt, j.toInt) = v }
    val a = DsArray.fromCOO(sc.parallelize(entries), 30, 10, 8, 4)
    assert(a.bm.blocks.collect().forall(_._2.isInstanceOf[org.apache.spark.mllib.linalg.SparseMatrix]))
    assert(maxAbs(a.collect() - dense) < 1e-12)
    assert(maxAbs((a.transpose %*% a).collect() - dense.t * dense) < 1e-10)
    assert(maxAbs(a.transpose.collect() - dense.t) < 1e-12)
    // sparse × dense mixed multiply
    val b = rand(10, 6, 42)
    val db = DsArray.fromBreeze(sc, b, 4, 3)
    assert(maxAbs((a %*% db).collect() - dense * b) < 1e-10)
    // O(nnz²)-per-row gram twin
    val coo = (0 until 30).map { i =>
      val nz = (0 until 10).filter(j => dense(i, j) != 0.0).toArray
      (nz, nz.map(j => dense(i, j)))
    }
    val g = Decompositions.gramSparse(sc.parallelize(coo), 10)
    assert(maxAbs(g - dense.t * dense) < 1e-10)
  }

  test("sparse-in → sparse-out: slice, zero-preserving map, hadamard") {
    import org.apache.spark.mllib.linalg.SparseMatrix
    val rng = new java.util.Random(43)
    val entries = for {
      i <- 0 until 40; j <- 0 until 12 if rng.nextDouble() < 0.15
    } yield (i.toLong, j.toLong, rng.nextGaussian())
    val dense = BDM.zeros[Double](40, 12)
    entries.foreach { case (i, j, v) => dense(i.toInt, j.toInt) = v }
    val a = DsArray.fromCOO(sc.parallelize(entries), 40, 12, 8, 4)
    def allSparse(x: DsArray, what: String): Unit =
      assert(x.bm.blocks.collect().forall(_._2.isInstanceOf[SparseMatrix]),
        s"$what densified its tiles")
    // zero-preserving elementwise ops keep the tile structure
    val scaled = a * 2.5
    allSparse(scaled, "scale")
    assert(maxAbs(scaled.collect() - dense * 2.5) < 1e-12)
    val powed = a ** 2
    allSparse(powed, "pow")
    assert(maxAbs(powed.collect() - dense.map(x => x * x)) < 1e-12)
    // non-zero-preserving op fills the tile — must densify, values right
    val exped = a.exp
    assert(maxAbs(exped.collect() - dense.map(math.exp)) < 1e-12)
    // hadamard: sparse ∘ sparse and sparse ∘ dense stay sparse
    val had = a.hadamard(a)
    allSparse(had, "hadamard sparse∘sparse")
    assert(maxAbs(had.collect() - (dense *:* dense)) < 1e-12)
    val d2 = DsArray.fromBreeze(sc, rand(40, 12, 44), 8, 4)
    val hadMixed = a.hadamard(d2)
    allSparse(hadMixed, "hadamard sparse∘dense")
    assert(maxAbs(hadMixed.collect() - (dense *:* d2.collect())) < 1e-12)
    // slicing keeps tiles sparse via the COO path
    val sliced = a.sliceRows(5, 29)
    allSparse(sliced, "sliceRows")
    assert(maxAbs(sliced.collect() - dense(5 until 29, ::)) < 1e-12)
    val s2 = a.slice2D(3, 31, 2, 10)
    allSparse(s2, "slice2D")
    assert(maxAbs(s2.collect() - dense(3 until 31, 2 until 10)) < 1e-12)
    val idx = Seq(7L, 3L, 7L, 20L)
    val sel = a.selectRows(idx)
    allSparse(sel, "selectRows")
    idx.zipWithIndex.foreach { case (ri, k) =>
      assert(maxAbs(sel.collect()(k, ::).t.toDenseMatrix -
        dense(ri.toInt, ::).t.toDenseMatrix) < 1e-12)
    }
    // the hint survives transpose and composed zero-preserving ops
    assert(a.transpose.sparseTiles && (a * 2.0).sliceRows(0, 10).sparseTiles)
    assert(!a.exp.sparseTiles)
  }

  test("non-zero-preserving map fills tiles ABSENT from a sparse grid") {
    // a single entry in tile (0,0) of a 2×2 grid: the other three tiles
    // mean zero, so exp must produce 1.0 there, not stay absent
    val a = DsArray.fromCOO(sc.parallelize(Seq((1L, 1L, 2.0))), 16, 16, 8, 8)
    assert(a.bm.blocks.count() == 1) // only the populated tile exists
    val e = a.exp.collect()
    val expect = BDM.tabulate(16, 16)((i, j) => if (i == 1 && j == 1) math.exp(2.0) else 1.0)
    assert(maxAbs(e - expect) < 1e-12)
    // zero-preserving map keeps the absent-tile economy
    assert((a * 3.0).bm.blocks.count() == 1)
  }

  test("libsvm loads into sparse tiles and grams correctly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-libsvm")
    try {
      val lines = Seq(
        "1 1:0.5 4:-1.25 7:2.0",
        "0 2:3.5 7:0.25",
        "1 1:-0.75 3:1.5",
        "0 5:0.125 6:-2.5 8:1.0")
      java.nio.file.Files.write(dir.resolve("data.txt"),
        String.join("\n", lines: _*).getBytes)
      val df = graft.sources.Sources.loadSvmlight(spark, dir.toString, numFeatures = 8)
      val a = DsArray.fromLibsvmDf(df, 2, 3)
      assert(a.rows == 4 && a.cols == 8)
      assert(a.bm.blocks.collect().forall(_._2.isInstanceOf[org.apache.spark.mllib.linalg.SparseMatrix]))
      val dense = BDM.zeros[Double](4, 8)
      // libsvm indices are 1-based
      dense(0, 0) = 0.5; dense(0, 3) = -1.25; dense(0, 6) = 2.0
      dense(1, 1) = 3.5; dense(1, 6) = 0.25
      dense(2, 0) = -0.75; dense(2, 2) = 1.5
      dense(3, 4) = 0.125; dense(3, 5) = -2.5; dense(3, 7) = 1.0
      assert(maxAbs(a.collect() - dense) < 1e-12)
      assert(maxAbs((a.transpose %*% a).collect() - dense.t * dense) < 1e-12)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("rechunk preserves contents") {
    val a = rand(11, 7, 8)
    val d = DsArray.fromBreeze(sc, a, 3, 3).rechunk(4, 7)
    assert(maxAbs(d.collect() - a) < 1e-12)
  }

  test("tsqr: A = Q·R, R upper-triangular positive-diagonal, Q orthonormal") {
    val p = 6
    val a = rand(200, p, 9)
    val rows = sc.parallelize((0 until a.rows).map(i => (i.toLong, a(i, ::).t.toArray)), 8)
    val (qRdd, r) = Decompositions.tsqr(rows, p)
    for (i <- 0 until p; j <- 0 until p) {
      if (j < i) assert(math.abs(r(i, j)) < 1e-10, s"R($i,$j) not zero")
      if (i == j) assert(r(i, i) > 0, s"R diagonal not positive")
    }
    val q = BDM.zeros[Double](a.rows, p)
    qRdd.collect().foreach { case (i, v) => q(i.toInt, ::) := BDV(v).t }
    assert(maxAbs(q * r - a) < 1e-8)
    assert(maxAbs(q.t * q - BDM.eye[Double](p)) < 1e-8)
  }

  test("pad / removeLastRows / removeLastCols (data.util surface)") {
    val a = rand(11, 7, 23)
    val d = DsArray.fromBreeze(sc, a, 4, 3)
    // bottom+right pad past the regular block size (grows the grid —
    // the reference raises NotImplementedError there; we must not)
    val p = d.pad(6, 5, value = 2.5)
    assert(p.rows == 17 && p.cols == 12)
    val pc = p.collect()
    assert(maxAbs(pc(0 until 11, 0 until 7) - a) < 1e-12)
    for (i <- 0 until 17; j <- 0 until 12 if i >= 11 || j >= 7)
      assert(pc(i, j) == 2.5, s"pad value at ($i,$j)")
    // pad is invertible by the remove_last surface
    val back = p.removeLastRows(6).removeLastCols(5)
    assert(back.rows == 11 && back.cols == 7)
    assert(maxAbs(back.collect() - a) < 1e-12)
    // zero-fill default
    assert(d.pad(1, 0).collect()(11, ::).t.toArray.forall(_ == 0.0))
  }

  test("tsqrQColumns: selected columns equal reduced Q's, orthonormal") {
    val p = 6
    val a = rand(200, p, 9)
    val rows = sc.parallelize((0 until a.rows).map(i => (i.toLong, a(i, ::).t.toArray)), 8)
    val idx = Seq(0, 2, 5)
    val (qFullRdd, rFull) = Decompositions.tsqr(rows, p)
    val (qSelRdd, rSel) = Decompositions.tsqrQColumns(rows, p, idx)
    assert(maxAbs(rSel - rFull) < 1e-12) // same R either way
    val qFull = BDM.zeros[Double](a.rows, p)
    qFullRdd.collect().foreach { case (i, v) => qFull(i.toInt, ::) := BDV(v).t }
    val qSel = BDM.zeros[Double](a.rows, idx.length)
    qSelRdd.collect().foreach { case (i, v) =>
      assert(v.length == idx.length)
      qSel(i.toInt, ::) := BDV(v).t
    }
    for (c <- idx.indices)
      assert(breeze.linalg.norm(qSel(::, c) - qFull(::, idx(c))) < 1e-10,
        s"selected column $c differs from reduced Q column ${idx(c)}")
    assert(maxAbs(qSel.t * qSel - BDM.eye[Double](idx.length)) < 1e-8)
  }

  test("fullQrColumns: complement columns match fullQr, orthonormal") {
    val m = 40; val n = 24
    val a = rand(m, n, 77)
    val rows = sc.parallelize((0 until m).map(i => (i.toLong, a(i, ::).t.toArray)), 4)
    val idx = Seq(1, 23, 30, 39) // spans economic + complement columns
    val (qAllRdd, rAll) = Decompositions.fullQr(rows, n, panelW = 8)
    val (qSelRdd, rSel) = Decompositions.fullQrColumns(rows, n, idx, panelW = 8)
    assert(maxAbs(rSel - rAll) < 1e-12)
    val qAll = BDM.zeros[Double](m, m)
    qAllRdd.collect().foreach { case (i, v) => qAll(i.toInt, ::) := BDV(v).t }
    val qSel = BDM.zeros[Double](m, idx.length)
    qSelRdd.collect().foreach { case (i, v) => qSel(i.toInt, ::) := BDV(v).t }
    for (c <- idx.indices)
      assert(breeze.linalg.norm(qSel(::, c) - qAll(::, idx(c))) < 1e-8)
    assert(maxAbs(qSel.t * qSel - BDM.eye[Double](idx.length)) < 1e-8)
    // economic-only selection routes through the cheap path and still
    // agrees with the full factorization's columns
    val cheapIdx = Seq(0, 7, 23)
    val (qChRdd, _) = Decompositions.fullQrColumns(rows, n, cheapIdx, panelW = 8)
    val qCh = BDM.zeros[Double](m, cheapIdx.length)
    qChRdd.collect().foreach { case (i, v) => qCh(i.toInt, ::) := BDV(v).t }
    for (c <- cheapIdx.indices)
      assert(breeze.linalg.norm(qCh(::, c) - qAll(::, cheapIdx(c))) < 1e-8)
  }

  test("tsqrRComplete: m×n with top block R, zeros below; Qfull·Rc = A") {
    val m = 40; val n = 10
    val a = rand(m, n, 31)
    val rows = sc.parallelize((0 until m).map(i => (i.toLong, a(i, ::).t.toArray)), 4)
    val (_, rRed) = Decompositions.tsqr(rows, n)
    val rcRows = Decompositions.tsqrRComplete(rows, n).collect()
    assert(rcRows.length == m)
    val rc = BDM.zeros[Double](m, n)
    rcRows.foreach { case (i, v) => rc(i.toInt, ::) := BDV(v).t }
    assert(maxAbs(rc(0 until n, ::) - rRed) < 1e-12)
    assert(maxAbs(rc(n until m, ::)) < 1e-15)
    val (qRows, _) = Decompositions.fullQr(rows, n, panelW = 8)
    val q = BDM.zeros[Double](m, m)
    qRows.collect().foreach { case (i, v) => q(i.toInt, ::) := BDV(v).t }
    assert(maxAbs(q * rc - a) < 1e-8)
  }

  test("fullQr: Q m×m orthogonal, A = Q·[R;0], R upper-triangular") {
    val m = 40; val n = 24
    val a = rand(m, n, 77)
    val rows = sc.parallelize((0 until m).map(i => (i.toLong, a(i, ::).t.toArray)), 4)
    val (qRows, r) = Decompositions.fullQr(rows, n, panelW = 8)
    val q = BDM.zeros[Double](m, m)
    qRows.collect().foreach { case (i, v) =>
      assert(v.length == m)
      for (j <- 0 until m) q(i.toInt, j) = v(j)
    }
    // orthogonality of the FULL m×m Q
    assert(maxAbs(q.t * q - BDM.eye[Double](m)) < 1e-8)
    // R upper triangular
    for (i <- 0 until n; j <- 0 until i) assert(r(i, j) == 0.0)
    // reconstruction from the first n columns
    assert(maxAbs(q(::, 0 until n) * r - a) < 1e-8)
    // positive diagonal (tsqr sign convention per panel)
    for (i <- 0 until n) assert(r(i, i) > 0.0)
  }

  test("svd singular values match Breeze") {
    val p = 8; val k = 4
    val a = rand(300, p, 10)
    val rows = sc.parallelize((0 until a.rows).map(i => (i.toLong, a(i, ::).t.toArray)), 8)
    val (_, s, _) = Decompositions.svd(rows, p, k)
    val sLocal = bsvd.reduced(a).singularValues
    for (i <- 0 until k) assert(math.abs(s(i) - sLocal(i)) < 1e-6)
  }

  test("randomized svd approximates dominant singular values") {
    val p = 10; val k = 3
    // construct a matrix with a decaying spectrum
    val u = rand(400, p, 11); val base = rand(p, p, 12)
    val scales = BDV((0 until p).map(i => math.pow(0.5, i)).toArray)
    val a = u * breeze.linalg.diag(scales) * base
    val rows = sc.parallelize((0 until a.rows).map(i => (i.toLong, a(i, ::).t.toArray)), 8)
    val (s, _) = Decompositions.randomizedSvd(rows, p, k)
    val sLocal = bsvd.reduced(a).singularValues
    for (i <- 0 until k)
      assert(math.abs(s(i) - sLocal(i)) / sLocal(i) < 0.05,
        s"sv $i: ${s(i)} vs ${sLocal(i)}")
  }

  test("gram = XᵀX") {
    val p = 5
    val a = rand(150, p, 13)
    val rows = sc.parallelize((0 until a.rows).map(i => a(i, ::).t.toArray), 8)
    assert(maxAbs(Decompositions.gram(rows, p) - a.t * a) < 1e-8)
  }

  test("cholesky of the distributed gram: LLᵀ = G, lower-triangular, diag > 0") {
    val p = 6
    val a = rand(200, p, 29)
    val rows = sc.parallelize((0 until a.rows).map(i => a(i, ::).t.toArray), 8)
    val g = Decompositions.gram(rows, p)
    val l = breeze.linalg.cholesky(g)
    assert(maxAbs(l * l.t - g) < 1e-8, "reconstruction")
    for (i <- 0 until p; j <- i + 1 until p)
      assert(l(i, j) == 0.0, s"strictly lower: l($i,$j)")
    for (i <- 0 until p) assert(l(i, i) > 0.0, s"positive diag at $i")
  }

  test("embeddingDrift: full pair table, nonnegative, exact on a hand pair") {
    // formula exactness: centroids [1,2] (n=2) vs [3,1] (n=3) → dist² 5
    val (sa, na) = (Seq(2L, 4L).map(_ * 1000000), 2L)
    val (sb, nb) = (Seq(9L, 3L).map(_ * 1000000), 3L)
    val num = sa.zip(sb).map { case (a, b) =>
      val d = BigInt(a) * nb - BigInt(b) * na; d * d }.sum
    assert(num / (BigInt(na) * na * nb * nb * 1000000) == BigInt(5000000L))
    // operator invariants on the gate data: all C(10,2) ordered pairs,
    // strictly positive drift (distinct random clusters), counts carried
    val rows = LinalgQueries.embeddingDrift(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 45, s"${rows.length}")
    rows.foreach { r =>
      assert(r.getInt(0) < r.getInt(1), "ordered pairs only")
      assert(r.getLong(4) > 0L, s"drift must be positive: $r")
    }
  }

  test("hadamard / sliceRows / deleteRow / concat") {
    val a = rand(10, 6, 20); val b = rand(10, 6, 21)
    val da = DsArray.fromBreeze(sc, a, 4, 3)
    val db = DsArray.fromBreeze(sc, b, 3, 2)
    assert(maxAbs(da.hadamard(db).collect() - (a *:* b)) < 1e-12)
    assert(maxAbs(da.sliceRows(2, 7).collect() - a(2 to 6, ::).copy) < 1e-12)
    val del = da.deleteRow(3).collect()
    val expDel = BDM.vertcat(a(0 to 2, ::).copy, a(4 to 9, ::).copy)
    assert(maxAbs(del - expDel) < 1e-12)
    assert(maxAbs(da.concatRows(db).collect() - BDM.vertcat(a, b)) < 1e-12)
    assert(maxAbs(da.concatCols(db).collect() - BDM.horzcat(a, b)) < 1e-12)
  }

  test("applyAlongAxis: axis-0 column sums and axis-1 row norms") {
    val a = rand(30, 5, 22)
    val da = DsArray.fromBreeze(sc, a, 7, 5)
    val colSum = da.applyAlongAxis(0)(
      m => breeze.linalg.sum(m(::, breeze.linalg.*)).t, _ + _).collect()
    val expCol = breeze.linalg.sum(a(::, breeze.linalg.*)).t
    for (j <- 0 until 5) assert(math.abs(colSum(0, j) - expCol(j)) < 1e-10)
    val rowNorm = da.applyAlongAxis(1)(m =>
      breeze.linalg.DenseVector(breeze.linalg.norm(m.t.toDenseVector))).collect()
    for (i <- 0 until 30)
      assert(math.abs(rowNorm(i, 0) - breeze.linalg.norm(a(i, ::).t)) < 1e-10)
  }

  test("setElement / setColumn rebuild only the touched tiles") {
    val a = rand(10, 6, 31)
    val da = DsArray.fromBreeze(sc, a, 4, 3)
    val e = da.setElement(7, 4, 99.5).collect()
    val expE = a.copy; expE(7, 4) = 99.5
    assert(maxAbs(e - expE) < 1e-12)
    // column write across all row blocks (irregular edge block included)
    val vals = (0L until 10L).map(i => i -> (i * 0.5)).toMap
    val c = da.setColumn(2, vals).collect()
    val expC = a.copy
    for (i <- 0 until 10) expC(i, 2) = i * 0.5
    assert(maxAbs(c - expC) < 1e-12)
    // partial column write leaves unlisted rows untouched
    val p = da.setColumn(5, Map(0L -> -1.0, 9L -> -2.0)).collect()
    val expP = a.copy; expP(0, 5) = -1.0; expP(9, 5) = -2.0
    assert(maxAbs(p - expP) < 1e-12)
    intercept[Exception](da.setElement(10, 0, 1.0))
  }
}
