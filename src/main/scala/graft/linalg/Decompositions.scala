package graft.linalg

import breeze.linalg.{qr => bqr, svd => bsvd, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.mllib.linalg.{DenseMatrix, Matrices, Vectors}
import org.apache.spark.mllib.linalg.distributed.{IndexedRow, IndexedRowMatrix, RowMatrix}
import org.apache.spark.rdd.RDD

/** Distributed decompositions (reference: SURVEY.md §2.8 —
  * qr/base.py, tsqr/base.py, math/base.py svd, lanczos, randomsvd).
  *
  * Design: tall-skinny inputs (n ≫ p, the practical case for the
  * reference's QR/SVD users) via communication-avoiding TSQR —
  * per-partition local QR, then a tree reduction of R factors
  * (`treeReduce`, the exact analog of dislib's pairwise R-merge tree,
  * tsqr/base.py:88-200). Q is reconstructed block-wise as A·R⁻¹ when
  * requested. Wide SVD rides RowMatrix.computeSVD (ARPACK Lanczos — the
  * same algorithm family as dislib's lanczos_svd).
  *
  * Scale: TSQR moves only p×p R factors between executors (p ≤ a few
  * hundred), never row data — the 100 TB plan is one scan + log(parts)
  * tiny reductions.
  */
object Decompositions {

  /** Per-partition R factors tree-merged: R of the stacked [R1; R2] QR. */
  private def tsqrR(rows: RDD[Array[Double]], p: Int): BDM[Double] = {
    val partR = rows.mapPartitions { it =>
      val data = it.toArray
      if (data.isEmpty) Iterator.empty
      else {
        val m = new BDM(p, data.length, data.flatten).t // rows × p
        Iterator(bqr.reduced(m.toDenseMatrix).r)
      }
    }
    partR.treeReduce({ (r1, r2) =>
      bqr.reduced(BDM.vertcat(r1, r2)).r
    }, depth = 3)
  }

  /** Economic QR of a tall-skinny matrix given as an RDD of dense rows.
    * Returns (Q as indexed rows, R p×p) with R upper-triangular and
    * positive diagonal (deterministic sign convention). */
  def tsqr(rows: RDD[(Long, Array[Double])], p: Int): (RDD[(Long, Array[Double])], BDM[Double]) = {
    val r0 = tsqrR(rows.map(_._2), p)
    // sign-normalize: flip rows of R with negative diagonal
    val signs = BDV.tabulate(p)(i => if (r0(i, i) < 0) -1.0 else 1.0)
    val r = BDM.tabulate(p, p)((i, j) => r0(i, j) * signs(i))
    val rInv = breeze.linalg.inv(r)
    val rInvB = rows.sparkContext.broadcast(rInv)
    val q = rows.mapValues { v =>
      val x = new BDM(1, p, v) * rInvB.value
      x.toArray
    }
    (q, r)
  }

  /** Truncated SVD via RowMatrix.computeSVD (ARPACK — reference
    * lanczos/base.py:314-455 maps here; same iterative Krylov family). */
  def svd(rows: RDD[(Long, Array[Double])], p: Int, k: Int):
      (RDD[(Long, Array[Double])], BDV[Double], BDM[Double]) = {
    val rm = new RowMatrix(rows.map { case (_, v) => Vectors.dense(v) })
    val s = rm.computeSVD(k, computeU = false)
    val v = new BDM(p, s.V.numCols, s.V.toArray)
    val sv = BDV(s.s.toArray)
    // U = A V S^-1 (stable for non-tiny singular values)
    val vB = rows.sparkContext.broadcast(v)
    val svB = rows.sparkContext.broadcast(sv)
    val u = rows.mapValues { a =>
      val proj = new BDM(1, p, a) * vB.value
      (0 until k).map(j => proj(0, j) / svB.value(j)).toArray
    }
    (u, sv, v)
  }

  /** Randomized SVD (Halko sketch — reference randomsvd/base.py:118-333):
    * Y = (A·Aᵀ)^q A·Ω (Gaussian p×(k+over), q power iterations for
    * flat-spectrum accuracy), Q = tsqr(Y), B = Qᵀ·A (small), local SVD of
    * B; singular vectors lifted back. 2q+2 scans total; every shuffle
    * payload is ≤ p×l doubles. */
  def randomizedSvd(rows: RDD[(Long, Array[Double])], p: Int, k: Int,
      oversample: Int = 8, powerIters: Int = 2, seed: Long = 42): (BDV[Double], BDM[Double]) = {
    val l = math.min(p, k + oversample)
    val rng = new java.util.Random(seed)
    val omega = BDM.fill(p, l)(rng.nextGaussian())
    val sc = rows.sparkContext
    val oB = sc.broadcast(omega)
    var y = rows.mapValues(v => (new BDM(1, p, v) * oB.value).toArray)
    for (_ <- 0 until powerIters) {
      // Z = Aᵀ·Y (p×l, treeAggregate of outer products), Y ← A·Z
      val z = rows.zip(y).map { case ((_, a), (_, yi)) => (a, yi) }
        .treeAggregate(BDM.zeros[Double](p, l))(
          seqOp = { case (acc, (a, yi)) =>
            var i = 0
            while (i < p) {
              var j = 0
              while (j < l) { acc(i, j) += a(i) * yi(j); j += 1 }
              i += 1
            }
            acc
          }, combOp = _ + _, depth = 2)
      // orthonormalize Z locally to keep the power iteration stable
      val zq = bqr.reduced(z).q
      val zB = sc.broadcast(zq)
      y = rows.mapValues(v => (new BDM(1, p, v) * zB.value).toArray)
    }
    val (q, _) = tsqr(y, l)
    // B = Qᵀ A : l×p, accumulated as sum of outer(q_i, a_i).
    // zip (not join): q is a mapValues chain over rows, so partitioning
    // and per-partition order are identical — zero shuffle.
    val joined = q.zip(rows).map { case ((_, qi), (_, ai)) => (qi, ai) }
    val b = joined.treeAggregate(BDM.zeros[Double](l, p))(
      seqOp = { case (acc, (qi, ai)) =>
        var i = 0
        while (i < l) {
          var j = 0
          while (j < p) { acc(i, j) += qi(i) * ai(j); j += 1 }
          i += 1
        }
        acc
      },
      combOp = _ + _, depth = 2)
    val s = bsvd.reduced(b)
    (s.singularValues(0 until k), s.Vt(0 until k, ::).t)
  }

  /** Full Gramian Xᵀ X via treeAggregate (reference: the partial-gram
    * pattern of linear/base.py:274-328 and pca/base.py:316-373). */
  def gram(rows: RDD[Array[Double]], p: Int): BDM[Double] =
    rows.treeAggregate(BDM.zeros[Double](p, p))(
      seqOp = { (acc, v) =>
        var i = 0
        while (i < p) {
          var j = 0
          while (j <= i) { acc(i, j) += v(i) * v(j); j += 1 }
          i += 1
        }
        acc
      },
      combOp = _ + _, depth = 2) match {
      case m =>
        // mirror lower triangle
        var i = 0
        while (i < p) { var j = i + 1; while (j < p) { m(i, j) = m(j, i); j += 1 }; i += 1 }
        m
    }

  /** Sparse Gramian Xᵀ X from COO rows (reference: dislib's CSR arrays —
    * CSVM/ALS bench on sparse ijcnn1/Netflix, mn5/tests/csvm.py:18-26).
    * Per-row cost is nnz², not p² — the point of sparse storage; the
    * accumulator stays a dense p×p (p is feature count, small next to
    * rows). */
  def gramSparse(rows: RDD[(Array[Int], Array[Double])], p: Int): BDM[Double] =
    rows.treeAggregate(BDM.zeros[Double](p, p))(
      seqOp = { case (acc, (idx, vals)) =>
        var a = 0
        while (a < idx.length) {
          var b = 0
          while (b <= a) {
            acc(idx(a), idx(b)) += vals(a) * vals(b)
            b += 1
          }
          a += 1
        }
        acc
      },
      combOp = _ + _, depth = 2) match {
      case m =>
        var i = 0
        while (i < p) { var j = i + 1; while (j < p) { m(i, j) = m(j, i); j += 1 }; i += 1 }
        m
    }
}
