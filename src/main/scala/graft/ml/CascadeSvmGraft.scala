package graft.ml

import graft.Tables
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cascade SVM (reference: dislib/classification/csvm/base.py:24-402,
  * Graf et al. 2005): per-partition local SVM → support vectors merged
  * arity-wise up a tree with retraining → optional feedback iterations
  * with convergence on the weight-vector delta.
  *
  * Local solver: dual coordinate descent for C-SVC (hinge loss) with
  * linear or RBF kernel — deterministic (fixed sweep order), no RNG.
  * dislib trains sklearn's SMO inside each task (`_train`,
  * csvm/base.py:574-596); dual CD solves the same dual problem.
  *
  * Scale: only support vectors move between nodes (the cascade's whole
  * point) — each treeReduce level ships ≤ 2·(SV count) rows; the full
  * data is scanned once per feedback iteration.
  */
object CascadeSvmGraft {
  sealed trait Kernel
  case object Linear extends Kernel
  final case class Rbf(gamma: Double) extends Kernel

  final case class Model(kernel: Kernel, c: Double,
      svX: Array[Array[Double]], svY: Array[Double], alphas: Array[Double]) {
    private def k(a: Array[Double], b: Array[Double]): Double = kernel match {
      case Linear => dotArr(a, b)
      case Rbf(g) =>
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        math.exp(-g * s)
    }
    def decision(x: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < svX.length) { s += alphas(i) * svY(i) * k(svX(i), x); i += 1 }
      s
    }
    def predict(x: Array[Double]): Double = if (decision(x) >= 0) 1.0 else -1.0
    /** Primal weights (linear kernel only) for convergence tracking. */
    def weights(p: Int): Array[Double] = {
      val w = new Array[Double](p)
      for (i <- svX.indices; j <- 0 until p) w(j) += alphas(i) * svY(i) * svX(i)(j)
      w
    }
  }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Deterministic cap on the local problem size (RBF path is O(n²·sweeps);
    * dislib bounds the same cost via block size). */
  val MaxLocal = 4000

  /** Dual coordinate descent on 0 ≤ α ≤ C (no bias term, as liblinear's
    * L1-loss dual; deterministic sweeps). Returns (x, y, α) for α > 0.
    * Linear kernel runs the O(n·p)-per-sweep primal-weights update;
    * RBF keeps a decision-value cache (O(n²) per sweep, size-capped). */
  def localSolve(xs0: Array[Array[Double]], ys0: Array[Double],
      c: Double, kernel: Kernel, sweeps: Int = 30):
      (Array[Array[Double]], Array[Double], Array[Double]) = {
    val (xs, ys) =
      if (xs0.length <= MaxLocal) (xs0, ys0)
      else (xs0.take(MaxLocal), ys0.take(MaxLocal))
    val n = xs.length
    if (n == 0) return (Array.empty, Array.empty, Array.empty)
    val alphas = new Array[Double](n)
    kernel match {
      case Linear =>
        val p = xs(0).length
        val w = new Array[Double](p)
        val kdiag = Array.tabulate(n)(i => dotArr(xs(i), xs(i)))
        var sweep = 0
        while (sweep < sweeps) {
          var i = 0
          while (i < n) {
            val grad = ys(i) * dotArr(w, xs(i)) - 1.0
            val old = alphas(i)
            val next = math.min(c, math.max(0.0, old - grad / math.max(kdiag(i), 1e-12)))
            val delta = next - old
            if (math.abs(delta) > 1e-12) {
              alphas(i) = next
              var j = 0
              while (j < p) { w(j) += delta * ys(i) * xs(i)(j); j += 1 }
            }
            i += 1
          }
          sweep += 1
        }
      case Rbf(g) =>
        def kf(i: Int, j: Int): Double = {
          var s = 0.0; var d = 0
          while (d < xs(i).length) { val t = xs(i)(d) - xs(j)(d); s += t * t; d += 1 }
          math.exp(-g * s)
        }
        val f = new Array[Double](n)
        var sweep = 0
        while (sweep < sweeps) {
          var i = 0
          while (i < n) {
            val grad = ys(i) * f(i) - 1.0
            val old = alphas(i)
            val next = math.min(c, math.max(0.0, old - grad))
            val delta = next - old
            if (math.abs(delta) > 1e-12) {
              alphas(i) = next
              var j = 0
              while (j < n) { f(j) += delta * ys(i) * kf(i, j); j += 1 }
            }
            i += 1
          }
          sweep += 1
        }
    }
    val keep = (0 until n).filter(alphas(_) > 1e-9)
    (keep.map(xs).toArray, keep.map(ys).toArray, keep.map(alphas).toArray)
  }

  type Sv = Array[(Long, Array[Double], Double)]

  /** Sort by stable id then solve — id order makes the dual-CD sweep
    * (and so the SV set) independent of treeReduce combine order.
    * localSolve keeps input order for kept rows, so ids re-align via a
    * prefix walk. Standalone (not a local def) so executor closures
    * capture only (c, kernel, sweeps). */
  private def solveSorted(rows: Sv, c: Double, kernel: Kernel,
      sweeps: Int): (Sv, Array[Double]) = {
    val s = rows.sortBy(_._1)
    val (sx, sy, al) = localSolve(s.map(_._2), s.map(_._3), c, kernel, sweeps)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
    var si = 0
    for (ki <- sx.indices) {
      while (!(s(si)._2.sameElements(sx(ki)) && s(si)._3 == sy(ki))) si += 1
      kept += s(si); si += 1
    }
    (kept.toArray, al)
  }

  /** Fit on RDD[(features, label±1)]; cascade_arity is the treeReduce
    * fan-in, maxIter the feedback loop count, tol the convergence delta
    * on primal weights (linear) / SV-set change (RBF). */
  def fit(data: RDD[(Array[Double], Double)], c: Double, kernel: Kernel,
      maxIter: Int = 3, tol: Double = 1e-3, sweeps: Int = 30): Model = {
    val p = data.first()._1.length
    // stable row ids: treeReduce's combine ORDER depends on task
    // scheduling, and dual-CD sweep order follows input order — sorting
    // each merge input by id makes the cascade fully deterministic.
    val withId = data.zipWithIndex().map { case ((x, y), i) => (i, x, y) }.cache()
    var feedback: Sv = Array.empty
    var model: Model = null
    var prevW: Array[Double] = null
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val fb = withId.sparkContext.broadcast(feedback)
      val partial = withId.mapPartitions { iter =>
        val local = (iter ++ fb.value.iterator).toArray
        Iterator(solveSorted(local, c, kernel, sweeps)._1)
      }
      val merged = partial.treeReduce({ (a, b) => solveSorted(a ++ b, c, kernel, sweeps)._1 }, depth = 3)
      val (svs, al) = solveSorted(merged, c, kernel, sweeps)
      model = Model(kernel, c, svs.map(_._2), svs.map(_._3), al)
      kernel match {
        case Linear =>
          val w = model.weights(p)
          if (prevW != null) {
            val d = math.sqrt(w.zip(prevW).map { case (a, b) => (a - b) * (a - b) }.sum)
            converged = d < tol * math.max(1.0, math.sqrt(w.map(x => x * x).sum))
          }
          prevW = w
        case _ =>
          converged = feedback.length == svs.length &&
            feedback.map(_._1).sameElements(svs.map(_._1))
      }
      feedback = svs
      it += 1
    }
    withId.unpersist(false)
    model
  }

  /** Gate query: RBF-kernel cascade on an XOR-shaped task over
    * embeddings dims 1–2 (quadrant parity around the medians, the
    * |xᵢ−medᵢ| ≤ 0.03 bands excluded) — not linearly separable, so this
    * exercises the kernel path end to end (reference kernel='rbf',
    * csvm/base.py:145-153). Deterministic (fixed sweeps, id-sorted
    * merges), and the banded task is RBF-interpolable, so the fitted
    * cascade classifies every kept row: confusion is exactly diagonal
    * and the DuckDB oracle replays the rule for the class counts. */
  def rbfQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x1"),
        element_at(col("embedding"), 2).cast("double").as("x2"))
    val med = e.agg(
      expr("percentile(x1, 0.5)"), expr("percentile(x2, 0.5)")).head()
    val (m1, m2) = (med.getDouble(0), med.getDouble(1))
    val data = e.rdd.flatMap { r =>
      val (x1, x2) = (r.getDouble(1), r.getDouble(2))
      if (math.abs(x1 - m1) <= 0.03 || math.abs(x2 - m2) <= 0.03) None
      else {
        val y = if ((x1 > m1) == (x2 > m2)) 1.0 else -1.0
        Some((Array(x1, x2), y))
      }
    }.cache()
    val m = fit(data, c = 100.0, Rbf(gamma = 40.0), maxIter = 3, sweeps = 60)
    val bc = data.sparkContext.broadcast(m)
    val confusion = data.map { case (x, y) =>
      ((y, bc.value.predict(x)), 1L)
    }.reduceByKey(_ + _).collect().sortBy(_._1)
    data.unpersist(false)
    val spark2 = spark
    import spark2.implicits._
    confusion.map { case ((t, pr), n) => (t, pr, n) }
      .toSeq.toDF("label", "predicted", "n")
      .orderBy("label", "predicted")
  }

  /** Gate query: linear CSVM on lineitem features with a
    * margin-separable data-derived rule (extendedprice is NOT learnable
    * from these features — unit price dominates it — so the gate task is
    * a fixed linear rule with the |margin| ≤ 0.03 band excluded; real-
    * data learning parity lives in EstimatorsSpec). Constant 1.0 feature
    * = bias (the dual has no intercept term). The kept rows are
    * separable with geometric margin ≥ 0.03/‖(1,2)‖, so the cascade at
    * large C classifies them all: diagonal confusion, oracle replays the
    * rule. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_quantity"), col("l_discount"), col("l_tax"))
    val data = li.rdd.flatMap { r =>
      val x = Array(r.getDouble(0) / 50.0, r.getDouble(1), r.getDouble(2), 1.0)
      val margin = x(0) + 2.0 * x(1) - 0.55
      if (math.abs(margin) <= 0.03) None
      else Some((x, if (margin > 0) 1.0 else -1.0))
    }.cache()
    val m = fit(data, c = 100.0, Linear, maxIter = 3, sweeps = 60)
    val bc = data.sparkContext.broadcast(m)
    val confusion = data.map { case (x, y) =>
      ((y, bc.value.predict(x)), 1L)
    }.reduceByKey(_ + _).collect().sortBy(_._1)
    data.unpersist(false)
    val spark2 = spark
    import spark2.implicits._
    confusion.map { case ((t, pr), n) => (t, pr, n) }
      .toSeq.toDF("label", "predicted", "n")
      .orderBy("label", "predicted")
  }

  /** DuckDB replay of the linear gate's rule (diagonal confusion). */
  val oracle: String =
    """SELECT CASE WHEN m > 0 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS label,
      |  CASE WHEN m > 0 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS predicted,
      |  count(*)::BIGINT AS n
      |FROM (SELECT l_quantity/50.0 + 2.0*l_discount - 0.55 AS m FROM lineitem)
      |WHERE abs(m) > 0.03
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** DuckDB replay of the RBF gate's quadrant-parity rule. quantile_cont
    * matches Spark's percentile interpolation; the excluded band keeps
    * FP noise away from the rule threshold. */
  val rbfOracle: String =
    """WITH pts AS (SELECT embedding[1]::DOUBLE AS x1, embedding[2]::DOUBLE AS x2
      |      FROM embeddings),
      |med AS (SELECT quantile_cont(x1, 0.5) AS m1, quantile_cont(x2, 0.5) AS m2 FROM pts)
      |SELECT CASE WHEN (x1 > m1) = (x2 > m2) THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS label,
      |  CASE WHEN (x1 > m1) = (x2 > m2) THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS predicted,
      |  count(*)::BIGINT AS n
      |FROM pts, med
      |WHERE abs(x1 - m1) > 0.03 AND abs(x2 - m2) > 0.03
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin
}
