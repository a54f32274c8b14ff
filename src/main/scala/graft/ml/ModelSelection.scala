package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Model selection (reference: dislib/model_selection — _split.py
  * train_test_split/KFold, _search.py GridSearchCV/RandomizedSearchCV).
  *
  * Grid search fits ALL (candidate × fold) pairs concurrently as
  * independent Spark jobs from a driver-side thread pool — the exact
  * topology of the reference's fit-all-then-sync (_search.py:60-136),
  * with the FAIR-scheduler pool playing COMPSs' task queue. */
object ModelSelection {

  /** Seeded random split preserving row pairing (train_test_split,
    * _split.py:14-76). */
  def trainTestSplit(df: DataFrame, testSize: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(tr, te) = df.randomSplit(Array(1.0 - testSize, testSize), seed)
    (tr, te)
  }

  /** Deterministic hash K-fold: fold id from a stable hash of idCol —
    * reproducible across engines and cluster sizes (KFold,
    * _split.py:104-195; contiguous folds don't survive repartitioning,
    * hash folds do). */
  def kfold(df: DataFrame, idCol: String, k: Int): Seq[(DataFrame, DataFrame)] = {
    val withFold = df.withColumn("__fold",
      pmod(conv(substring(md5(col(idCol).cast("string")), 1, 14), 16, 10)
        .cast("long"), lit(k)))
    (0 until k).map(f =>
      (withFold.filter(col("__fold") =!= f).drop("__fold"),
        withFold.filter(col("__fold") === f).drop("__fold")))
  }

  final case class GridResult[P](params: P, meanScore: Double, foldScores: Seq[Double])

  /** Exhaustive grid × k-fold; all candidates fit concurrently.
    * `score` higher-is-better. */
  def gridSearch[P](df: DataFrame, idCol: String, grid: Seq[P], folds: Int,
      fitScore: (DataFrame, DataFrame, P) => Double,
      parallelism: Int = 4): Seq[GridResult[P]] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val foldDfs = kfold(df.cache(), idCol, folds)
      val futures = grid.map { p =>
        Future {
          val scores = foldDfs.map { case (tr, te) => fitScore(tr, te, p) }
          GridResult(p, scores.sum / scores.size, scores)
        }
      }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      df.unpersist(false)
      results.sortBy(-_.meanScore)
    } finally pool.shutdown()
  }

  /** Randomized search: sample `n` candidates deterministically. */
  def randomizedSearch[P](df: DataFrame, idCol: String, sampler: java.util.Random => P,
      n: Int, folds: Int, fitScore: (DataFrame, DataFrame, P) => Double,
      seed: Long = 42, parallelism: Int = 4): Seq[GridResult[P]] = {
    val rng = new java.util.Random(seed)
    val grid = Seq.fill(n)(sampler(rng))
    gridSearch(df, idCol, grid, folds, fitScore, parallelism)
  }
}
