package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Deterministic class-balanced oversampling — balance every class to
    * the majority count T: rows rank 0..n−1 inside their class by
    * portable hash (tie: id), and row r replicates ⌊T/n⌋ + (r < T mod n)
    * times, so the resampled multiset is engine-exact (no RNG) and any
    * two runs — or engines — agree on WHICH rows gained copies. The gate
    * pins the full assignment via an id-weighted copy checksum.
    *
    * Scale: one count-by-class rollup (broadcast back), one rank window
    * partitioned BY CLASS — each class sorts independently, so the plan
    * never single-partitions; a class too hot for one window partition
    * would switch to the hash-bin rank trick noted inline. */
  def classBalance(df: DataFrame, labelCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(labelCol).agg(count(lit(1)).as("n_orig"))
    val target = counts.agg(max("n_orig").as("t"))
    val ranked = df.select(col(labelCol), col(idCol),
        graft.functions.TextFns.hash56(col(idCol).cast("string")).as("hr"))
      .withColumn("r", row_number().over(
        Window.partitionBy(labelCol).orderBy(col("hr"), col(idCol))) - 1)
    ranked.join(broadcast(counts), labelCol).crossJoin(broadcast(target))
      .withColumn("copies",
        expr("t DIV n_orig") + when(col("r") < expr("t % n_orig"), 1L).otherwise(0L))
      .groupBy(labelCol)
      .agg(first("n_orig").as("n_orig"),
        sum("copies").as("n_after"),
        max("copies").as("max_copies"),
        sum(col("copies") * (col(idCol) % 1000003L)).as("copies_check"))
      .orderBy(labelCol)
  }

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
      results.sortBy(-_.meanScore)
    } finally {
      pool.shutdown()
      df.unpersist(false) // even when a candidate's fit throws
    }
  }

  /** Randomized search: sample `n` candidates deterministically. */
  def randomizedSearch[P](df: DataFrame, idCol: String, sampler: java.util.Random => P,
      n: Int, folds: Int, fitScore: (DataFrame, DataFrame, P) => Double,
      seed: Long = 42, parallelism: Int = 4): Seq[GridResult[P]] = {
    val rng = new java.util.Random(seed)
    val grid = Seq.fill(n)(sampler(rng))
    gridSearch(df, idCol, grid, folds, fitScore, parallelism)
  }

  /** Simulation grid search (reference: dislib/model_selection/
    * _simulation.py:11-213 — exhaustive grid over an arbitrary simulation
    * callable, not an estimator; all candidates run concurrently, ranked
    * by output, higher-is-better). */
  def simulationSearch[P](grid: Seq[P], simulate: P => Double,
      parallelism: Int = 4): Seq[(P, Double)] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = grid.map(p => Future((p, simulate(p))))
      Await.result(Future.sequence(futures), Duration.Inf).sortBy(-_._2)
    } finally pool.shutdown()
  }

  val RidgeLambdas = Seq(0.0, 10.0, 1000.0)
  val RidgeFolds = 3

  /** Gate query: exhaustive grid × 3-fold CV of a closed-form ridge
    * regression (l_extendedprice/1000 ~ l_quantity), GridSearchCV
    * semantics (all candidates concurrent, reference _search.py:60-136).
    *
    * Scale design: normal-equation sufficient statistics (n, Σx, Σy,
    * Σx², Σxy, Σy²) are additive, so ONE distributed pass grouped by
    * fold yields every train split (train = total − test fold) AND every
    * validation MSE in closed form — the whole grid × fold matrix costs
    * one scan at 100 TB instead of candidates × folds × 2 scans. The
    * DuckDB oracle recomputes with two-pass regr_* aggregates; the
    * algebraic forms agree far below the output rounding. */
  def gridSearchQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("rid"),
        col("l_quantity").cast("double").as("x"),
        (col("l_extendedprice") / 1000).as("y"))
    // identical fold hash to kfold()
    val withFold = li.withColumn("fold",
      pmod(graft.functions.TextFns.hash56(col("rid")), lit(RidgeFolds)))
    val m = withFold.groupBy("fold")
      .agg(count(lit(1)).cast("double").as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .collect().map(r => r.getLong(0) ->
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val total = Array.tabulate(6)(i => m.values.map(_(i)).sum)
    def mseOf(lambda: Double, f: Long): Double = {
      val te = m(f)
      val tr = Array.tabulate(6)(i => total(i) - te(i))
      val (n, sx, sy, sxx, sxy) = (tr(0), tr(1), tr(2), tr(3), tr(4))
      val (mx, my) = (sx / n, sy / n)
      val b = (sxy - sx * sy / n) / ((sxx - sx * sx / n) + lambda)
      val a = my - b * mx
      // E[(y - a - b x)^2] from the test fold's raw moments
      (te(5) + te(0) * a * a + b * b * te(3) + 2 * a * b * te(1)
        - 2 * a * te(2) - 2 * b * te(4)) / te(0)
    }
    // all candidates scored concurrently (GridSearchCV topology); each
    // candidate's folds are driver arithmetic over the broadcast moments
    val ranked = simulationSearch[Double](RidgeLambdas,
      l => -(0L until RidgeFolds.toLong).map(mseOf(l, _)).sum / RidgeFolds)
    val spark2 = spark
    import spark2.implicits._
    ranked.flatMap { case (l, _) =>
      (0L until RidgeFolds.toLong).map { f =>
        (l, f, BigDecimal(mseOf(l, f))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toDF("lambda", "fold", "mse").orderBy("lambda", "fold")
  }

  val gridSearchOracle: String =
    s"""WITH d AS (SELECT l_quantity::DOUBLE AS x, l_extendedprice / 1000 AS y,
      |    ${graft.functions.TextFns.hash56Sql("l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR")} % 3 AS fold
      |  FROM lineitem),
      |l(lambda) AS (VALUES (0.0::DOUBLE), (10.0::DOUBLE), (1000.0::DOUBLE)),
      |st AS (SELECT f.fold, avg(d.x) AS mx, avg(d.y) AS my,
      |    regr_sxx(d.y, d.x) AS sxx, regr_sxy(d.y, d.x) AS sxy
      |  FROM (SELECT DISTINCT fold FROM d) f JOIN d ON d.fold <> f.fold
      |  GROUP BY f.fold),
      |co AS (SELECT st.fold, l.lambda, sxy / (sxx + l.lambda) AS b,
      |    my - sxy / (sxx + l.lambda) * mx AS a
      |  FROM st CROSS JOIN l)
      |SELECT co.lambda, co.fold, round(avg(pow(d.y - co.a - co.b * d.x, 2)), 4) AS mse
      |FROM co JOIN d ON d.fold = co.fold
      |GROUP BY co.lambda, co.fold ORDER BY 1, 2""".stripMargin
}
