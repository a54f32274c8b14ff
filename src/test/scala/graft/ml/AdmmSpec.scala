package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Consensus-ADMM Lasso vs MLlib's OWLQN L1 solver on the same problem
  * (reference test style: optimizer output cross-checked against an
  * independent solver, tests/test_lasso.py / test_admm.py). */
class AdmmSpec extends SparkSpec {

  test("consensus ADMM lasso agrees with OWLQN lasso coefficients") {
    val rng = new java.util.Random(7)
    val n = 2000
    // y = 3*x0 + 0*x1 - 2*x2 + noise — lasso should zero x1
    val data = Seq.tabulate(n) { i =>
      val x = Array.fill(3)(rng.nextGaussian())
      val y = 3.0 * x(0) - 2.0 * x(2) + 0.1 * rng.nextGaussian()
      (i.toLong, x(0), x(1), x(2), y)
    }
    val spark2 = spark
    import spark2.implicits._
    val df = data.toDF("id", "x0", "x1", "x2", "y")

    val lambda = 50.0
    val stats = Admm.blockStats(df, "id", Seq("x0", "x1", "x2"), "y", blocks = 4)
    val z = Admm.consensusLasso(stats, p = 3, lambda, rho = 10.0, iters = 60)

    // OWLQN reference: minimize (1/2n)||Xw-y||^2 + (lambda/n)||w||_1
    // (MLlib normalizes by n; scale regParam to match our objective)
    val ml = new org.apache.spark.ml.regression.LinearRegression()
      .setElasticNetParam(1.0).setRegParam(lambda / n).setMaxIter(200)
      .setFitIntercept(false).setStandardization(false)
      .setLabelCol("y").setFeaturesCol("features")
      .fit(df.withColumn("features",
        array_to_vector(array(col("x0"), col("x1"), col("x2")))))
    val ref = ml.coefficients.toArray

    for (i <- 0 until 3)
      assert(math.abs(z(i) - ref(i)) < 0.05,
        s"coef $i: admm=${z(i)} owlqn=${ref(i)}")
    assert(math.abs(z(1)) < 0.05, s"x1 should be shrunk toward 0, got ${z(1)}")
  }

  test("simulationSearch ranks candidates by simulation output") {
    val r = ModelSelection.simulationSearch[Int](Seq(1, 5, 3),
      p => -math.abs(p - 5).toDouble)
    assert(r.head._1 == 5 && r.head._2 == 0.0)
    assert(r.map(_._1) == Seq(5, 3, 1))
  }
}
