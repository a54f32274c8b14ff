package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for CascadeSVM, NearestNeighbors, Daura, model selection. */
class EstimatorsSpec extends SparkSpec {

  test("CascadeSVM linear separates linearly separable data") {
    val rng = new java.util.Random(7)
    val data = Seq.tabulate(400) { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      val y = if (x(0) + 2 * x(1) > 0) 1.0 else -1.0
      (x, y)
    }
    val rdd = sc.parallelize(data, 4)
    val m = CascadeSvmGraft.fit(rdd, c = 10.0, CascadeSvmGraft.Linear, maxIter = 3)
    val acc = data.count { case (x, y) => m.predict(x) == y } / data.size.toDouble
    assert(acc > 0.97, s"linear CSVM accuracy $acc")
    assert(m.svX.length < data.size / 2, "support vectors should be a minority")
  }

  test("CascadeSVM rbf separates XOR data (not linearly separable)") {
    val rng = new java.util.Random(8)
    val data = Seq.tabulate(300) { _ =>
      val x = Array(rng.nextDouble() * 2 - 1, rng.nextDouble() * 2 - 1)
      val y = if (x(0) * x(1) > 0) 1.0 else -1.0
      (x, y)
    }
    val rdd = sc.parallelize(data, 4)
    val m = CascadeSvmGraft.fit(rdd, c = 10.0, CascadeSvmGraft.Rbf(2.0), maxIter = 2)
    val acc = data.count { case (x, y) => m.predict(x) == y } / data.size.toDouble
    assert(acc > 0.9, s"rbf CSVM accuracy $acc")
  }

  test("kneighbors returns exact nearest neighbors") {
    val rng = new java.util.Random(9)
    val pts = Array.fill(200)(Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()))
    val spark2 = spark
    import spark2.implicits._
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "v")
    val queries = df.filter(col("id") < 5)
    val got = Neighbors.kneighbors(df, queries, "id", "v", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (0 until 5).flatMap { q =>
      pts.indices.sortBy(j => (d2(pts(q), pts(j)), j)).take(4).zipWithIndex
        .map { case (j, r) => (q.toLong, r + 1, j.toLong) }
    }.toSet
    assert(got == expected)
  }

  test("daura clusters a hand-built distance structure") {
    // 3 tight groups on a line; cutoff bridges within groups only.
    // group A: 0,1,2 at x≈0; B: 3,4 at x≈10; C: 5 at x≈20
    val pts = Seq(
      (0L, Array(0.0)), (1L, Array(0.1)), (2L, Array(0.2)),
      (3L, Array(10.0)), (4L, Array(10.1)), (5L, Array(20.0)))
    val spark2 = spark
    import spark2.implicits._
    val df = pts.toDF("id", "v")
    val clusters = Neighbors.daura(df, "id", "v", cutoff = 0.5)
    // greedy: center 0 or 1 (max degree 3, tie → min id = 0? degrees:
    // 0↔{0,1,2}=3, 1↔{0,1,2}=3, 2↔{0,1,2}=3 → min id 0 wins)
    assert(clusters.head._1 == 0L && clusters.head._2.toSet == Set(0L, 1L, 2L))
    assert(clusters(1)._1 == 3L && clusters(1)._2.toSet == Set(3L, 4L))
    assert(clusters(2) == ((5L, Seq(5L))))
  }

  test("daura from a precomputed distance matrix agrees with the point API") {
    val pts = Seq(
      (0L, Array(0.0)), (1L, Array(0.1)), (2L, Array(0.2)),
      (3L, Array(10.0)), (4L, Array(10.1)), (5L, Array(20.0)))
    val spark2 = spark
    import spark2.implicits._
    val fromPoints = Neighbors.daura(pts.toDF("id", "v"), "id", "v", cutoff = 0.5)
    // the same structure as an explicit 6×6 distance ds-array (2×2 tiles
    // so the edge scan crosses block boundaries)
    val dm = breeze.linalg.DenseMatrix.tabulate[Double](6, 6)((i, j) =>
      math.abs(pts(i)._2(0) - pts(j)._2(0)))
    val dist = graft.linalg.DsArray.fromBreeze(sc, dm, 2, 2)
    val fromMatrix = Neighbors.dauraFromDistances(dist, cutoff = 0.5)
    assert(fromMatrix == fromPoints)
    assert(fromMatrix.head._1 == 0L && fromMatrix.head._2.toSet == Set(0L, 1L, 2L))
  }

  test("epsEdges matches brute force and plans a hash join, not all-pairs") {
    val rng = new java.util.Random(7)
    val pts = Seq.tabulate(80)(i =>
      (i.toLong, Array.fill(4)(rng.nextDouble()))) // 4-d: grid on 3, exact on all
    val spark2 = spark
    import spark2.implicits._
    val df = pts.toDF("id", "v")
    val edges = Neighbors.epsEdges(df, "id", "v", cutoff = 0.3)
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"edge build must be a bucketed equi-join, got:\n$plan")
    val got = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (for {
      a <- pts; b <- pts if d2(a._2, b._2) <= 0.3 * 0.3
    } yield (a._1, b._1)).toSet
    assert(got == expected)
  }

  test("gridSearch ranks KMeans k by inertia on blobby data") {
    val rng = new java.util.Random(10)
    val centers = Seq(Array(5.0, 5.0), Array(-5.0, 5.0), Array(0.0, -5.0))
    val data = Seq.tabulate(300) { i =>
      val c = centers(i % 3)
      (i.toLong, Array(c(0) + rng.nextGaussian() * 0.3, c(1) + rng.nextGaussian() * 0.3))
    }
    val spark2 = spark
    import spark2.implicits._
    val df = data.toDF("id", "v")
    val results = ModelSelection.gridSearch[Int](df, "id", Seq(1, 3), folds = 2,
      (train, test, k) => {
        val m = KMeansGraft.fit(train, "v", "id", k, maxIter = 5)
        // score = negative mean distance on held-out fold
        -test.withColumn("d", m.distCol(col("v")))
          .agg(avg("d")).head().getDouble(0)
      }, parallelism = 2)
    assert(results.head.params == 3, s"best k: ${results.map(r => (r.params, r.meanScore))}")
  }

  test("trainTestSplit partitions without loss") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 1000).toDF("x")
    val (tr, te) = ModelSelection.trainTestSplit(df, 0.25, seed = 3)
    assert(tr.count() + te.count() == 1000)
    assert(te.count() > 150 && te.count() < 350)
    // kfold covers everything exactly once
    val folds = ModelSelection.kfold(df, "x", 4)
    assert(folds.map(_._2.count()).sum == 1000)
    folds.foreach { case (a, b) => assert(a.count() + b.count() == 1000) }
  }

  test("standalone decision tree: perfectly separable blobs fit exactly, depth bounded") {
    val rng = new java.util.Random(13)
    val spark2 = spark
    import spark2.implicits._
    // two well-separated blobs in dim 0 → one split suffices: a lone
    // DecisionTreeClassifier must reach 100% train accuracy at depth 1-2
    // and stay a proper odd-node binary tree
    val df = Seq.tabulate(200) { i =>
      val label = i % 2
      (i.toLong, org.apache.spark.ml.linalg.Vectors.dense(
        label * 10.0 + rng.nextGaussian() * 0.3, rng.nextGaussian()),
        label.toDouble)
    }.toDF("id", "features", "label")
    val m = new org.apache.spark.ml.classification.DecisionTreeClassifier()
      .setMaxDepth(7).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features").fit(df)
    val acc = m.transform(df)
      .agg(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0, s"acc $acc")
    assert(m.depth >= 1 && m.depth <= 7, s"depth ${m.depth}")
    assert(m.numNodes % 2 == 1 && m.numNodes >= 3, s"nodes ${m.numNodes}")
    // regressor twin on a step function: r^2 > 0 vs the constant mean
    val rdf = Seq.tabulate(200) { i =>
      (org.apache.spark.ml.linalg.Vectors.dense(i.toDouble),
        if (i < 100) 1.0 else 5.0)
    }.toDF("features", "label")
    val rm = new org.apache.spark.ml.regression.DecisionTreeRegressor()
      .setMaxDepth(5).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features").fit(rdf)
    val st = rm.transform(rdf)
      .agg(sqrt(avg(pow(col("prediction") - col("label"), 2))).as("rmse"),
        stddev_pop(col("label")).as("sd")).head()
    assert(st.getDouble(0) < st.getDouble(1), s"rmse ${st.getDouble(0)} sd ${st.getDouble(1)}")
    val imp = rm.featureImportances.toArray
    assert(imp.forall(_ >= 0.0) && math.abs(imp.sum - 1.0) < 1e-6)
  }

  test("KNN predict (uniform and distance-weighted) on labeled blobs") {
    val rng = new java.util.Random(11)
    val centers = Seq((0.0, 0.0), (6.0, 6.0), (-6.0, 6.0))
    val data = Seq.tabulate(300) { i =>
      val (cx, cy) = centers(i % 3)
      (i.toLong, Array(cx + rng.nextGaussian() * 0.5, cy + rng.nextGaussian() * 0.5),
        (i % 3).toDouble)
    }
    val spark2 = spark
    import spark2.implicits._
    val df = data.toDF("id", "v", "label")
    val train = df.filter(org.apache.spark.sql.functions.col("id") >= 30)
    val test = df.filter(org.apache.spark.sql.functions.col("id") < 30)
    for (weighted <- Seq(false, true)) {
      val pred = Knn.predict(train, test, "id", "v", "label", k = 5, weighted)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val truth = data.take(30).map(d => d._1 -> d._3).toMap
      val acc = truth.count { case (id, l) => pred(id) == l } / 30.0
      assert(acc > 0.95, s"weighted=$weighted acc $acc")
    }
  }
}
