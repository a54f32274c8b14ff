package graft.ml

import graft.Tables
import org.apache.spark.ml.classification.{LinearSVC, RandomForestClassifier}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib-backed estimators where the built-in is semantically equivalent
  * to the reference (SURVEY.md §2.7 mapping): RandomForest C/R
  * (dislib/trees — identical distributed histogram-split design:
  * maxBins ≙ n_split_points, featureSubsetStrategy ≙ try_features),
  * ALS (dislib/recommendation/als — same alternating least squares with
  * rating-count regularization scaling), LinearSVC (the linear-kernel
  * CSVM fallback). Thin adapters from graft's array<double> feature
  * convention to MLlib's Vector column. */
object MllibWrappers {

  private def featurize(df: DataFrame, arrCol: String): DataFrame =
    df.withColumn("features", array_to_vector(col(arrCol)))

  /** RF classification on embeddings (label column, first 16 dims),
    * deterministic hash split; confusion-summary output. */
  def rfQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("double").as("label"),
        transform(slice(col("embedding"), 1, 16), x => x.cast("double")).as("arr"))
    val withSplit = featurize(e, "arr")
      .withColumn("test", pmod(col("vec_id"), lit(5)) === 0)
    val train = withSplit.filter(!col("test")).cache()
    val test = withSplit.filter(col("test")).cache()
    val model = new RandomForestClassifier()
      .setNumTrees(20).setMaxDepth(5).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(train)
    val out = model.transform(test)
      .groupBy(col("label").cast("int").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("prediction") === col("label"), 1).otherwise(0)).as("n_correct"))
      .orderBy("label")
      .collect()
    train.unpersist(false); test.unpersist(false)
    val spark2 = spark
    import spark2.implicits._
    out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq.toDF("label", "n", "n_correct")
  }

  /** RF regression sanity query: predict l_extendedprice from lineitem
    * numerics; output RMSE bucket (rows-only determinism via seed). */
  def rfRegQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(array(col("l_quantity"), col("l_discount"), col("l_tax")).as("arr"),
        col("l_extendedprice").as("label"))
    val df = featurize(li, "arr")
    val model = new RandomForestRegressor()
      .setNumTrees(10).setMaxDepth(5).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(df)
    val spark2 = spark
    import spark2.implicits._
    val rmse = model.transform(df)
      .agg(sqrt(avg(pow(col("prediction") - col("label"), 2)))).head().getDouble(0)
    Seq((model.getNumTrees, math.round(rmse / 100.0) * 100.0))
      .toDF("n_trees", "rmse_bucket")
  }

  /** ALS on event-derived ratings (user_id × props.k as item,
    * value as rating): top-1 recommendation for the 10 smallest users. */
  def alsQuery(spark: SparkSession, dir: String): DataFrame = {
    val ratings = Tables.events(spark, dir)
      .select(col("user_id").cast("int").as("user"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        col("value").cast("float").as("rating"))
      .filter(col("item").isNotNull)
      .groupBy("user", "item").agg(avg("rating").cast("float").as("rating"))
      .cache()
    // few distinct users/items at any SF: fewer factor blocks = fewer
    // shuffle files per iteration (default 10×10 blocks is for
    // billion-rating scale; at that scale raise blocks, not lower)
    val model = new ALS().setRank(8).setMaxIter(8).setSeed(42)
      .setNumUserBlocks(4).setNumItemBlocks(4)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .fit(ratings)
    // top-1 by predicted rating = argmax over dot(userFactor, itemFactor):
    // identical semantics to recommendForUserSubset(users, 1), but the
    // blocked-GEMM recommend machinery (built for 10^8-user catalogs)
    // costs ~6s of fixed blockify/shuffle setup — a broadcast cross join
    // over the 10×n_items factor pairs is the right plan at this shape
    import graft.functions.VecExprs.vecDot
    val users = ratings.select("user").distinct().orderBy("user").limit(10)
    val uf = model.userFactors.join(broadcast(users), col("id") === col("user"))
      .select(col("user"), transform(col("features"), x => x.cast("double")).as("ufeat"))
    val itf = model.itemFactors
      .select(col("id").as("item"), transform(col("features"), x => x.cast("double")).as("ifeat"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user")
      .orderBy(col("score").desc, col("item").asc)
    val out = uf.join(broadcast(itf))
      .withColumn("score", vecDot(col("ufeat"), col("ifeat")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user"), col("item").as("top_item"))
      .orderBy("user")
      .collect()
    ratings.unpersist(false)
    val spark2 = spark
    import spark2.implicits._
    out.map(r => (r.getInt(0), r.getInt(1))).toSeq.toDF("user", "top_item")
  }

  /** Lasso = L1 linear regression (reference: dislib/regression/lasso/
    * base.py:27-137 — distributed ADMM with CVXPY w-steps; MLlib's OWLQN
    * with elasticNetParam=1.0 solves the same L1 problem without the
    * ADMM machinery, SURVEY.md §2.7). */
  def lassoQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(array(col("l_quantity") / 50, col("l_discount"), col("l_tax")).as("arr"),
        (col("l_quantity") / 50 * 3.0 + col("l_discount") * 2.0).as("label"))
    val df = featurize(li, "arr")
    val model = new org.apache.spark.ml.regression.LinearRegression()
      .setElasticNetParam(1.0).setRegParam(0.01).setMaxIter(50)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(df)
    def r3(x: Double) = BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark2 = spark
    import spark2.implicits._
    model.coefficients.toArray.zipWithIndex
      .map { case (c, i) => (i, r3(c)) }.toSeq
      .toDF("feature", "coef")
      .orderBy("feature")
  }

  /** LinearSVC binary task on embeddings (label < 5 vs rest). */
  def svcQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        when(col("label") < 5, 1.0).otherwise(0.0).as("label"),
        transform(slice(col("embedding"), 1, 16), x => x.cast("double")).as("arr"))
    val df = featurize(e, "arr").cache()
    val model = new LinearSVC().setMaxIter(20).setRegParam(0.01)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(df)
    val out = model.transform(df)
      .groupBy(col("label").cast("int").as("label"),
        col("prediction").cast("int").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "predicted")
      .collect()
    df.unpersist(false)
    val spark2 = spark
    import spark2.implicits._
    out.map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .toSeq.toDF("label", "predicted", "n")
  }
}
