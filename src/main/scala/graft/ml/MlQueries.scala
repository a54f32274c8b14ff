package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate wiring for the ML estimator layer (SURVEY.md §2.7/§2.9). */
object MlQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_kmeans" -> ((s, d) => KMeansGraft.query(s, d)),
    "q_knn_classify" -> ((s, d) => Knn.classify(s, d)),
    "q_standard_scaler" -> ((s, d) => Scalers.standardQuery(s, d)),
    "q_minmax_scaler" -> ((s, d) => Scalers.minmaxQuery(s, d)),
    "q_hash_split" -> ((s, d) => Knn.hashSplit(s, d)),
    "q_linreg_multi" -> ((s, d) => LinearRegressionGraft.query(s, d)),
    "q_pca_cov" -> ((s, d) => PCAGraft.covQuery(s, d)),
    "q_pca" -> ((s, d) => PCAGraft.query(s, d)),
    // custom estimators + MLlib-backed (rows-only checks; full parity in specs)
    "q_dbscan" -> ((s, d) => DbscanGraft.query(s, d)),
    "q_gmm" -> ((s, d) => GmmGraft.query(s, d)),
    "q_csvm" -> ((s, d) => CascadeSvmGraft.query(s, d)),
    "q_daura" -> ((s, d) => dauraQuery(s, d)),
    "q_rf_classify" -> ((s, d) => MllibWrappers.rfQuery(s, d)),
    "q_rf_regress" -> ((s, d) => MllibWrappers.rfRegQuery(s, d)),
    "q_als_recommend" -> ((s, d) => MllibWrappers.alsQuery(s, d)),
    "q_linear_svc" -> ((s, d) => MllibWrappers.svcQuery(s, d)),
    "q_lasso" -> ((s, d) => MllibWrappers.lassoQuery(s, d)))

  private def dauraQuery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val pts = graft.Tables.embeddings(s, d)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        transform(slice(col("embedding"), 1, 4), x => x.cast("double")).as("v"))
    val clusters = Neighbors.daura(pts, "vec_id", "v", cutoff = 0.35)
    val s2 = s
    import s2.implicits._
    clusters.map { case (c, m) => (c, m.size.toLong) }
      .toDF("center", "n_members").orderBy("center")
  }

  val oracles: Map[String, String] = Map(
    "q_kmeans" -> KMeansGraft.oracle,
    "q_knn_classify" -> Knn.oracle,
    "q_standard_scaler" -> Scalers.standardOracle,
    "q_minmax_scaler" -> Scalers.minmaxOracle,
    "q_hash_split" -> Knn.hashSplitOracle,
    "q_linreg_multi" -> LinearRegressionGraft.oracle,
    "q_pca_cov" -> PCAGraft.covOracle,
    "q_dbscan" -> DbscanGraft.oracle,
    "q_gmm" -> GmmGraft.oracle)
  // q_pca has no oracle entry: eigendecomposition is not SQL-expressible
  // (driver records the weaker rows-only check; full parity in MlSpec).
}
