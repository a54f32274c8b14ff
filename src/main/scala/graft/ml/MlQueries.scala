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
    "q_pca" -> ((s, d) => PCAGraft.query(s, d)))

  val oracles: Map[String, String] = Map(
    "q_kmeans" -> KMeansGraft.oracle,
    "q_knn_classify" -> Knn.oracle,
    "q_standard_scaler" -> Scalers.standardOracle,
    "q_minmax_scaler" -> Scalers.minmaxOracle,
    "q_hash_split" -> Knn.hashSplitOracle,
    "q_linreg_multi" -> LinearRegressionGraft.oracle,
    "q_pca_cov" -> PCAGraft.covOracle)
  // q_pca has no oracle entry: eigendecomposition is not SQL-expressible
  // (driver records the weaker rows-only check; full parity in MlSpec).
}
