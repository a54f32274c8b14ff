package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate wiring for the ML estimator layer (SURVEY.md §2.7/§2.9). */
object MlQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_kmeans" -> ((s, d) => KMeansGraft.query(s, d)),
    "q_davies_bouldin" -> ((s, d) => KMeansGraft.daviesBouldin(s, d)),
    "q_silhouette" -> ((s, d) => KMeansGraft.silhouette(s, d)),
    // model persistence gate: identical contract to q_kmeans, but the
    // fitted model takes a parquet save→load roundtrip before emitting —
    // the shared oracle hash-checks that persistence is param-exact
    "q_model_io" -> ((s, d) => KMeansGraft.queryVia(s, d, m => {
      val p = java.nio.file.Files.createTempDirectory("graft-modelio")
      try {
        ModelIO.saveKMeans(s, s"$p/km", m)
        ModelIO.loadKMeans(s, s"$p/km") // collects eagerly — dir can go
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(q => java.nio.file.Files.deleteIfExists(q))
      }
    })),
    "q_knn_classify" -> ((s, d) => Knn.classify(s, d)),
    "q_naive_bayes" -> ((s, d) => NaiveBayesGraft.query(s, d)),
    "q_standard_scaler" -> ((s, d) => Scalers.standardQuery(s, d)),
    "q_minmax_scaler" -> ((s, d) => Scalers.minmaxQuery(s, d)),
    "q_hash_split" -> ((s, d) => Knn.hashSplit(s, d)),
    "q_class_balance" -> ((s, d) => ModelSelection.classBalance(
      graft.Tables.embeddings(s, d), "label", "vec_id")),
    "q_linreg_multi" -> ((s, d) => LinearRegressionGraft.query(s, d)),
    "q_pca_cov" -> ((s, d) => PCAGraft.covQuery(s, d)),
    "q_pca" -> ((s, d) => PCAGraft.query(s, d)),
    // custom estimators + MLlib-backed (rows-only checks; full parity in specs)
    "q_dbscan" -> ((s, d) => DbscanGraft.query(s, d)),
    "q_gmm" -> ((s, d) => GmmGraft.query(s, d)),
    "q_gmm_full" -> ((s, d) => GmmGraft.fullQuery(s, d)),
    "q_gmm_tied" -> ((s, d) => GmmGraft.tiedQuery(s, d)),
    "q_gmm_spherical" -> ((s, d) => GmmGraft.sphericalQuery(s, d)),
    "q_csvm" -> ((s, d) => CascadeSvmGraft.query(s, d)),
    "q_csvm_rbf" -> ((s, d) => CascadeSvmGraft.rbfQuery(s, d)),
    "q_knn_weighted" -> ((s, d) => Knn.classifyWeighted(s, d)),
    "q_daura" -> ((s, d) => dauraQuery(s, d)),
    "q_rf_classify" -> ((s, d) => MllibWrappers.rfQuery(s, d)),
    "q_rf_regress" -> ((s, d) => MllibWrappers.rfRegQuery(s, d)),
    "q_dtree_classify" -> ((s, d) => MllibWrappers.dtreeQuery(s, d)),
    "q_dtree_regress" -> ((s, d) => MllibWrappers.dtreeRegQuery(s, d)),
    "q_als_recommend" -> ((s, d) => MllibWrappers.alsQuery(s, d)),
    "q_linear_svc" -> ((s, d) => MllibWrappers.svcQuery(s, d)),
    "q_lasso" -> ((s, d) => MllibWrappers.lassoQuery(s, d)),
    "q_pca_invariants" -> ((s, d) => PCAGraft.invariantsQuery(s, d)),
    "q_gridsearch" -> ((s, d) => ModelSelection.gridSearchQuery(s, d)),
    "q_admm_lasso" -> ((s, d) => Admm.query(s, d)))

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

  /** Daura (greedy max-degree removal, Neighbors.daura) reproduced as a
    * DuckDB recursive CTE: the working row carries the remaining-id list;
    * each step's LATERAL picks the (max degree, min id) center among
    * remaining points and removes its eps-ball. Distance chains are
    * left-associated like VecSqDist's sequential fold. */
  val dauraOracle: String = {
    val chain = (1 to 4).map(i => s"(a.v[$i]-b.v[$i])*(a.v[$i]-b.v[$i])")
      .mkString(" + ")
    s"""WITH RECURSIVE
       |pts AS (SELECT vec_id AS id, list_transform(embedding[1:4], x -> x::DOUBLE) AS v
       |    FROM embeddings WHERE vec_id < 50),
       |nb AS (SELECT a.id AS src, b.id AS dst FROM pts a JOIN pts b
       |    ON $chain <= (0.35::DOUBLE * 0.35::DOUBLE)),
       |iter(n, remaining, center, members) AS (
       |  SELECT 0, (SELECT list(id ORDER BY id) FROM pts), NULL::BIGINT, NULL::BIGINT[]
       |  UNION ALL
       |  SELECT n + 1,
       |    list_filter(iter.remaining, x -> NOT list_contains(m.members, x)),
       |    m.center, m.members
       |  FROM iter, LATERAL (
       |    SELECT src AS center, list(dst ORDER BY dst) AS members
       |    FROM nb WHERE list_contains(iter.remaining, src)
       |      AND list_contains(iter.remaining, dst)
       |    GROUP BY src ORDER BY count(*) DESC, src ASC LIMIT 1) m
       |  WHERE len(iter.remaining) > 0)
       |SELECT center, len(members)::BIGINT AS n_members FROM iter
       |WHERE center IS NOT NULL ORDER BY center""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_kmeans" -> KMeansGraft.oracle,
    "q_davies_bouldin" -> KMeansGraft.dbOracle,
    "q_silhouette" -> KMeansGraft.silhouetteOracle,
    "q_model_io" -> KMeansGraft.oracle,
    "q_knn_classify" -> Knn.oracle,
    "q_naive_bayes" -> NaiveBayesGraft.oracle,
    "q_knn_weighted" -> Knn.weightedOracle,
    "q_standard_scaler" -> Scalers.standardOracle,
    "q_minmax_scaler" -> Scalers.minmaxOracle,
    "q_hash_split" -> Knn.hashSplitOracle,
    "q_class_balance" -> {
      val h = graft.functions.TextFns.hash56Sql("vec_id::VARCHAR")
      s"""WITH c AS (SELECT label, count(*)::BIGINT AS n_orig
         |  FROM embeddings GROUP BY label),
         |t AS (SELECT max(n_orig)::BIGINT AS t FROM c),
         |r AS (SELECT label, vec_id,
         |    row_number() OVER (PARTITION BY label ORDER BY $h, vec_id) - 1 AS r
         |  FROM embeddings),
         |j AS (SELECT r.label, vec_id,
         |    (t // n_orig) + CASE WHEN r < t % n_orig THEN 1 ELSE 0 END AS copies,
         |    n_orig
         |  FROM r JOIN c USING (label) CROSS JOIN t)
         |SELECT label, any_value(n_orig) AS n_orig,
         |  sum(copies)::BIGINT AS n_after, max(copies)::BIGINT AS max_copies,
         |  sum(copies * (vec_id % 1000003))::BIGINT AS copies_check
         |FROM j GROUP BY label ORDER BY label""".stripMargin
    },
    "q_linreg_multi" -> LinearRegressionGraft.oracle,
    "q_pca_cov" -> PCAGraft.covOracle,
    "q_pca_invariants" -> PCAGraft.invariantsOracle,
    "q_gridsearch" -> ModelSelection.gridSearchOracle,
    "q_admm_lasso" -> Admm.oracle,
    "q_daura" -> dauraOracle,
    "q_dbscan" -> DbscanGraft.oracle,
    "q_gmm" -> GmmGraft.oracle,
    "q_gmm_full" -> GmmGraft.fullOracle,
    "q_gmm_tied" -> GmmGraft.tiedOracle,
    "q_gmm_spherical" -> GmmGraft.sphericalOracle,
    // invariant-style oracles: data-derived counts + optimality flags the
    // fitted model must satisfy (KKT stationarity, objective descent,
    // beats-baseline, rule-replay diagonal confusion, closed-form 2×2 eig)
    "q_pca" -> PCAGraft.oracle,
    "q_lasso" -> MllibWrappers.lassoOracle,
    "q_linear_svc" -> MllibWrappers.svcOracle,
    "q_rf_classify" -> MllibWrappers.rfOracle,
    "q_rf_regress" -> MllibWrappers.rfRegOracle,
    "q_dtree_classify" -> MllibWrappers.dtreeOracle,
    "q_dtree_regress" -> MllibWrappers.dtreeRegOracle,
    "q_als_recommend" -> MllibWrappers.alsOracle,
    "q_csvm" -> CascadeSvmGraft.oracle,
    "q_csvm_rbf" -> CascadeSvmGraft.rbfOracle)
}
