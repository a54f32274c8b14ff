package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2 plus the LLM-data-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL for every query whose
  * semantics are SQL-expressible. Non-SQL operators (MLlib estimators,
  * linalg) appear in `queries` only and are additionally spec-tested.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Temporal.queries ++ Layout.queries ++ Graph.queries ++
      Pii.queries ++ DataQuality.queries ++ Sketches.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Canary.queries ++
      Similarity.queries ++ Events.queries ++ graft.ml.MlQueries.queries ++
      graft.linalg.LinalgQueries.queries ++
      graft.streaming.StreamingGates.queries ++
      Map("q_terasort_cols" -> (TeraSort.query _),
        "q_multimodal" -> (graft.multimodal.Multimodal.query _),
        "q_video_meta" -> (graft.multimodal.Multimodal.videoMetaQuery _),
        "q_video_frames" -> (graft.multimodal.Multimodal.videoFramesQuery _),
        "q_tiff_meta" -> (graft.multimodal.Multimodal.tiffMetaQuery _),
        "q_phash_dedup" -> (graft.multimodal.Multimodal.phashDedupQuery _),
        "q_tensor_ops" -> (graft.tensor.TensorSet.query _),
        "q_io_roundtrip" -> (graft.sources.Sources.roundtripQuery _),
        "q_svmlight" -> (graft.sources.Sources.svmlightQuery _),
        "q_mdcrd" -> (graft.sources.Sources.mdcrdQuery _),
        "q_npy_hstack" -> (graft.sources.Sources.npyHstackQuery _),
        "q_npz_roundtrip" -> (graft.sources.Sources.npzRoundtripQuery _),
        "q_partition_prune" -> (graft.sources.Sources.partitionPruneQuery _),
        "q_schema_evolution" -> (graft.sources.Sources.schemaEvolutionQuery _),
        "q_bucket_join" -> (graft.sources.Sources.bucketJoinQuery _))

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Temporal.oracles ++ Layout.oracles ++ Graph.oracles ++
      Pii.oracles ++ DataQuality.oracles ++ Sketches.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Canary.oracles ++
      Similarity.oracles ++ Events.oracles ++ graft.ml.MlQueries.oracles ++
      graft.linalg.LinalgQueries.oracles ++
      graft.streaming.StreamingGates.oracles ++
      Map("q_terasort_cols" -> TeraSort.oracle,
        "q_multimodal" -> graft.multimodal.Multimodal.oracle,
        "q_video_meta" -> graft.multimodal.Multimodal.videoMetaOracle,
        "q_video_frames" -> graft.multimodal.Multimodal.videoFramesOracle,
        "q_tiff_meta" -> graft.multimodal.Multimodal.tiffMetaOracle,
        "q_phash_dedup" -> graft.multimodal.Multimodal.phashDedupOracle,
        "q_tensor_ops" -> graft.tensor.TensorSet.oracle,
        "q_io_roundtrip" -> graft.sources.Sources.roundtripOracle,
        "q_svmlight" -> graft.sources.Sources.svmlightOracle,
        "q_mdcrd" -> graft.sources.Sources.mdcrdOracle,
        "q_npy_hstack" -> graft.sources.Sources.npyHstackOracle,
        "q_npz_roundtrip" -> graft.sources.Sources.npzRoundtripOracle,
        "q_partition_prune" -> graft.sources.Sources.partitionPruneOracle,
        "q_schema_evolution" -> graft.sources.Sources.schemaEvolutionOracle,
        "q_bucket_join" -> graft.sources.Sources.bucketJoinOracle)
}
