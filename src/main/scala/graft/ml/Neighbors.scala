package graft.ml

import graft.functions.VectorFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NearestNeighbors / Daura (reference: dislib/neighbors/base.py:15-245;
  * dislib/cluster/daura/base.py:12-123).
  *
  * kneighbors is the broadcast theta-join + per-query top-k of the
  * reference's block cross product (its `_merge_kqueries` k-way merge is
  * the window row_number). For query sets too large to broadcast, chunk
  * the query side — each chunk is an independent job (the reference
  * iterates fit-blocks the same way).
  */
object Neighbors {

  /** k nearest (squared-distance) fit rows for every query row.
    * Both frames need (idCol, vCol: array<double>). */
  def kneighbors(fit: DataFrame, queries: DataFrame, idCol: String,
      vCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vCol).as("qv"))
    val scored = fit.select(col(idCol).as("neighbor_id"), col(vCol).as("v"))
      .crossJoin(broadcast(q))
      .withColumn("dist2", sqDist(col("qv"), col("v")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist2").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dist2"))
  }

  /** Daura clustering (greedy max-degree removal over a distance graph):
    * repeatedly take the point with the most neighbors within cutoff as a
    * cluster center, remove the cluster, recount. Ties break on min id.
    * The per-iteration degree count is a distributed aggregation; only
    * the argmax row is collected (the reference syncs the same way). */
  def daura(points: DataFrame, idCol: String, vCol: String,
      cutoff: Double): Seq[(Long, Seq[Long])] = {
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col(idCol).cast("long").as("id"), col(vCol).as("v"))
    // edge list once (self-loops included → degree counts the point itself)
    var edges = pts.as("a").join(pts.as("b"),
        sqDist(col("a.v"), col("b.v")) <= lit(cutoff * cutoff))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
      .cache()
    val clusters = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    var remaining = edges.select(countDistinct("src")).head().getLong(0)
    while (remaining > 0) {
      val top = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("src").asc).limit(1).head()
      val center = top.getLong(0)
      val members = edges.filter(col("src") === center)
        .select("dst").as[Long].collect().sorted.toSeq
      clusters += ((center, members))
      val memberSet = members.toSet
      val pruned = edges.filter(!col("src").isInCollection(memberSet) &&
        !col("dst").isInCollection(memberSet)).cache()
      pruned.count()
      edges.unpersist()
      edges = pruned
      remaining = edges.select(coalesce(countDistinct("src"), lit(0L))).head().getLong(0)
    }
    edges.unpersist(false)
    clusters.toSeq
  }
}
