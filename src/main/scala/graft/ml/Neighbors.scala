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

  /** All (src, dst) pairs with ‖a−b‖ ≤ cutoff, self-loops included —
    * the candidate generation is a grid-cell equi-join (cells of side
    * `cutoff` over the first ≤3 dimensions, each point copied to its
    * 3^g neighboring cells), never an all-pairs theta-join: Spark plans
    * a hash join on the cell key, and the exact full-vector distance
    * filter runs only within cell neighborhoods. The grid prunes by a
    * low-dim projection, so correctness never depends on it (superset
    * of true pairs in, exact filter out) — only the candidate count
    * does; at 100× rows this stays near-linear where the projection
    * spreads, vs the quadratic broadcast-nested-loop it replaces. */
  def epsEdges(points: DataFrame, idCol: String, vCol: String,
      cutoff: Double): DataFrame =
    epsEdgesWithSalts(points, idCol, vCol, cutoff)._1

  /** [[epsEdges]] plus the cached dense-cell salts handle (None when no
    * cell exceeded the pair budget). Callers that consume the edges and
    * unpersist them (daura, DBSCAN-style loops) should unpersist the
    * salts too — the plain epsEdges signature has no way to hand the
    * cache back, which leaked it for the application lifetime. */
  def epsEdgesWithSalts(points: DataFrame, idCol: String, vCol: String,
      cutoff: Double): (DataFrame, Option[DataFrame]) = {
    val pts = points.select(col(idCol).cast("long").as("id"), col(vCol).as("v"))
    val d = pts.select(size(col("v"))).head().getInt(0)
    val g = math.min(d, 3) // 3^g halo copies; higher dims filter exactly
    val mins = pts.select((0 until g).map(i =>
      min(element_at(col("v"), i + 1)).as(s"m$i")): _*).head()
    val offsets = (0 until g).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(o => Seq(-1, 0, 1).map(o :+ _))
    }
    val withCell = pts.withColumn("cell_arr", array((0 until g).map(i =>
      floor((element_at(col("v"), i + 1) - lit(mins.getDouble(i))) / lit(cutoff))
        .cast("long")): _*))
    val own = withCell.withColumn("cell", concat_ws(",", (0 until g).map(i =>
        element_at(col("cell_arr"), i + 1)): _*))
      .select("id", "v", "cell")
    val halo = withCell.withColumn("off", explode(typedLit(offsets)))
      .withColumn("cell", concat_ws(",", (0 until g).map(i =>
        element_at(col("cell_arr"), i + 1) + element_at(col("off"), i + 1)): _*))
      .select("id", "v", "cell")
    // dense-cell salting, same policy as DbscanGraft: if any cell's
    // pair count exceeds the per-task budget, split its fan-out.
    // Cache the salts frame — it is referenced on BOTH sides of the
    // salted join, which would otherwise recompute the halo-wide
    // per-cell count aggregation twice at join execution.
    val salts = DbscanGraft.cellSalts(halo, DbscanGraft.PairBudgetPerTask)
      .map(_.cache())
    val edges = DbscanGraft.epsPairJoin(own, halo, salts,
        sqDist(col("a.v"), col("b.v")) <= lit(cutoff * cutoff))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
    salts.foreach(_.count()) // materialize before callers iterate edges
    (edges, salts)
  }

  /** Daura clustering (greedy max-degree removal over a distance graph):
    * repeatedly take the point with the most neighbors within cutoff as a
    * cluster center, remove the cluster, recount. Ties break on min id.
    * The per-iteration degree count is a distributed aggregation; only
    * the argmax row is collected (the reference syncs the same way; its
    * input IS an n×n distance matrix, daura/base.py:38-45 — our point
    * API builds the cutoff graph via the grid-blocked epsEdges, not an
    * all-pairs join). */
  def daura(points: DataFrame, idCol: String, vCol: String,
      cutoff: Double): Seq[(Long, Seq[Long])] = {
    // edge list once (self-loops included → degree counts the point itself)
    val (edges0, salts) = epsEdgesWithSalts(points, idCol, vCol, cutoff)
    greedyClusters(edges0, salts)
  }

  /** Daura over a PRECOMPUTED n×n distance matrix — the reference's
    * literal input surface (daura/base.py:38-45 takes the distance
    * ds-array, not points). Edges are the block-local entries with
    * dist(i,j) ≤ cutoff: one narrow map over the tiles — no join, no
    * shuffle — feeding the same greedy max-degree loop as the point
    * API, so both paths agree wherever the matrix holds the pairwise
    * distances of the points.
    *
    * The matrix must be DENSE (as the reference's is): in a sparse-tile
    * DsArray an absent entry means 0.0, which would read as distance
    * zero — i.e. an edge — for every unstored pair. */
  def dauraFromDistances(dist: graft.linalg.DsArray,
      cutoff: Double): Seq[(Long, Seq[Long])] = {
    require(!dist.sparseTiles,
      "dauraFromDistances needs a dense distance matrix: sparse tiles " +
        "read absent entries as distance 0 (an edge) for every unstored pair")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val (rpb, cpb) = dist.blockSize
    val edges = dist.bm.blocks.flatMap { case ((bi, bj), m) =>
      val r0 = bi.toLong * rpb; val c0 = bj.toLong * cpb
      val vals = m.toArray // column-major, dense and sparse alike
      (0 until m.numCols).iterator.flatMap { j =>
        (0 until m.numRows).iterator
          .filter(i => vals(j * m.numRows + i) <= cutoff)
          .map(i => (r0 + i, c0 + j))
      }
    }.toDF("src", "dst")
    greedyClusters(edges, None)
  }

  /** Shared greedy max-degree removal loop over an eps-edge list. */
  private def greedyClusters(edges0: DataFrame,
      salts: Option[DataFrame]): Seq[(Long, Seq[Long])] = {
    val spark = edges0.sparkSession
    import spark.implicits._
    var edges = edges0.cache()
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
    salts.foreach(_.unpersist(false))
    clusters.toSeq
  }
}
