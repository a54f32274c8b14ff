package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-adaptive connected components over an undirected edge list —
  * the shared core of DBSCAN's cluster merge and duplicate-cluster
  * resolution. Below `maxDriverEdges` a driver union-find (the
  * reference's own design, dbscan/base.py:435-454) beats ~10 Pregel
  * supersteps of shuffles — the AQE-broadcast argument applied to
  * graphs; above it, GraphX connectedComponents is the 1000-executor
  * path. Both converge to the MIN node id as the component label, so
  * the choice is invisible to results (and to the DuckDB oracles'
  * recursive-CTE min-label propagation).
  */
object Components {

  /** Labels every node that appears in `edges` (first column = src,
    * second = dst) with its component's min node id. Returns
    * (id, comp); isolated nodes (no edges) are absent — callers union
    * them back with their own id if needed. The result is materialized
    * before returning (the input is only scanned during this call).
    *
    * Cache contract: in the GraphX regime the returned frame is CACHED
    * (its lineage runs through Pregel; recomputing it would redo the
    * whole CC). Callers must unpersist the returned handle once their
    * result is materialized — on the driver-path local relation that
    * unpersist is a harmless no-op. */
  def connected(edges: DataFrame, maxDriverEdges: Long = 5000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.toDF("src", "dst").cache()
    val nEdges = e.count()
    val out =
      if (nEdges <= maxDriverEdges) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        // track every endpoint: pure roots never enter `parent`, but they
        // are still nodes of their component (label = own id)
        val nodes = scala.collection.mutable.HashSet.empty[Long]
        e.as[(Long, Long)].collect().foreach { case (s, t) =>
          nodes += s; nodes += t
          val (rs, rt) = (find(s), find(t))
          if (rs != rt) parent(math.max(rs, rt)) = math.min(rs, rt)
        }
        val labels = nodes.iterator.map(k => (k, find(k))).toSeq
        spark.createDataFrame(labels).toDF("id", "comp")
      } else {
        // High-diameter graphs (chains, functional graphs) run Pregel
        // for O(diameter) supersteps; without periodic checkpointing
        // the lineage deserialization stack-overflows near superstep
        // ~2000. Pregel reads spark.graphx.pregel.checkpointInterval
        // from the session conf at call time — ensure a checkpoint dir
        // exists so the interval (set in the session builders) engages.
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
          sc.setCheckpointDir(ckpt.toString)
          // Spark doesn't delete checkpoint files on exit
          // (cleanCheckpoints defaults false) — reap the dir we created
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            import scala.jdk.CollectionConverters._
            try java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
            catch { case _: Exception => }
          }))
        }
        val g = Graph.fromEdges(
          e.as[(Long, Long)].rdd.map { case (s, t) => Edge(s, t, ()) }, (),
          vertexStorageLevel = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cc = g.connectedComponents()
        val v = cc.vertices.toDF("id", "comp").cache()
        v.count() // materialize while the edge cache is alive
        cc.unpersist(blocking = false) // drop Pregel's internal RDD caches
        g.unpersist(blocking = false)
        v
      }
    e.unpersist(false)
    out
  }
}
