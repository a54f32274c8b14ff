package graft.operators

import graft.Tables
import graft.functions.TextFns.hash56Sql
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (BASELINE.json extension;
  * the reference's analog is NearestNeighbors, dislib/neighbors/base.py:39-130
  * — broadcast block cross-product + k-way merge).
  *
  * Two paths, mirroring the reference's exact-vs-scale split:
  *  - [[bruteTopK]]: exact cosine top-k — the query side is broadcast (like
  *    dislib's per-block sklearn structures), candidates stream through the
  *    scan, per-query top-k via window; Spark plans the rank filter without
  *    materializing the full cross product per partition.
  *  - [[lshTopK]]: random-hyperplane LSH (sign-bit sketch) — candidates are
  *    bucketed by an 8-bit signature, top-k only within the query's bucket.
  *    At 100 TB the bucket join replaces the full scan per query; the
  *    hyperplanes are deterministic (md5-derived) so the DuckDB oracle
  *    reproduces the same buckets.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  val Dim = 64
  val NumPlanes = 8
  val TopK = 5
  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * plane j, dim i → (hash56("j:i") mod 2001)/1000 - 1. */
  def planeComp(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 14)
    (java.lang.Long.parseLong(hex, 16) % 2001L) / 1000.0 - 1.0
  }

  import graft.functions.VectorFns.{asDouble, dot}
  private def norm(c: Column): Column = graft.functions.VectorFns.norm2(c)

  private def embWithNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact brute-force cosine top-k for queries vec_id < 20. */
  def bruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embWithNorm(spark, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("qid", "rank")
  }

  /** Sign-bit signature under the fixed hyperplanes: sum of 2^j over planes
    * with dot(v, plane_j) > 0. */
  private def lshBucket(v: Column): Column =
    (0 until NumPlanes).map { j =>
      val d = (0 until Dim).map(i =>
        element_at(v, i + 1) * lit(planeComp(j, i))).reduce(_ + _)
      when(d > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: top-3 cosine within the query's hyperplane bucket. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embWithNorm(spark, dir).withColumn("bucket", lshBucket(col("v")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val scored = e.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("qid", "rank")
  }

  /** Quantizer subspace width: the coarse KMeans runs on the first
    * QuantDim dims (cosine still scores all Dim) — a subspace coarse
    * quantizer is standard IVF practice and keeps the unrolled-Lloyd
    * DuckDB oracle's expression tree bounded. */
  val QuantDim = 16
  val IvfLists = 16
  val IvfProbe = 4
  val IvfIters = 3

  /** √N-cells default for the IVF quantizers (same budget argument as
    * Dedup.autoDfCap): with nlist = ⌈√N⌉ the MEAN cell occupancy is √N,
    * so a within-cell all-pairs costs ~N per cell — one document's worth
    * of candidates — instead of (N/16)² with a frozen nlist; and an IVF
    * probe scans nProbe·√N rows instead of nProbe·N/16. Floored at
    * [[IvfLists]] so small corpora (< ~256 vectors) keep the gate shape. */
  def autoNlist(nVecs: Long): Int =
    math.max(IvfLists, math.ceil(math.sqrt(nVecs.toDouble)).toInt)

  /** IVF ANN: a KMeans coarse quantizer partitions the corpus into
    * nlist cells; queries search only their nProbe nearest cells (the
    * classic inverted-file index — at 100 TB the corpus is bucketed and
    * optionally `repartition(cell)`-clustered once, and each query scans
    * nProbe/nlist of the data). Deterministic via KMeansGraft's contract,
    * so the DuckDB oracle replays quantizer, probes, and ranking exactly.
    * `nlist` ≤ 0 → the [[autoNlist]] √N default (the gate pins
    * [[IvfLists]] so the oracle's unrolled quantizer stays fixed). */
  def ivfTopK(spark: SparkSession, dir: String,
      nlist: Int = -1, nProbe: Int = IvfProbe, k: Int = 3): DataFrame = {
    import graft.ml.KMeansGraft
    val e = embWithNorm(spark, dir)
      .withColumn("sv", slice(col("v"), 1, QuantDim)).cache()
    val nl = if (nlist > 0) nlist else autoNlist(e.count())
    val model = KMeansGraft.fit(e.select(col("vec_id"), col("sv")), "sv", "vec_id",
      nl, maxIter = IvfIters)
    val cells = e.withColumn("cell", model.assignCol(col("sv")))
    // nProbe nearest cells per query via the looping center-distance expr
    val q = cells.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("sv").as("qsv"))
      .withColumn("probe_cells", model.nearestCentersCol(col("qsv"), nProbe))
    val scored = cells.join(broadcast(q),
        array_contains(col("probe_cells"), col("cell")) && col("vec_id") =!= col("qid"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("qid", "rank")
      .collect() // small; materialize so the corpus cache can be freed
    e.unpersist(false)
    val spark2 = spark
    import spark2.implicits._
    out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.toDF("qid", "rank", "neighbor_id", "cosine")
  }

  val queries: Map[String, Q] = Map(
    "q_ann_brute" -> (bruteTopK _),
    "q_ann_lsh" -> (lshTopK _),
    "q_ann_ivf" -> ((s, d) => ivfTopK(s, d, nlist = IvfLists)))

  private val embCte =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      |    FROM embeddings),
      |n AS (SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)""".stripMargin
  private val cosSql =
    "list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)]) / (q.nrm * c.nrm)"

  val oracles: Map[String, String] = Map(
    "q_ann_brute" ->
      s"""$embCte
         |SELECT qid, rank, neighbor_id, cosine FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         |    round($cosSql, 6) AS cosine,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cosSql DESC, c.vec_id) AS rank
         |  FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
         |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,
    "q_ann_lsh" -> {
      val planes = (0 until NumPlanes).map { j =>
        val d = (0 until Dim).map(i => s"v[${i + 1}] * (${planeComp(j, i)})")
          .mkString(" + ")
        s"CASE WHEN $d > 0 THEN ${1 << j} ELSE 0 END"
      }.mkString(" + ")
      s"""$embCte,
         |b AS (SELECT vec_id, v, nrm, $planes AS bucket FROM n)
         |SELECT qid, rank, neighbor_id, cosine FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         |    round($cosSql, 6) AS cosine,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cosSql DESC, c.vec_id) AS rank
         |  FROM b q JOIN b c
         |  ON q.vec_id < 20 AND c.bucket = q.bucket AND c.vec_id <> q.vec_id)
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
    },
    "q_ann_ivf" -> {
      import graft.ml.KMeansGraft.{assignCteSql, chainSql, lloydCtesSql}
      // quantizer replay on the 16-dim subspace, then probe selection and
      // full-dim cosine ranking — step for step the Spark ivfTopK plan
      s"""WITH full0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
         |    FROM embeddings),
         |n AS (SELECT vec_id, v,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM full0),
         |sv AS (SELECT vec_id, v[1:$QuantDim] AS v FROM full0),
         |${lloydCtesSql("sv", QuantDim, IvfLists, IvfIters)},
         |${assignCteSql("cells", "sv", s"csv$IvfIters", QuantDim)},
         |probe AS (SELECT vec_id AS qid, cl FROM (
         |  SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d ASC, cl ASC) AS rn
         |  FROM (SELECT s.vec_id, c2.cl, ${chainSql("s.v", "c2.v", QuantDim)} AS d
         |    FROM sv s CROSS JOIN csv$IvfIters c2
         |    WHERE s.vec_id < 20))
         |  WHERE rn <= $IvfProbe)
         |SELECT qid, rank, neighbor_id, cosine FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         |    round($cosSql, 6) AS cosine,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cosSql DESC, c.vec_id) AS rank
         |  FROM n q JOIN cells ce ON q.vec_id < 20
         |    AND EXISTS (SELECT 1 FROM probe pr
         |      WHERE pr.qid = q.vec_id AND pr.cl = ce.cl)
         |    AND ce.vec_id <> q.vec_id
         |  JOIN n c ON c.vec_id = ce.vec_id)
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
    })
}
