package graft.ml

import graft.Tables
import graft.functions.VectorFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbors classifier (reference: dislib/classification/knn/
  * base.py:85-150 — kneighbors + majority vote; the k-way merge of
  * per-block top-k, neighbors/base.py:186-201, is the window row_number
  * here). Broadcast the query side; at larger query cardinalities switch
  * to the LSH-bucketed path (graft.operators.Similarity.lshTopK).
  *
  * Deterministic vote: neighbors ranked by (squared distance, train id);
  * label vote ranked by (count desc, label asc) — no RNG, so the DuckDB
  * oracle reproduces predictions exactly (distances are sequential-fold
  * chains, bit-identical across engines).
  */
object Knn {
  val K = 5
  val TestCut = 50

  def classify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val test = e.filter(col("vec_id") < TestCut)
      .select(col("vec_id").as("tid"), col("label").as("true_label"), col("v").as("tv"))
    val train = e.filter(col("vec_id") >= TestCut)
    val nn = train.crossJoin(broadcast(test))
      .withColumn("d", sqDist(col("tv"), col("v")))
      .withColumn("rn", row_number().over(Window.partitionBy("tid")
        .orderBy(col("d").asc, col("vec_id").asc)))
      .filter(col("rn") <= K)
    val votes = nn.groupBy("tid", "true_label", "label")
      .agg(count(lit(1)).as("c"))
      .withColumn("rr", row_number().over(Window.partitionBy("tid")
        .orderBy(col("c").desc, col("label").asc)))
      .filter(col("rr") === 1)
    votes.select(col("tid").as("test_id"), col("label").as("pred_label"),
        col("true_label"))
      .orderBy("test_id")
  }

  def oracle: String = {
    val chain = (1 to 64).map(i => s"(t.tv[$i]-r.v[$i])*(t.tv[$i]-r.v[$i])")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |te AS (SELECT vec_id AS tid, label AS true_label, v AS tv FROM e
       |  WHERE vec_id < $TestCut),
       |tr AS (SELECT * FROM e WHERE vec_id >= $TestCut),
       |nn AS (SELECT tid, true_label, label FROM (
       |  SELECT t.tid, t.true_label, r.label,
       |    row_number() OVER (PARTITION BY t.tid
       |      ORDER BY $chain ASC, r.vec_id ASC) AS rn
       |  FROM te t CROSS JOIN tr r) WHERE rn <= $K),
       |v AS (SELECT tid, true_label, label, count(*) AS c FROM nn GROUP BY 1, 2, 3)
       |SELECT tid AS test_id, label AS pred_label, true_label FROM (
       |  SELECT tid, true_label, label,
       |    row_number() OVER (PARTITION BY tid ORDER BY c DESC, label ASC) AS rr
       |  FROM v) WHERE rr = 1 ORDER BY test_id""".stripMargin
  }

  /** General KNN prediction API (reference: KNeighborsClassifier
    * weights∈{uniform, distance}, knn/base.py:22-296): vote weight is 1
    * or 1/(dist+ε); winner by (total weight desc, label asc). */
  def predict(train: DataFrame, test: DataFrame, idCol: String, vCol: String,
      labelCol: String, k: Int, weighted: Boolean): DataFrame = {
    val q = test.select(col(idCol).as("qid"), col(vCol).as("qv"))
    val scored = train.select(col(idCol).as("nid"), col(labelCol).as("nlabel"), col(vCol))
      .crossJoin(broadcast(q))
      .withColumn("d", sqDist(col("qv"), col(vCol)))
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("d").asc, col("nid").asc)))
      .filter(col("rn") <= k)
      .withColumn("wt",
        if (weighted) lit(1.0) / (sqrt(col("d")) + lit(1e-9)) else lit(1.0))
    // vote totals rounded to 9 decimals BEFORE ranking: the oracle
    // determinism contract — unrounded float sums rank in agg order,
    // and last-ulp noise across engines could flip a near-tied winner
    scored.groupBy("qid", "nlabel").agg(round(sum("wt"), 9).as("w"))
      .withColumn("rr", row_number().over(Window.partitionBy("qid")
        .orderBy(col("w").desc, col("nlabel").asc)))
      .filter(col("rr") === 1)
      .select(col("qid").as(idCol), col("nlabel").as("prediction"))
  }

  /** Gate query: distance-weighted KNN (reference weights='distance',
    * knn/base.py:257-296) — vote weight 1/(√d + 1e-9), winner by
    * (total weight desc, label asc); fully oracle-reproducible because
    * the weight arithmetic is the same IEEE expression both sides. */
  def classifyWeighted(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"), asDouble(col("embedding")).as("v"))
    val test = e.filter(col("id") < TestCut)
    val train = e.filter(col("id") >= TestCut)
    predict(train, test, "id", "v", "label", K, weighted = true)
      .select(col("id").as("test_id"), col("prediction").as("pred_label"))
      .orderBy("test_id")
  }

  val weightedOracle: String = {
    val chain = (1 to 64).map(i => s"(t.qv[$i]-r.v[$i])*(t.qv[$i]-r.v[$i])")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |te AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $TestCut),
       |tr AS (SELECT * FROM e WHERE vec_id >= $TestCut),
       |nn AS (SELECT qid, label, d FROM (
       |  SELECT qid, label, d,
       |    row_number() OVER (PARTITION BY qid ORDER BY d ASC, vec_id ASC) AS rn
       |  FROM (SELECT t.qid, r.label, r.vec_id, $chain AS d
       |        FROM te t CROSS JOIN tr r)) WHERE rn <= $K),
       |v AS (SELECT qid, label, round(sum(1.0 / (sqrt(d) + 1e-9)), 9) AS w
       |  FROM nn GROUP BY qid, label)
       |SELECT qid AS test_id, label AS pred_label FROM (
       |  SELECT qid, label,
       |    row_number() OVER (PARTITION BY qid ORDER BY w DESC, label ASC) AS rr
       |  FROM v) WHERE rr = 1 ORDER BY test_id""".stripMargin
  }

  /** Deterministic hash-based train/test split + k-fold assignment
    * (the scale-friendly variant of dislib's seeded random split,
    * model_selection/_split.py:14-76; a hash split is reproducible across
    * engines and cluster sizes, unlike RNG-per-row). */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("h", pmod(conv(substring(
        md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 14), 16, 10)
        .cast("long"), lit(10)))
      .withColumn("split", when(col("h") < 8, "train").otherwise("test"))
      .withColumn("fold", pmod(col("h"), lit(5)))
      .groupBy("split", "fold")
      .agg(count(lit(1)).as("n"), round(avg("l_quantity"), 4).as("mean_qty"))
      .orderBy("split", "fold")

  val hashSplitOracle: String =
    """SELECT split, fold, count(*) AS n, round(avg(l_quantity), 4) AS mean_qty
      |FROM (SELECT l_quantity,
      |    CASE WHEN h < 8 THEN 'train' ELSE 'test' END AS split, h % 5 AS fold
      |  FROM (SELECT l_quantity,
      |    ('0x'||substr(md5(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR),1,14))::UBIGINT::BIGINT % 10 AS h
      |  FROM lineitem))
      |GROUP BY split, fold ORDER BY split, fold""".stripMargin
}
