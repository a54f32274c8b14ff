package graft.tensor

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One n-dimensional dense tensor (row-major data) keyed by id. */
final case class TensorBlock(tensor_id: Long, shape: Seq[Int], data: Array[Double]) {
  def nElems: Int = shape.product
}

/** Distributed tensor collection (reference: dislib/data/tensor.py:18-64
  * — a grid of n-dimensional tensors; ops from_array `:522`, cat `:668`,
  * change_shape `:718`, rechunk_tensor `:751`, random_tensors `:902`,
  * shuffle `:1037`, apply_to_tensor / elementwise `:212-296`).
  *
  * Spark-native shape: a `Dataset[TensorBlock]` — each tensor is one row
  * (dense row-major payload + shape vector), the collection is
  * partition-parallel, and every op below is a narrow `map`/`union`/
  * `repartition` (no shuffle except rechunk/shuffle, exactly like the
  * reference's rechunk/shuffle tasks). Deep-learning training on top is
  * a non-goal (SURVEY §7.4); this is the data-plumbing surface.
  */
final class TensorSet(val ds: Dataset[TensorBlock]) {
  import ds.sparkSession.implicits._

  /** Elementwise map, shape-preserving (apply_to_tensor). */
  def elementwise(f: Double => Double): TensorSet =
    new TensorSet(ds.map(t => t.copy(data = t.data.map(f))))

  /** Reshape every tensor (change_shape): element count must match. */
  def changeShape(newShape: Seq[Int]): TensorSet =
    new TensorSet(ds.map { t =>
      require(newShape.product == t.nElems,
        s"shape ${newShape.mkString("x")} != ${t.nElems} elements")
      t.copy(shape = newShape)
    })

  /** Concatenate collections (cat); `idOffset` keeps ids unique. */
  def cat(o: TensorSet, idOffset: Long): TensorSet =
    new TensorSet(ds.union(o.ds.map(t => t.copy(tensor_id = t.tensor_id + idOffset))))

  /** Change the partition grid (rechunk_tensor). */
  def rechunk(n: Int): TensorSet = new TensorSet(ds.repartition(n))

  /** Seeded global shuffle of tensor order (tensor.py:1037). */
  def shuffle(seed: Long): TensorSet = {
    val shuffled = ds.toDF().withColumn("__r", rand(seed)).orderBy("__r")
      .drop("__r").as[TensorBlock]
    new TensorSet(shuffled)
  }

  /** Per-tensor reductions as a DataFrame (collect/inspection surface). */
  def summary: DataFrame =
    ds.map(t => (t.tensor_id, t.shape.mkString("x"), t.nElems,
        { var s = 0.0; var i = 0; while (i < t.data.length) { s += t.data(i); i += 1 }; s }))
      .toDF("tensor_id", "shape_s", "n_elems", "data_sum")
}

object TensorSet {
  /** Build from an array column: one tensor per row (from_array /
    * from_ds_array analog). */
  def fromArrayColumn(df: DataFrame, idCol: String, arrCol: String,
      shape: Seq[Int]): TensorSet = {
    val spark = df.sparkSession
    import spark.implicits._
    new TensorSet(df.select(col(idCol).cast("long"),
        graft.functions.VectorFns.asDouble(col(arrCol)))
      .as[(Long, Array[Double])]
      .map { case (i, v) =>
        require(v.length == shape.product, "shape/element mismatch")
        TensorBlock(i, shape, v)
      })
  }

  /** Directory of `.npy` files → TensorSet, one tensor per file in path
    * order, shape from each header (reference: tensor load_dataset,
    * tensor.py:973-1036 — `.pt` loading is out of scope with PyTorch,
    * SURVEY §7.4; `.npy` is the interchange path). Files parse in
    * parallel (binaryFile = one task per file). */
  def loadDataset(spark: SparkSession, path: String): TensorSet = {
    import spark.implicits._
    val parsed = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npy").load(path)
      .select(col("path"), col("content"))
      .rdd.map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1).zipWithIndex()
      .map { case ((_, bytes), idx) =>
        val (dims, vals) = graft.sources.Sources.parseNpyND(bytes)
        TensorBlock(idx, dims.toSeq, vals)
      }
    new TensorSet(spark.createDataset(parsed))
  }

  /** Deterministic random tensors (random_tensors, tensor.py:902). */
  def random(spark: SparkSession, n: Int, shape: Seq[Int], seed: Long): TensorSet = {
    import spark.implicits._
    val sz = shape.product
    new TensorSet(spark.range(n).map { i =>
      val rng = new java.util.Random(seed ^ i)
      TensorBlock(i, shape, Array.fill(sz)(rng.nextDouble()))
    })
  }

  /** Gate query: embeddings → (4×16) tensors, elementwise 2x+1, reshape
    * to 8×8, cat with the untouched first-5 tensors; per-tensor sums for
    * ids < 5 on both sides. The DuckDB oracle reproduces each sum from
    * the raw arrays. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).filter(col("vec_id") < 100)
    val base = fromArrayColumn(emb, "vec_id", "embedding", Seq(4, 16))
    val transformed = base.elementwise(x => x * 2.0 + 1.0).changeShape(Seq(8, 8))
    val both = transformed.cat(base, idOffset = 1000)
    both.summary
      .filter(col("tensor_id") < 5 || (col("tensor_id") >= 1000 && col("tensor_id") < 1005))
      .select(col("tensor_id"), col("shape_s"), col("n_elems"),
        round(col("data_sum"), 6).as("data_sum"))
      .orderBy("tensor_id")
  }

  val oracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      |    FROM embeddings WHERE vec_id < 5)
      |SELECT vec_id AS tensor_id, '8x8' AS shape_s, 64 AS n_elems,
      |  round(list_sum(list_transform(v, x -> x * 2.0 + 1.0)), 6) AS data_sum
      |FROM e
      |UNION ALL
      |SELECT vec_id + 1000, '4x16', 64, round(list_sum(v), 6) FROM e
      |ORDER BY tensor_id""".stripMargin
}
