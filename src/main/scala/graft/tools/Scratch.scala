package graft.tools
import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), wordShingles(tokens(col("text")), 3).as("sh")).cache()
    time("shingles materialize")(sh.count())
    val hs = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), pmod(hash56(col("s")), lit(MinhashP)).as("h"))
    time("explode+hash count")(hs.count())
    val sigCols = (0 until NumPerms).map(i =>
      min((lit(permA(i)) * col("h") + lit(permB(i))) % lit(MinhashP)).as(s"m$i"))
    val sig = hs.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("sig agg")(sig.count())
    val sigC = sig.cache(); time("sig cache")(sigC.count())
    val nBands = NumPerms / BandRows
    val bands = sigC.select(col("doc_id"), posexplode(array(
      (0 until nBands).map(b => md5(concat_ws(",",
        (0 until BandRows).map(r => col(s"m${b * BandRows + r}")): _*))): _*)))
      .toDF("doc_id", "band", "bh")
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand join")(println("cands: " + cand.count()))
    val j = cand.join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("jaccard", size(array_intersect(col("sha"), col("shb"))).cast("double") /
        size(array_union(col("sha"), col("shb"))))
      .filter(col("jaccard") >= 0.5)
    time("jaccard back")(j.count())
    spark.stop()
  }
}
