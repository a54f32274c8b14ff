package graft.tools
import graft.Tables
import graft.ml.CascadeSvmGraft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, dir)
      .select(col("l_quantity"), col("l_discount"), col("l_tax"), col("l_extendedprice"))
    val mean = li.agg(avg("l_extendedprice")).head().getDouble(0)
    val local = li.limit(2000).collect().map { r =>
      (Array(r.getDouble(0) / 50.0, r.getDouble(1), r.getDouble(2), 1.0),
        if (r.getDouble(3) > mean) 1.0 else -1.0)
    }
    println("pos frac: " + local.count(_._2 > 0) / local.length.toDouble)
    // correlation qty vs label
    val posQty = local.filter(_._2 > 0).map(_._1(0)).sum / local.count(_._2 > 0)
    val negQty = local.filter(_._2 < 0).map(_._1(0)).sum / local.count(_._2 < 0)
    println(s"mean qty | pos=$posQty neg=$negQty")
    for (c <- Seq(1.0, 10.0, 100.0); sw <- Seq(15, 100)) {
      val (sx, sy, al) = CascadeSvmGraft.localSolve(local.map(_._1), local.map(_._2), c, CascadeSvmGraft.Linear, sw)
      val m = CascadeSvmGraft.Model(CascadeSvmGraft.Linear, c, sx, sy, al)
      val acc = local.count { case (x, y) => m.predict(x) == y } / local.length.toDouble
      println(s"c=$c sweeps=$sw -> acc=$acc svs=${sx.length} w=${m.weights(4).toSeq}")
    }
    spark.stop()
  }
}
