package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.ml.CascadeSvmGraft.query(spark, "/root/testdata/sf0.01")
      .collect().map(_.toSeq).mkString(";")
    println("CSVM_RESULT=" + out)
    spark.stop()
  }
}
