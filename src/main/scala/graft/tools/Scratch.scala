package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql("SELECT vec_dot(array(1D,2D), array(3D,4D)) AS d").head()
    println("EXT_VEC_DOT=" + r.getDouble(0))
    spark.stop()
  }
}
