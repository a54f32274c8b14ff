package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for q_jaccard_prefix (judge r11 ask #5). */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_derived")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    // warm
    spark.range(10).count()
    t("full gate")(graft.operators.Dedup.prefixJaccard(spark, dir).count())
    t("full gate again")(graft.operators.Dedup.prefixJaccard(spark, dir).count())
    t("census")(graft.operators.Dedup.prefixJaccardCensus(spark, dir)
      .collect().mkString)
    spark.stop()
  }
}
