package graft.ml

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** StandardScaler / MinMaxScaler with inverse transforms (reference:
  * dislib/preprocessing/standard_scaler.py:18-345, minmax_scaler.py:18-326).
  *
  * fit = one partial+final aggregate pass over the data (Summarizer-style,
  * SURVEY.md §2.5); transform = broadcast-free codegen'd arithmetic (the
  * fitted stats are driver-side literals — at 100 TB the transform adds
  * zero shuffles). Inverse transforms recover originals algebraically.
  */
object Scalers {

  final case class StandardModel(stats: Map[String, (Double, Double)]) {
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (m, s))) =>
        d.withColumn(s"${c}_std", (col(c) - lit(m)) / lit(s))
      }
    def inverse(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (m, s))) =>
        d.withColumn(s"${c}_orig", col(s"${c}_std") * lit(s) + lit(m))
      }
  }

  /** Zero scale → 1.0 (sklearn _handle_zeros_in_scale: a constant column
    * scales to 0, not NaN/Inf — matching the reference's sklearn-backed
    * scalers). */
  private def nz(s: Double): Double = if (s == 0.0 || s.isNaN) 1.0 else s

  def fitStandard(df: DataFrame, cols: Seq[String]): StandardModel = {
    val aggs = cols.flatMap(c => Seq(avg(c).as(s"m_$c"), stddev_samp(col(c)).as(s"s_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    StandardModel(cols.map(c =>
      c -> (r.getAs[Double](s"m_$c"), nz(r.getAs[Double](s"s_$c")))).toMap)
  }

  final case class MinMaxModel(stats: Map[String, (Double, Double)],
      range: (Double, Double) = (0.0, 1.0)) {
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (lo, hi))) =>
        val (a, b) = range
        d.withColumn(s"${c}_mm", (col(c) - lit(lo)) / lit(nz(hi - lo)) * lit(b - a) + lit(a))
      }
    def inverse(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (lo, hi))) =>
        val (a, b) = range
        d.withColumn(s"${c}_orig", (col(s"${c}_mm") - lit(a)) / lit(b - a) * lit(nz(hi - lo)) + lit(lo))
      }
  }

  def fitMinMax(df: DataFrame, cols: Seq[String]): MinMaxModel = {
    val aggs = cols.flatMap(c => Seq(min(c).as(s"lo_$c"), max(c).as(s"hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    MinMaxModel(cols.map(c =>
      c -> (r.getAs[Double](s"lo_$c"), r.getAs[Double](s"hi_$c"))).toMap)
  }

  private val scaleCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** Gate query: standard-scale 3 lineitem columns, report per-flag stats
    * of the scaled values (mean ≈ 0 / sd ≈ 1 overall; per-group varies). */
  def standardQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val scaled = fitStandard(li, scaleCols).transform(li)
    scaled.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(avg("l_quantity_std"), 6).as("mean_qty_std"),
        round(stddev_samp(col("l_quantity_std")), 6).as("sd_qty_std"),
        round(avg("l_extendedprice_std"), 6).as("mean_price_std"),
        round(avg("l_discount_std"), 6).as("mean_disc_std"))
      .orderBy("l_returnflag")
  }

  /** Gate query: min-max-scale to [0,1], report per-flag stats (min/max
    * are exact so the scaled extrema are exactly 0/1 overall). */
  def minmaxQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val scaled = fitMinMax(li, scaleCols).transform(li)
    scaled.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(avg("l_quantity_mm"), 6).as("mean_qty_mm"),
        round(min("l_quantity_mm"), 6).as("min_qty_mm"),
        round(max("l_quantity_mm"), 6).as("max_qty_mm"),
        round(avg("l_extendedprice_mm"), 6).as("mean_price_mm"))
      .orderBy("l_returnflag")
  }

  val standardOracle: String =
    """WITH st AS (SELECT avg(l_quantity) AS mq, stddev_samp(l_quantity) AS sq,
      |    avg(l_extendedprice) AS mp, stddev_samp(l_extendedprice) AS sp,
      |    avg(l_discount) AS md, stddev_samp(l_discount) AS sd FROM lineitem)
      |SELECT l_returnflag, count(*) AS n,
      |  round(avg((l_quantity - mq) / sq), 6) AS mean_qty_std,
      |  round(stddev_samp((l_quantity - mq) / sq), 6) AS sd_qty_std,
      |  round(avg((l_extendedprice - mp) / sp), 6) AS mean_price_std,
      |  round(avg((l_discount - md) / sd), 6) AS mean_disc_std
      |FROM lineitem CROSS JOIN st
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val minmaxOracle: String =
    """WITH st AS (SELECT min(l_quantity) AS loq, max(l_quantity) AS hiq,
      |    min(l_extendedprice) AS lop, max(l_extendedprice) AS hip FROM lineitem)
      |SELECT l_returnflag, count(*) AS n,
      |  round(avg((l_quantity - loq) / (hiq - loq)), 6) AS mean_qty_mm,
      |  round(min((l_quantity - loq) / (hiq - loq)), 6) AS min_qty_mm,
      |  round(max((l_quantity - loq) / (hiq - loq)), 6) AS max_qty_mm,
      |  round(avg((l_extendedprice - lop) / (hip - lop)), 6) AS mean_price_mm
      |FROM lineitem CROSS JOIN st
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
