package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TeraSort facade (reference: dislib/sorting/terasort/base.py:49-343 —
  * sample min/max, range-partition into buckets, sort each bucket).
  * Spark's `orderBy` IS TeraSort: RangePartitioner samples split points,
  * one shuffle, per-partition sort — so `sort` is a direct delegate.
  * The reference's per-column independent mode (column_indexes) breaks
  * row pairing on purpose; reproduced via positional re-join. */
object TeraSort {

  def sort(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)

  /** Sort each column independently (row pairing intentionally broken —
    * base.py:70-120 column_indexes mode): values at position i are the
    * i-th order statistics of each column. Positions come from
    * zipWithIndex over the range-partitioned sort — the whole pipeline
    * stays partition-parallel (a global Window.orderBy would funnel
    * every row through one partition). */
  def sortColumnsIndependently(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = cols.map { c =>
      val field = df.schema(c)
      val vals = df.select(col(c)).orderBy(col(c)).rdd.zipWithIndex()
        .map { case (r, i) => org.apache.spark.sql.Row(i + 1, r.get(0)) }
      spark.createDataFrame(vals, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType, nullable = false), field)))
    }
    sorted.reduce((a, b) => a.join(b, "pos")).orderBy("pos")
  }

  /** Gate query: independent per-column sort of two lineitem columns,
    * first 200 order statistics. */
  def query(spark: SparkSession, dir: String): DataFrame =
    sortColumnsIndependently(
      Tables.lineitem(spark, dir).select("l_quantity", "l_extendedprice"),
      Seq("l_quantity", "l_extendedprice"))
      .filter(col("pos") <= 200)

  val oracle: String =
    """SELECT a.pos, a.l_quantity, b.l_extendedprice FROM
      |  (SELECT row_number() OVER (ORDER BY l_quantity) AS pos, l_quantity
      |   FROM lineitem) a
      |JOIN
      |  (SELECT row_number() OVER (ORDER BY l_extendedprice) AS pos, l_extendedprice
      |   FROM lineitem) b
      |ON a.pos = b.pos WHERE a.pos <= 200 ORDER BY a.pos""".stripMargin
}
