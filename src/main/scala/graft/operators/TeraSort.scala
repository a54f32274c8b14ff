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
    * i-th order statistics of each column. */
  def sortColumnsIndependently(df: DataFrame, cols: Seq[String]): DataFrame = {
    val sorted = cols.map { c =>
      df.select(col(c))
        .withColumn("pos", row_number().over(Window.orderBy(col(c))))
    }
    sorted.reduce((a, b) => a.join(b, "pos")).orderBy("pos")
  }

  /** Gate query: independent per-column sort of two lineitem columns,
    * first 200 order statistics. (A global Window.orderBy funnels through
    * one partition — acceptable here only because the output is capped;
    * the scale path for full-column order statistics is zipWithIndex on
    * the range-partitioned sort.) */
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
