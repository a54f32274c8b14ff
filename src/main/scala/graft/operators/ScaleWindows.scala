package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe replacements for global (unpartitioned / constant-
  * partition) rank and prefix-sum windows. A `Window.orderBy(...)` with
  * no partitioning plans `Exchange SinglePartition` — one task sorts and
  * sweeps the whole input, the exact funnel TeraSort.scala documents as
  * the anti-pattern. These helpers keep the same total-order semantics
  * on the TeraSort posture instead: a range-partitioned sort (sampled
  * split points, every partition sorts in parallel) plus the two-pass
  * broadcast-offset pattern of TextAnalysis.withStartOffsets — one tiny
  * job collects ONE long per partition, a driver scanLeft turns those
  * into start offsets, and a second linear pass stamps each row with its
  * global rank / running sum. Nothing data-proportional ever reaches the
  * driver or a single task.
  *
  * Requirements: `order` must be a total order (fully tie-broken) for
  * deterministic output, and the running-sum value column must be LONG. */
object ScaleWindows {

  /** The range-partitioned sort both passes ride. Exposed so plan specs
    * can assert it exchanges by `rangepartitioning`, never
    * `SinglePartition`. */
  private[graft] def rangeSorted(df: DataFrame, order: Seq[Column]): DataFrame =
    df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)

  /** All original columns plus a 1-based global LONG row number under
    * `order` — the scale-safe `row_number() OVER (ORDER BY ...)`.
    * zipWithIndex IS the two-pass pattern (a count job per partition,
    * then an offset-stamping map); the sort shuffle is computed once and
    * reused by both jobs. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
      rkName: String): DataFrame = {
    val sorted = rangeSorted(df, order)
    val schema = sorted.schema.add(rkName, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** All original columns plus the INCLUSIVE global running sum of
    * `valueCol` (LONG) under `order` — the scale-safe
    * `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`. */
  def withGlobalRunningSum(df: DataFrame, order: Seq[Column],
      valueCol: String, cumName: String): DataFrame = {
    val sorted = rangeSorted(df, order)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partSums = rdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator.single((i, it.foldLeft(0L)((a, r) => a + r.getLong(idx)))))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bc.value(i)
      it.map { r => cum += r.getLong(idx); Row.fromSeq(r.toSeq :+ cum) }
    }
    df.sparkSession.createDataFrame(out,
      sorted.schema.add(cumName, LongType, nullable = false))
  }

  /** Per-group 1-based rank under `order` when the GROUP SPACE IS
    * BOUNDED (segments, priorities, halves — never a data-proportional
    * key): ONE global range-partitioned sort over (group, order...),
    * then rank-within-group = global row number − the group's start
    * offset, where offsets come from a bounded groupBy collected to the
    * driver (|groups| rows — the bounded-collect posture). Returns the
    * frame plus `rkName` (1-based within group) and `nName` (group
    * size). The scale-safe `row_number() OVER (PARTITION BY g ORDER BY
    * ...)` for constant-cardinality g where a data-proportional grain
    * would otherwise funnel through |groups| sort partitions. */
  def withBoundedGroupRank(df: DataFrame, groupCol: String,
      order: Seq[Column], rkName: String, nName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val ranked = withGlobalRowNumber(df,
      col(groupCol) +: order, "__grk")
    // bounded: |groups| is constant by contract (caller documents it)
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.get(0), r.getLong(1)))
      .sortBy(_._1.toString)
    // groups sort by the SAME key order the global sort used, so start
    // offsets are the scanLeft of counts in that order. Non-string group
    // types must order identically under toString for this sort — the
    // callers use strings/ints whose natural order matches.
    val sortedGroups = {
      // re-sort by the actual group ordering: rely on the first column
      // of a 1-row-per-group frame sorted by Spark itself (engine order)
      val gdf = df.sparkSession.createDataFrame(
        spark.sparkContext.parallelize(counts.map(r => Row(r._1, r._2)).toSeq),
        org.apache.spark.sql.types.StructType(Seq(
          df.schema(groupCol),
          org.apache.spark.sql.types.StructField("__n", LongType))))
      gdf.orderBy(groupCol).collect().map(r => (r.get(0), r.getLong(1)))
    }
    val offs = sortedGroups.map(_._2).scanLeft(0L)(_ + _)
    val offRows = sortedGroups.zipWithIndex.map { case ((g, n), i) =>
      Row(g, offs(i), n)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(groupCol),
        org.apache.spark.sql.types.StructField("__off", LongType),
        org.apache.spark.sql.types.StructField(nName, LongType))))
    ranked.join(broadcast(offDf), groupCol)
      .withColumn(rkName, col("__grk") - col("__off"))
      .drop("__grk", "__off")
  }
}
