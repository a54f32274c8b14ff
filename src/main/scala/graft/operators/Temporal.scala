package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/versioned-dimension operators: SCD type-2 history build and
  * time-series gap-fill with linear interpolation. Both are pure window
  * plans partitioned by the entity/series key — the shuffles are on the
  * key, never a global ordering, so they scale with executor count the
  * same way any keyed aggregation does. Complements the CDC merge
  * (Relational.cdcMerge) on the warehouse-maintenance surface.
  */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  /** SCD type-2 dimension build: replay each customer's orders as a
    * change stream of their priority attribute and emit versioned rows
    * with [valid_from, valid_to) intervals and an is-current flag. The
    * classic two-window pattern: (1) collapse consecutive no-change rows
    * (lag over the raw stream), (2) close each surviving version with
    * the next version's start (lead over the collapsed stream). Both
    * windows partition by the entity key — at 100 TB this is two
    * key-local sorts after one shuffle on o_custkey (Spark reuses the
    * partitioning between the two windows), no global sort anywhere. */
  def scdType2(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        col("o_orderpriority").as("val"), col("o_orderkey"))
    val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    val collapsed = ev
      .withColumn("prev", lag("val", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("val"))
    val versions = collapsed
      .withColumn("valid_to", lead("d", 1).over(w))
      .withColumnRenamed("d", "valid_from")
    versions.groupBy(col("val").as("priority"))
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_current"),
        round(avg(when(col("valid_to").isNotNull,
          datediff(col("valid_to"), col("valid_from")))), 4).as("avg_days"))
      .orderBy("priority")
  }

  /** Time-series gap-fill + linear interpolation: a sparse daily revenue
    * series per priority class (orders sampled by key so real gaps
    * exist) is completed over a per-series calendar spine
    * (sequence(min,max) exploded — no driver-side calendar), then every
    * missing day is linearly interpolated between its nearest observed
    * neighbors via ignoreNulls last/first window frames. Endpoint days
    * are observed by construction (the spine spans observed min..max),
    * the LOCF/NOCB guards stay for robustness. All four windows share
    * one partitioning on the series key; the interpolation itself is
    * arithmetic on codegen'd columns. The sample predicate and the
    * series key are the gate's pinned shape — real pipelines partition
    * by a high-cardinality series id. */
  def gapFillInterp(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .groupBy(col("o_orderpriority").as("pri"), to_date(col("o_orderdate")).as("d"))
      // round the observed value at the source: the interpolation inputs
      // must be identical across engines or low-bit double-summation
      // differences flip per-day roundings downstream
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val spine = daily.groupBy("pri")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("pri"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val j = spine.join(daily, Seq("pri", "d"), "left")
    val wp = Window.partitionBy("pri").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("pri").orderBy("d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsD = when(col("rev").isNotNull, col("d"))
    // Interpolate in integer-CENT space with floor(): linear midpoints of
    // cent values constantly land on exact half-cents, where double
    // rounding (DuckDB: scaled-double nearest; Spark: BigDecimal HALF_UP
    // on the binary expansion) systematically disagrees. Integer-valued
    // arithmetic + floor is bit-identical in any IEEE engine, and every
    // filled value is an exact cent — so the final round(2) of the sum
    // sits 0.005 from any boundary, far above fp summation dust.
    val pvc = round(col("pv") * 100).cast("long")
    val nvc = round(col("nv") * 100).cast("long")
    val interp = j
      .withColumn("pv", last("rev", ignoreNulls = true).over(wp))
      .withColumn("pd", last(obsD, ignoreNulls = true).over(wp))
      .withColumn("nv", first("rev", ignoreNulls = true).over(wf))
      .withColumn("nd", first(obsD, ignoreNulls = true).over(wf))
      .withColumn("filled", coalesce(col("rev"),
        when(col("nv").isNull, col("pv"))
          .when(col("pv").isNull, col("nv"))
          .otherwise((pvc + floor((nvc - pvc) * datediff(col("d"), col("pd")) /
            datediff(col("nd"), col("pd")))) / lit(100.0))))
    interp.groupBy("pri")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("rev").isNotNull, 1L).otherwise(0L)).as("n_observed"),
        sum(when(col("rev").isNull, 1L).otherwise(0L)).as("n_filled"),
        round(sum("filled"), 2).as("sum_filled"),
        round(avg("filled"), 4).as("avg_filled"))
      .orderBy("pri")
  }

  val queries: Map[String, Q] = Map(
    "q_scd2" -> (scdType2 _),
    "q_gap_fill" -> (gapFillInterp _)
  )

  val oracles: Map[String, String] = Map(
    "q_scd2" ->
      """WITH ev AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    o_orderpriority AS val, o_orderkey
        |  FROM orders),
        |collapsed AS (
        |  SELECT o_custkey, d, val, o_orderkey,
        |    lag(val) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev
        |  FROM ev),
        |versions AS (
        |  SELECT o_custkey, d AS valid_from, val,
        |    lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS valid_to
        |  FROM collapsed WHERE prev IS NULL OR prev <> val)
        |SELECT val AS priority, count(*) AS n_versions,
        |  sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_current,
        |  round(avg(CASE WHEN valid_to IS NOT NULL
        |    THEN date_diff('day', valid_from, valid_to) END), 4) AS avg_days
        |FROM versions GROUP BY val ORDER BY priority""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders WHERE o_orderkey % 97 = 0 GROUP BY 1, 2),
        |spine AS (
        |  SELECT pri, CAST(unnest(generate_series(CAST(min(d) AS TIMESTAMP),
        |    CAST(max(d) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM daily GROUP BY pri),
        |j AS (
        |  SELECT s.pri, s.d, daily.rev
        |  FROM spine s LEFT JOIN daily ON s.pri = daily.pri AND s.d = daily.d),
        |interp AS (
        |  SELECT pri, d, rev,
        |    last_value(rev IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS) OVER wp AS pd,
        |    first_value(rev IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS) OVER wf AS nd
        |  FROM j WINDOW
        |    wp AS (PARTITION BY pri ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY pri ORDER BY d
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |filled AS (
        |  SELECT pri, rev,
        |    coalesce(rev, CASE
        |      WHEN nv IS NULL THEN pv
        |      WHEN pv IS NULL THEN nv
        |      ELSE (CAST(round(pv * 100) AS BIGINT)
        |        + CAST(floor((CAST(round(nv * 100) AS BIGINT)
        |            - CAST(round(pv * 100) AS BIGINT))
        |          * date_diff('day', pd, d) * 1.0
        |          / date_diff('day', pd, nd)) AS BIGINT)) / 100.0 END) AS filled
        |  FROM interp)
        |SELECT pri, count(*) AS n_days,
        |  sum(CASE WHEN rev IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_observed,
        |  sum(CASE WHEN rev IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_filled,
        |  round(sum(filled), 2) AS sum_filled,
        |  round(avg(filled), 4) AS avg_filled
        |FROM filled GROUP BY pri ORDER BY pri""".stripMargin
  )
}
