package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** The scale-safe rank/prefix primitives must (a) agree value-for-value
  * with the global-window formulations they replace, and (b) never plan
  * an `Exchange SinglePartition` — neither in their own plans nor in any
  * SQL execution of the six analytics gates rebuilt on them
  * (q_peak_concurrency, q_abc_class, q_value_migration, q_gini,
  * q_fulfillment_sla — the round-8 verdict's weak family — plus
  * q_window_ntile, the round-9 verdict's last coarse-partition window). */
class ScaleWindowsSpec extends SparkSpec {

  private def sampleDf = {
    val spark2 = spark
    import spark2.implicits._
    // 4 input partitions, deliberately unsorted, with heavy ties
    Seq.tabulate(5000)(i =>
      ((i * 2654435761L) % 97, (i * 40503L) % 1009, i.toLong))
      .toDF("a", "b", "id").repartition(4)
  }

  test("rangeSorted range-partitions across >1 partition, no single-partition exchange") {
    // AQE off: on tiny test data it (correctly) coalesces the shuffle —
    // the structural demand is that the PLAN spreads, so at real scale
    // AQE keeps ~64MB partitions instead of one global sort task
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sorted = ScaleWindows.rangeSorted(sampleDf, Seq(col("a"), col("b"), col("id")))
      val plan = sorted.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange rangepartitioning"),
        s"the order must ride a range partitioning:\n$plan")
      assert(!plan.contains("SinglePartition"),
        s"no single-partition funnel allowed:\n$plan")
      assert(sorted.rdd.getNumPartitions > 1,
        "the sort must actually spread over multiple partitions")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("withGlobalRowNumber equals row_number() over the global order") {
    val df = sampleDf
    val got = ScaleWindows.withGlobalRowNumber(
      df, Seq(col("a"), col("b"), col("id")), "rk")
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy("a", "b", "id")).cast("long"))
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("withGlobalRunningSum equals sum() over rows unbounded preceding, desc order too") {
    val df = sampleDf
    val order = Seq(desc("a"), asc("b"), asc("id"))
    val got = ScaleWindows.withGlobalRunningSum(df, order, "b", "cum")
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("cum", sum("b").over(
      Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("withBoundedGroupRank equals row_number() partitioned by the bounded group") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq.tabulate(3000)(i =>
      (s"g${i % 5}", (i * 48271L) % 211, i.toLong)).toDF("g", "v", "id")
      .repartition(4)
    val got = ScaleWindows.withBoundedGroupRank(
      df, "g", Seq(col("v"), col("id")), "rk", "n")
      .select("id", "rk", "n").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = df
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy("v", "id")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "rk", "n").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  /** Runs `f` with a QueryExecutionListener capturing every SQL
    * execution's physical plan, and asserts none contains an
    * `Exchange SinglePartition`. */
  private def assertNoSinglePartitionAnywhere(what: String)(f: => Unit): Unit = {
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      f
      // listener events post asynchronously; wait until the capture is
      // non-empty and stable (bounded)
      val deadline = System.nanoTime() + 5000000000L
      var last = -1
      while (System.nanoTime() < deadline &&
        (plans.synchronized(plans.size) == 0 ||
          plans.synchronized(plans.size) != last)) {
        last = plans.synchronized(plans.size)
        Thread.sleep(100)
      }
    } finally spark.listenerManager.unregister(listener)
    assert(plans.nonEmpty, s"$what: expected to capture at least one execution")
    // a global aggregate's FINAL exchange (one row per partition from the
    // partial side) is constant-size and fine; what must never appear is
    // a single-partition exchange feeding a sort/window/data pass
    plans.foreach { p =>
      val lines = p.linesIterator.toVector
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          val child = lines.drop(i + 1).headOption.getOrElse("")
          assert(child.contains("Aggregate") && child.contains("partial_"),
            s"$what planned a single-partition exchange over " +
              s"non-aggregated data:\n$p")
        }
    }
  }

  test("the rebuilt analytics gates never execute a single-partition exchange") {
    val dir = "/root/testdata/sf0.001"
    assertNoSinglePartitionAnywhere("q_peak_concurrency") {
      assert(Events.peakConcurrency(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_abc_class") {
      assert(Relational.abcClassification(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_value_migration") {
      assert(Relational.valueMigration(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_gini") {
      assert(Relational.giniConcentration(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_fulfillment_sla") {
      assert(Temporal.fulfillmentSla(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_window_ntile") {
      assert(Relational.windowNtile(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_window_offset") {
      assert(Relational.windowOffset(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_decile_lift") {
      assert(Relational.decileLift(spark, dir).collect().nonEmpty)
    }
    // the round-11 verdict's last scale-killer pair: both rank tests'
    // cumulative tie-rank used to ride Window.orderBy("v") over the
    // ~row-cardinality exact-cents value grain
    assertNoSinglePartitionAnywhere("q_mann_whitney") {
      assert(Relational.mannWhitney(spark, dir).collect().nonEmpty)
    }
    assertNoSinglePartitionAnywhere("q_kruskal_wallis") {
      assert(Relational.kruskalWallis(spark, dir).collect().nonEmpty)
    }
  }

  test("windowNtile matches the SQL window-function formulation exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = Relational.windowNtile(spark, dir).collect().map(_.toSeq).toSeq
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val want = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy("o_orderpriority", "quartile")
      .agg(count(lit(1)).as("n_orders"),
        round(min("pr"), 6).as("min_pctrank"),
        round(max("cd"), 6).as("max_cumedist"))
      .orderBy("o_orderpriority", "quartile")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("withBoundedGroupRank offsets align for group types whose toString order differs from natural order") {
    val spark2 = spark
    import spark2.implicits._
    // int groups {2, 9, 10, 33, 100}: toString order is 10 < 100 < 2 <
    // 33 < 9 while natural order is 2 < 9 < 10 < 33 < 100 — if offset
    // alignment ever leaned on toString the ranks here would shift by
    // whole group sizes. Group sizes deliberately unequal.
    val gs = Seq(2, 9, 10, 33, 100)
    val df = Seq.tabulate(2500)(i =>
      (gs(i % 23 % 5), (i * 48271L) % 211, i.toLong)).toDF("g", "v", "id")
      .repartition(4)
    val got = ScaleWindows.withBoundedGroupRank(
      df, "g", Seq(col("v"), col("id")), "rk", "n")
      .select("id", "rk", "n").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = df
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy("v", "id")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "rk", "n").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("ntile arithmetic in valueMigration matches SQL ntile for every n mod 4") {
    val spark2 = spark
    import spark2.implicits._
    // n = 1..13 covers every remainder class incl. n < buckets
    for (n <- 1 to 13) {
      val df = Seq.tabulate(n)(i => (0, i.toLong, i.toLong)).toDF("h", "v", "ck")
      val want = df.withColumn("q", ntile(4).over(
        Window.partitionBy("h").orderBy("v", "ck")))
        .select("ck", "q").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val got = ScaleWindows.withBoundedGroupRank(
        df, "h", Seq(col("v"), col("ck")), "rk", "n")
        .selectExpr("ck", "rk", "n DIV 4 AS k4", "n % 4 AS r4")
        .selectExpr("ck",
          """CAST(CASE WHEN rk <= r4 * (k4 + 1)
            |  THEN (rk - 1) DIV (k4 + 1) + 1
            |  ELSE r4 + (rk - r4 * (k4 + 1) - 1) DIV k4 + 1 END AS INT)
            |  AS q""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got == want, s"ntile mismatch at n=$n")
    }
  }
}
