package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming semantics vs their batch twins: the same rows fed through a
  * MemoryStream must aggregate identically to the batch DataFrame plan. */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private def sampleRows: Seq[(Long, Timestamp, String, Double)] = Seq(
    (1L, ts(0), "click", 1.0), (1L, ts(3), "click", 2.0),
    (2L, ts(5), "view", 1.5), (1L, ts(12), "click", 0.5),
    (2L, ts(14), "view", 2.5), (1L, ts(55), "click", 1.0),
    (2L, ts(90), "purchase", 9.0))

  test("streaming windowed counts == batch windowed counts") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(sampleRows: _*)
    val stream = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val got = EventsStreaming.runToMemory(
      EventsStreaming.windowedCounts(stream), "win_counts", OutputMode.Append())
    // append mode emits only watermark-closed windows; rerun complete for full compare
    val memC = MemoryStream[(Long, Timestamp, String, Double)]
    memC.addData(sampleRows: _*)
    val streamC = memC.toDF().toDF("user_id", "ts", "event_type", "value")
    val gotC = EventsStreaming.runToMemory(
      windowedComplete(streamC), "win_counts_c", OutputMode.Complete())
    val batch = sampleRows.toDF("user_id", "ts", "event_type", "value")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n_events"), col("sum_value"))
    val a = gotC.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(a == b, s"stream $a vs batch $b")
    assert(got.columns.toSeq ==
      Seq("wstart", "event_type", "n_events", "sum_value"))
  }

  private def windowedComplete(events: org.apache.spark.sql.DataFrame) =
    events.groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value"))

  test("streaming session windows match 30-minute gap semantics") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(sampleRows: _*)
    val stream = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val sess = EventsStreaming.runToMemory(
      sessionComplete(stream), "sessions", OutputMode.Complete())
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // user 1: events at 0,3,12,55 → gaps 3,9,43 → sessions {0,3,12},{55}
    // user 2: 5,14,90 → sessions {5,14},{90}
    assert(sess(1L) == Seq(1L, 3L), s"user1 sessions: ${sess(1L)}")
    assert(sess(2L) == Seq(1L, 2L), s"user2 sessions: ${sess(2L)}")
  }

  private def sessionComplete(events: org.apache.spark.sql.DataFrame) =
    events.groupBy(session_window(col("ts"), "30 minutes").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))

  test("crostonStream carries keyed state across batches and matches the batch fold") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[EventsStreaming.DemandDay]
    // batch 1: part 1 first demand only — state must carry to batch 2
    mem.addData(EventsStreaming.DemandDay(
      1L, java.sql.Date.valueOf("2020-01-01"), 10L))
    val q = EventsStreaming.crostonStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("croston_spec")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: part 1 second demand (gap 3) + part 2 first
    mem.addData(
      EventsStreaming.DemandDay(1L, java.sql.Date.valueOf("2020-01-04"), 20L),
      EventsStreaming.DemandDay(2L, java.sql.Date.valueOf("2020-02-01"), 7L))
    q.processAllAvailable(); q.stop()
    // the LAST emission per part must equal Temporal.crostonOf's fold:
    // z2 = (20e6 + 4·10e6)/5 = 12e6, p2 = (3e6 + 4e6)/5 = 1.4e6,
    // rate = 12e12 DIV 1.4e6 = 8571428
    val last = spark.table("croston_spec").collect().toSeq
      .groupBy(_.getLong(0)).view
      .mapValues(_.maxBy(_.getLong(1))).toMap
    assert((last(1L).getLong(1), last(1L).getLong(2), last(1L).getLong(3),
      last(1L).getLong(4)) == ((2L, 12000000L, 1400000L, 8571428L)))
    assert((last(2L).getLong(1), last(2L).getLong(2), last(2L).getLong(3),
      last(2L).getLong(4)) == ((1L, 7000000L, 1000000L, 7000000L)))
  }

  test("flatMapGroupsWithState click attribution matches batch as-of join") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val rows = Seq(
      EventsStreaming.RawEvent(1L, 1L, "click", ts(0)),
      EventsStreaming.RawEvent(2L, 1L, "purchase", ts(5)),
      EventsStreaming.RawEvent(3L, 2L, "purchase", ts(6)), // no prior click
      EventsStreaming.RawEvent(4L, 1L, "click", ts(9)),
      EventsStreaming.RawEvent(5L, 1L, "purchase", ts(12)),
      EventsStreaming.RawEvent(6L, 2L, "click", ts(15)),
      EventsStreaming.RawEvent(7L, 2L, "purchase", ts(20)))
    val mem = MemoryStream[EventsStreaming.RawEvent]
    mem.addData(rows: _*)
    val q = EventsStreaming.clickAttribution(mem.toDS())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attrib").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(got(2L) == Some(ts(0)))
    assert(got(3L) == None)
    assert(got(5L) == Some(ts(9)))
    assert(got(7L) == Some(ts(15)))
    // batch twin agrees (operators.Events.asofJoin formulation)
    val batch = rows.toDF("event_id", "user_id", "event_type", "ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val b = batch.withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(4))).toMap
    assert(b == got)
  }

  test("funnelStages walks view→click→purchase and ignores out-of-order stages") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val rows = Seq(
      EventsStreaming.RawEvent(1L, 1L, "click", ts(0)),    // before any view: ignored
      EventsStreaming.RawEvent(2L, 1L, "view", ts(2)),     // stage 1
      EventsStreaming.RawEvent(3L, 1L, "purchase", ts(4)), // before click: ignored
      EventsStreaming.RawEvent(4L, 1L, "click", ts(6)),    // stage 2
      EventsStreaming.RawEvent(5L, 1L, "click", ts(8)),    // already staged: ignored
      EventsStreaming.RawEvent(6L, 1L, "purchase", ts(9)), // stage 3
      EventsStreaming.RawEvent(7L, 2L, "view", ts(1)),     // stage 1, funnel never completes
      EventsStreaming.RawEvent(8L, 2L, "purchase", ts(3)))
    val mem = MemoryStream[EventsStreaming.RawEvent]
    mem.addData(rows: _*)
    val q = EventsStreaming.funnelStages(mem.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    assert(got == Set(
      (1L, 1, ts(2)), (1L, 2, ts(6)), (1L, 3, ts(9)),
      (2L, 1, ts(1))), s"got $got")
    // state carries across batches: a later purchase for user 2 needs a click first
    val mem2 = MemoryStream[EventsStreaming.RawEvent]
    mem2.addData(rows: _*)
    val q2src = EventsStreaming.funnelStages(mem2.toDS())
    val q2 = q2src.writeStream.format("memory").queryName("funnel2")
      .outputMode("append").start()
    q2.processAllAvailable()
    mem2.addData(
      EventsStreaming.RawEvent(9L, 2L, "click", ts(10)),
      EventsStreaming.RawEvent(10L, 2L, "purchase", ts(12)))
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.table("funnel2").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got2.contains((2L, 2)) && got2.contains((2L, 3)), s"got2 $got2")
  }

  test("unordered click attribution buffers out-of-order cross-batch events") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[EventsStreaming.RawEvent]
    // Batch 1 delivers the purchase BEFORE the click that precedes it in
    // event time; the click only arrives in batch 2. An ordered (arrival-
    // order) processor would attribute purchase@40 to click@10.
    mem.addData(
      EventsStreaming.RawEvent(1L, 1L, "click", ts(10)),
      EventsStreaming.RawEvent(2L, 1L, "purchase", ts(40)))
    val q = EventsStreaming.clickAttributionUnordered(mem.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("attrib_ooo").outputMode("append").start()
    q.processAllAvailable() // watermark after batch 1: 40 - 30 = minute 10
    mem.addData(
      EventsStreaming.RawEvent(3L, 1L, "click", ts(35)), // late: before purchase@40 in event time
      EventsStreaming.RawEvent(90L, 99L, "view", ts(90))) // sentinel pushes watermark to 60
    q.processAllAvailable()
    mem.addData(EventsStreaming.RawEvent(91L, 99L, "view", ts(91)))
    q.processAllAvailable() // batch 3 runs at watermark 60 → user 1 drains via timeout
    q.stop()
    val got = spark.table("attrib_ooo").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(got == Map(2L -> Some(ts(35))), s"got $got")
    // batch twin on the same (event-time-ordered) history agrees
    val rows = Seq((1L, 1L, "click", ts(10)), (3L, 1L, "click", ts(35)),
      (2L, 1L, "purchase", ts(40)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val b = rows.toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(4))).toMap
    assert(b == got, s"batch $b vs stream $got")
  }

  test("unordered attribution does not finalize an event AT the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[EventsStreaming.RawEvent]
    mem.addData(
      EventsStreaming.RawEvent(2L, 1L, "purchase", ts(40)),
      EventsStreaming.RawEvent(90L, 99L, "view", ts(70))) // watermark after b1: 40
    val q = EventsStreaming.clickAttributionUnordered(mem.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("attrib_wm").outputMode("append").start()
    q.processAllAvailable()
    // same max event time → the watermark STAYS exactly 40 for batch 2
    mem.addData(EventsStreaming.RawEvent(91L, 99L, "view", ts(70)))
    q.processAllAvailable()
    // purchase@40 must still be buffered: Spark's own late filter is the
    // only authority on whether a ts == watermark peer can still arrive,
    // so the drain stays strictly below the watermark either way
    assert(spark.table("attrib_wm").count() == 0,
      "event at the watermark must not finalize yet")
    mem.addData(EventsStreaming.RawEvent(92L, 99L, "view", ts(100)))
    q.processAllAvailable() // watermark 41 → 70: timeout drains user 1
    q.stop()
    val got = spark.table("attrib_wm").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(got == Map(2L -> None), s"got $got")
  }

  test("unordered funnel replays shuffled arrivals in event-time order") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[EventsStreaming.RawEvent]
    // click arrives a batch BEFORE the view that precedes it in event
    // time — the ordered automaton would reject it (no view yet).
    mem.addData(
      EventsStreaming.RawEvent(1L, 1L, "click", ts(5)),
      EventsStreaming.RawEvent(2L, 1L, "purchase", ts(8)))
    val q = EventsStreaming.funnelStagesUnordered(mem.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("funnel_ooo").outputMode("append").start()
    q.processAllAvailable()
    mem.addData(
      EventsStreaming.RawEvent(3L, 1L, "view", ts(2)), // late view, earliest in event time
      EventsStreaming.RawEvent(90L, 99L, "view", ts(60))) // watermark → 30
    q.processAllAvailable()
    mem.addData(EventsStreaming.RawEvent(91L, 99L, "view", ts(61)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_ooo").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2)))
      .filter(_._1 == 1L).toSet
    assert(got == Set((1L, 1, ts(2)), (1L, 2, ts(5)), (1L, 3, ts(8))), s"got $got")
  }

  test("stream-stream interval join emits all view-click pairs, out of order across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val rows = Seq(
      (1L, ts(0), "view", 0.0), (1L, ts(4), "click", 0.0),
      (1L, ts(8), "click", 0.0),   // both clicks within 10m of view@0
      (1L, ts(30), "click", 0.0),  // outside horizon of view@0
      (2L, ts(10), "view", 0.0), (2L, ts(19), "click", 0.0),
      (3L, ts(5), "click", 0.0))   // click with no view: no pair
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val joined = EventsStreaming.viewClickIntervalJoin(stream)
    val q = joined.writeStream.format("memory")
      .queryName("vc_join").outputMode(OutputMode.Append()).start()
    // feed out of order and across batches: clicks for user 1 arrive
    // BEFORE its view, in a separate micro-batch
    mem.addData(rows.filter(_._3 == "click"): _*)
    q.processAllAvailable()
    mem.addData(rows.filter(_._3 == "view"): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vc_join").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val batch = Set(
      (1L, ts(0), ts(4)), (1L, ts(0), ts(8)), (2L, ts(10), ts(19)))
    assert(got == batch, s"got $got")
  }

  test("streaming dedup drops duplicate event ids") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(0), 1.0),
      (3L, ts(2), 3.0), (2L, ts(1), 2.0))
    val q = EventsStreaming.dedupEvents(
        mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_ev").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_ev").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)))
  }

  test("streaming HLL converges to the batch estimate across batches, dups, disorder") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    import EventsStreaming.ScopedValue
    val all = (1 to 900).map(i => ScopedValue(s"g${i % 2}", s"v${i % 450}"))
    val (b1, b2) = all.splitAt(400)
    val mem = MemoryStream[ScopedValue]
    val q = EventsStreaming.hllDistinctStream(mem.toDS())
      .writeStream.format("memory").queryName("hll_stream").outputMode("update").start()
    mem.addData(b1: _*); q.processAllAvailable()
    // batch 2 is shuffled and overlaps batch 1 — max-merge must not care
    mem.addData(scala.util.Random.shuffle(b2 ++ b1.take(50)): _*)
    q.processAllAvailable(); q.stop()
    // registers only grow, so used/est are nondecreasing across batches
    // and max = the final emission (row order in the sink is arbitrary)
    val streamed = spark.table("hll_stream")
      .groupBy("scope").agg(max("buckets_used").as("u"), max("est_distinct").as("e"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = graft.operators.Sketches.hllDistinctDf(
        all.toDF("scope", "v"))
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(4)))).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("streaming count-min converges to the batch sketch estimate") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    import EventsStreaming.ScopedValue
    // heavy token 'hot' 40x + tail across two batches, single scope
    val all = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"t${i % 20}")
    val (b1, b2) = all.splitAt(45)
    val mem = MemoryStream[ScopedValue]
    val q = EventsStreaming.countMinStream(
        mem.toDS(), probe = "hot")
      .writeStream.format("memory").queryName("cms_stream").outputMode("update").start()
    mem.addData(b1.map(ScopedValue("s", _)): _*); q.processAllAvailable()
    mem.addData(b2.map(ScopedValue("s", _)): _*); q.processAllAvailable()
    q.stop()
    // counters only grow: max = the final emission
    val last = spark.table("cms_stream")
      .groupBy("scope").agg(max("n_seen").as("n"), max("est_c").as("e"))
      .collect()(0)
    assert(last.getLong(1) == 100L)
    val batch = graft.operators.Sketches.countMinDf(all.toDF("w"))
      .collect().find(_.getString(0) == "hot").get
    assert(last.getLong(2) == batch.getLong(2),
      s"stream est ${last.getLong(2)} vs batch est ${batch.getLong(2)}")
    assert(last.getLong(2) >= 40L, "never underestimates the true 40")
  }

  test("streaming distinct registry equals batch distinct across dups and disorder") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    import EventsStreaming.ScopedValue
    // 300 values, only 75 distinct per scope; batch 2 shuffled + overlaps
    val all = (1 to 300).map(i => ScopedValue(s"g${i % 2}", s"v${i % 150}"))
    val (b1, b2) = all.splitAt(130)
    val mem = MemoryStream[ScopedValue]
    val q = EventsStreaming.distinctStream(mem.toDS())
      .writeStream.format("memory").queryName("dst_stream").outputMode("update").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(scala.util.Random.shuffle(b2 ++ b1.take(30)): _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dst_stream")
      .groupBy("scope").agg(max("n_unique").as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = all.toDF("scope", "v").groupBy("scope")
      .agg(countDistinct("v").as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // n_seen counts every arrival: 150 per scope + 15 replayed dups
    val seen = spark.table("dst_stream").agg(max("n_seen")).collect()(0).getLong(0)
    assert(seen == 165L, s"per-scope arrivals $seen != 165")
  }

  test("mapGroupsWithState running totals equal batch groupBy") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val mem = MemoryStream[EventsStreaming.UserEvent]
    mem.addData(sampleRows.map { case (u, t, _, v) => EventsStreaming.UserEvent(u, t, v) }: _*)
    val q = EventsStreaming.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("user_stats").outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val last = spark.table("user_stats")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tv"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(last(1L) == ((4L, 4.5)))
    assert(last(2L) == ((3L, 13.0)))
  }

  test("streaming CUSUM recurrence equals the prefix-sum identity across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // mean 10 (mu_milli 10000); dips drive S back to the 0 floor
    val xs = Seq(12L, 5L, 20L, 3L, 3L, 30L, 10L, 41L)
    val mem = MemoryStream[EventsStreaming.CusumIn]
    val q = EventsStreaming.cusumStream(mem.toDS())
      .writeStream.format("memory").queryName("cusum_x").outputMode("append").start()
    Seq(xs.zipWithIndex.take(3).reverse, xs.zipWithIndex.slice(3, 6),
      xs.zipWithIndex.drop(6)).foreach { b =>
      mem.addData(b.map { case (v, i) =>
        EventsStreaming.CusumIn("e", day(i), v, 10000L) }: _*)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("cusum_x").orderBy("d").collect()
      .map(r => (r.getLong(3), r.getInt(4))).toSeq
    // prefix-sum identity replay: P_t - min(0, min P_j), alarm > 5·mu
    var p = 0L; var mn = 0L
    val expect = xs.map { x =>
      p += x * 1000 - 10000; mn = math.min(mn, p)
      val s = p - math.min(0L, mn)
      (s, if (s > 50000L) 1 else 0)
    }
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    assert(expect.exists(_._2 == 1) && expect.exists(_._1 == 0L),
      "fixture must exercise both the alarm and the zero floor")
  }

  test("streaming EWMA state carries the lag ring across batch boundaries") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val xs = Seq(100L, 200L, 50L, 400L, 300L, 250L, 150L, 500L, 75L, 600L)
    val mem = MemoryStream[EventsStreaming.PriDay]
    val q = EventsStreaming.ewmaStream(mem.toDS())
      .writeStream.format("memory").queryName("ewma_x").outputMode("append").start()
    // 10 days split 4|3|3 across batches; within-batch order shuffled —
    // the handler sorts by day, state bridges the batch cuts
    Seq(xs.zipWithIndex.take(4).reverse, xs.zipWithIndex.slice(4, 7),
      xs.zipWithIndex.drop(7).reverse).foreach { b =>
      mem.addData(b.map { case (v, i) =>
        EventsStreaming.PriDay("p", day(i), v) }: _*)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("ewma_x").orderBy("d").collect()
      .map(r => r.getLong(3)).toSeq
    // naive replay of the batch 8-lag halving-weight formula
    val L = graft.operators.Temporal.EwmaLags
    val expect = xs.indices.map { i =>
      val lags = (0 until L).flatMap(j =>
        if (i - j >= 0) Some((xs(i - j), 1L << (L - 1 - j))) else None)
      lags.map { case (v, w) => v * w }.sum * 1000L / lags.map(_._2).sum
    }
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
  }

  test("streaming quantile sketch converges to the batch census under disorder") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val vals = (1L to 400L).map(i => 1L + (i * i * 977L) % 90000L)
    // three disordered batches: descending, evens, odds — additive
    // counts must converge to the same census regardless
    val batches = Seq(vals.take(150).sorted.reverse,
      vals.drop(150).zipWithIndex.collect { case (v, i) if i % 2 == 0 => v },
      vals.drop(150).zipWithIndex.collect { case (v, i) if i % 2 == 1 => v })
    val mem = MemoryStream[EventsStreaming.CentsValue]
    val q = EventsStreaming.quantileSketchStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("qs_disorder")
      .outputMode("update").start()
    batches.foreach { b =>
      mem.addData(b.map(EventsStreaming.CentsValue("all", _)): _*)
      q.processAllAvailable()
    }
    q.stop()
    val fin = spark2.table("qs_disorder")
      .orderBy(desc("n_seen")).limit(graft.operators.Sketches.QsketchBp.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val batch = graft.operators.Sketches.quantileSketchDf(spark2, vals.toDF("cents"))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("q_bp")), r.getLong(r.fieldIndex("n")),
        r.getLong(r.fieldIndex("est_lo_cents")), r.getLong(r.fieldIndex("est_hi_cents"))))
      .sortBy(_._1).toSeq
    assert(fin == batch, s"\nstream: $fin\nbatch:  $batch")
  }

  test("streaming LSH registry flags band collisions with earlier docs across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    import EventsStreaming.{BandRow, LshArrival}
    // doc 1 registers (0,x)(1,y); doc 2 collides on (0,x) within the
    // SAME batch — and its rows are fed FIRST, so the flag also proves
    // the within-batch doc_id sort (arrival order, not feed order)
    val b1 = Seq(
      BandRow(2L, "s1", 0, "x"), BandRow(2L, "s1", 1, "z"),
      BandRow(1L, "s0", 0, "x"), BandRow(1L, "s0", 1, "y"))
    // doc 3 collides CROSS-batch on (1,y); doc 4 is all-new
    val b2 = Seq(
      BandRow(3L, "s1", 0, "w"), BandRow(3L, "s1", 1, "y"),
      BandRow(4L, "s0", 0, "q"), BandRow(4L, "s0", 1, "r"))
    val mem = MemoryStream[BandRow]
    val q = EventsStreaming.lshRegistryStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("lsh_reg")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val dup = spark2.table("lsh_reg").as[LshArrival].collect()
      .groupBy(_.doc_id).map { case (d, rs) => d -> rs.exists(_.hit) }
    assert(dup == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false),
      s"arrival flags $dup")
  }

  test("streaming PSI registry continues per-bucket counters across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    import EventsStreaming.{BucketPhase, PsiCount}
    // bucket 3 sees baseline rows in batch 1 and current rows in batch
    // 2 — its counters must CONTINUE (1,0)→(1,2), not restart; bucket 5
    // is current-only
    val b1 = Seq(BucketPhase(3L, 1), BucketPhase(5L, 2))
    val b2 = Seq(BucketPhase(3L, 2), BucketPhase(3L, 2), BucketPhase(5L, 2))
    val mem = MemoryStream[BucketPhase]
    val q = EventsStreaming.psiCountStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("psi_reg")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val fin = spark2.table("psi_reg").as[PsiCount].collect()
      .groupBy(_.bucket).map { case (b, rs) =>
        b -> rs.maxBy(r => r.c1 + r.c2) }
      .map { case (b, r) => b -> ((r.c1, r.c2)) }
    assert(fin == Map(3L -> ((1L, 2L)), 5L -> ((0L, 2L))),
      s"converged counters $fin")
  }

  test("streaming IVF registry carries per-cell occupancy and opener across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    import EventsStreaming.{CellRow, IvfArrival}
    // cell 7 opened by vec 1 in batch 1 (vec 2 fed FIRST — the opener
    // flag also proves the within-batch vec_id sort); cell 9 opened in
    // batch 1, grows in batch 2 (occupancy must CONTINUE at 2, not
    // restart — the cross-batch state check)
    val b1 = Seq(CellRow(2L, 7L), CellRow(1L, 7L), CellRow(3L, 9L))
    val b2 = Seq(CellRow(5L, 9L), CellRow(6L, 4L))
    val mem = MemoryStream[CellRow]
    val q = EventsStreaming.ivfRegistryStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("ivf_reg")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val got = spark2.table("ivf_reg").as[IvfArrival].collect()
      .map(a => a.vec_id -> ((a.cell, a.occ, a.is_first))).toMap
    assert(got == Map(
      1L -> ((7L, 1L, true)), 2L -> ((7L, 2L, false)),
      3L -> ((9L, 1L, true)), 5L -> ((9L, 2L, false)),
      6L -> ((4L, 1L, true))), s"arrivals $got")
  }
}
