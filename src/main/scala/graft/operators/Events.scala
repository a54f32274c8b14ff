package graft.operators

import graft.Tables
import graft.functions.TextFns.{hash56, hash56Sql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table: tumbling windows,
  * gap-based sessionization, JSON prop extraction, and an as-of join —
  * the batch semantics behind graft.streaming (SURVEY.md §2.11: absent
  * from the reference, green-field extension).
  *
  * Scale: window aggs shuffle once on (window, key); sessionization
  * shuffles once on user_id then runs a linear per-partition pass (lag +
  * running sum) — the same state layout Structured Streaming keeps per key.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 10-minute windows per event_type (epoch-aligned starts). */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      // timestamp_ntz output: UTC wall-time, comparable to DuckDB's naive ts
      .select(col("w.start").cast("timestamp_ntz").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("wstart", "event_type")

  /** Gap-based sessions (30-min inactivity): per-user session stats.
    * new-session flag via lag, session id via running sum — microsecond
    * precision on the gap compare. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"),
        max("n").as("max_session_events"),
        round(avg("n"), 4).as("avg_session_events"))
      .orderBy("user_id")
  }

  val PathTopK = 15

  /** Session path mining: the most frequent 3-step event-type sequences
    * within gap-based sessions — the "what do users actually do"
    * clickstream census. Sequences come from lead() pairs over the SAME
    * (user_id, ts) window the sessionizer uses, with session membership
    * checked by leading the session id itself (ids are monotone per
    * user, so lead2-in-same-session implies lead1 is too) — every
    * window column rides ONE user_id exchange, no per-session
    * re-partition, and the trigram census is a tiny partial+final agg. */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("e2", lead("event_type", 1).over(byUser))
      .withColumn("e3", lead("event_type", 2).over(byUser))
      .withColumn("s2", lead("session_id", 2).over(byUser))
    e.filter(col("s2") === col("session_id"))
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(PathTopK)
  }

  /** JSON property extraction + aggregate (props is a JSON string). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        round(avg("k"), 4).as("avg_k"))
      .orderBy("event_type")

  /** As-of join: for each purchase, the user's most recent strictly-prior
    * click timestamp (the classic point-in-time lookup; absent from both
    * the reference and vanilla Spark — composed here from an IGNORE NULLS
    * last_value over a preceding frame, one shuffle on user_id). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("last_click_ts").cast("timestamp_ntz").as("last_click_ts"))
      .orderBy("event_id")
  }

  /** Forward + nearest as-of: for each purchase, the NEXT click after
    * it and the click nearest in time on either side (tie → the earlier
    * one — pinned). Completes the as-of family's direction matrix
    * (backward = asofJoin above). Both neighbor frames ride the SAME
    * (user_id, ts) partitioning+sort as every other window here;
    * distance compare is exact integer microseconds. */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val wPrev = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the forward neighbor via the REVERSED ordering's growing frame:
    // last preceding click under (ts desc, id desc) == first following
    // click under (ts asc, id asc). Spark's unbounded-FOLLOWING frame
    // recomputes per row (O(n²) per key); both growing-PRECEDING frames
    // are incremental — one extra in-partition sort, no extra exchange
    val wNextRev = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val clickTs = when(col("event_type") === "click", col("ts"))
    val prevC = col("prev_click_ts")
    val nextC = col("next_click_ts")
    val dPrev = unix_micros(col("ts")) - unix_micros(prevC)
    val dNext = unix_micros(nextC) - unix_micros(col("ts"))
    Tables.events(spark, dir)
      .withColumn("prev_click_ts", last(clickTs, ignoreNulls = true).over(wPrev))
      .withColumn("next_click_ts", last(clickTs, ignoreNulls = true).over(wNextRev))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        nextC.cast("timestamp_ntz").as("next_click_ts"),
        when(nextC.isNull, prevC)
          .when(prevC.isNull, nextC)
          .when(dPrev <= dNext, prevC)
          .otherwise(nextC).cast("timestamp_ntz").as("nearest_click_ts"))
      .orderBy("event_id")
  }

  /** Cohort retention: users grouped by first-activity week, then the
    * fraction still active at each week offset — the canonical product
    * analytics rollup. Two aggregations over the same scan (first event
    * per user; distinct active weeks per user) joined on user_id, then
    * a (cohort, offset) rollup against broadcast cohort sizes. All date
    * arithmetic is exact integer days; every shuffle is on user_id or
    * the tiny (cohort, offset) grid. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firsts = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"), to_date(date_trunc("week", col("first_ts"))).as("cw"))
    val active = ev
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("aw"))
      .distinct()
    // (user_id, cw, week_offset) is distinct by construction, so a plain
    // count suffices; and every user is active in their own first week,
    // so the offset-0 row IS the cohort size — no second firsts pass
    val r = active.join(firsts, "user_id")
      .select(col("cw"),
        (datediff(col("aw"), col("cw")) / 7).cast("long").as("week_offset"))
      .groupBy("cw", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = r.filter(col("week_offset") === 0)
      .select(col("cw"), col("n_active").as("cohort_n"))
    // retention in floored basis points: integer arithmetic end-to-end —
    // round() on small-integer ratios lands on exact fp half-boundaries
    // (e.g. 5/32) where engines' tie rules diverge
    r.join(broadcast(sizes), "cw")
      .select(col("cw").as("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_n"),
        floor(col("n_active") * lit(10000.0) / col("cohort_n"))
          .cast("long").as("retention_bp"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Cohort LTV curves — [[cohortRetention]]'s revenue companion (the
    * other half of every growth dashboard): per (first-week cohort,
    * week age) purchase revenue in exact cents, the running cumulative
    * per cohort, and LTV-per-user = cum DIV cohort size. Offsets with
    * no purchases are ABSENT (pinned; q_gap_fill is the densifier) and
    * the cumulative window runs over the present offsets — all integer,
    * engine-exact.
    *
    * Scale: one firsts rollup, one purchase rollup onto (cohort, age)
    * grain, a cohort-partitioned window over that bounded grain, and a
    * cohort-sizes broadcast. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firsts = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cw"))
    val sizes = firsts.groupBy("cw").agg(count(lit(1)).as("cohort_n"))
    val rev = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("aw"),
        expr("CAST(round(value * 100) AS LONG)").as("cents"))
      .join(firsts, "user_id")
      .groupBy(col("cw"),
        (datediff(col("aw"), col("cw")) / 7).cast("long").as("week_offset"))
      .agg(sum("cents").as("revenue_cents"))
    val w = Window.partitionBy("cw").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(broadcast(sizes), "cw")
      .withColumn("cum_revenue_cents", sum("revenue_cents").over(w))
      .selectExpr("cw AS cohort_week", "week_offset", "revenue_cents",
        "cum_revenue_cents", "cohort_n",
        "cum_revenue_cents DIV cohort_n AS ltv_cents_per_user")
      .orderBy("cohort_week", "week_offset")
  }

  /** Per-user activity coverage — the interval-union observability
    * metric (what share of a user's observed lifetime was spent INSIDE
    * a session): sessions from the same 30-min-gap logic as
    * [[sessionize]] are disjoint by construction, so the union is a
    * plain per-session span sum; coverage = active·10⁴ DIV span
    * (single-point spans pin NULL in both engines), gaps = sessions−1.
    * All µs-integer arithmetic.
    *
    * Scale: one user-keyed window exchange (shared by the lag, cumsum,
    * and both rollups) — the sessionizer posture; per-user output. */
  def activityCoverage(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy("user_id", "session_id")
      .agg((max("us") - min("us")).as("sess_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("sess_us").as("active_us"))
      .join(e.groupBy("user_id")
        .agg((max("us") - min("us")).as("span_us")), "user_id")
      .selectExpr("user_id", "n_sessions", "n_sessions - 1 AS n_gaps",
        "active_us DIV 1000000 AS active_sec",
        "span_us DIV 1000000 AS span_sec",
        """CAST(CASE WHEN span_us = 0 THEN NULL
          | ELSE (active_us * 10000) DIV span_us END AS BIGINT)
          | AS coverage_bp""".stripMargin)
      .orderBy("user_id")
  }

  val AbandonHorizonUs = 3600L * 1000000L

  /** Daily abandonment rate — the NEGATIVE-pattern census the funnel
    * family doesn't cover (funnels count who CONVERTED; product teams
    * watch who looked and walked away): a view is abandoned when the
    * user has NO purchase in the following hour. Converted views via a
    * user-keyed semi-join with the time-range predicate (the interval-
    * join posture, fan-out horizon-bounded); rates in integer bp.
    *
    * Scale: both sides shuffle once on user_id; the census is a
    * days-sized partial+final rollup. */
  def abandonment(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), to_date(col("ts")).as("d"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("us"), col("d"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("pus"))
    val converted = views.join(buys,
        views("user_id") === buys("user_id") &&
          col("pus") > col("us") && col("pus") <= col("us") + AbandonHorizonUs,
        "left_semi")
      .select(col("event_id")).withColumn("conv", lit(1L))
    views.join(converted, Seq("event_id"), "left")
      .groupBy("d")
      .agg(count(lit(1)).as("n_views"),
        coalesce(sum("conv"), lit(0L)).as("n_converted"))
      .selectExpr("d", "n_views", "n_converted",
        "((n_views - n_converted) * 10000) DIV n_views AS abandoned_bp")
      .orderBy("d")
  }

  /** Peak session concurrency — the classic SWEEP-LINE census (how many
    * sessions were open at once, the capacity-planning number): each
    * 30-min-gap session emits (+1 at start, −1 at end), the running sum
    * over the (us, delta) order is the live concurrency, and the gate
    * reports its maximum, the first microsecond it was attained, and
    * the session/user totals. Tie order pins delta ASC (ends close
    * before starts open at the same µs — touching sessions don't
    * overlap); among identical (us, delta) rows the prefix multiset is
    * order-invariant, so max and first-attainment are deterministic.
    *
    * Scale: the sweep rides [[ScaleWindows.withGlobalRunningSum]] — a
    * range-partitioned sort of the 2·sessions event list (never raw
    * events) plus the two-pass broadcast-offset prefix sum, so every
    * partition sweeps in parallel; no single-partition window anywhere.
    * Peak and first-attainment collapse in ONE max(struct) aggregate. */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("us").as("s0"), max("us").as("s1"))
      .localCheckpoint(true) // feeds the sweep AND the census
    val sweep = ScaleWindows.withGlobalRunningSum(
      sess.selectExpr("s0 AS us", "CAST(1 AS BIGINT) AS delta")
        .unionAll(sess.selectExpr("s1 AS us", "CAST(-1 AS BIGINT) AS delta")),
      Seq(col("us"), col("delta")), "delta", "live")
    // max live, ties to the smallest us — one aggregate, one pass
    val m = sweep
      .agg(max(struct(col("live"), (-col("us")).as("nus"))).as("m"))
      .head().getStruct(0)
    val peak = m.getLong(0)
    val at = -m.getLong(1)
    val census = sess.agg(count(lit(1)).as("n_sessions"),
      countDistinct("user_id").as("n_users")).head()
    val spark2 = spark
    import spark2.implicits._
    Seq((peak, at, census.getLong(0), census.getLong(1)))
      .toDF("peak_concurrency", "peak_at_us", "n_sessions", "n_users")
  }

  /** Batch interval join — the oracle-checked twin of the streaming
    * stream-stream join (EventsStreaming.viewClickIntervalJoin): every
    * (view, click) pair for a user with the click within 10 minutes
    * after the view. Plans as an equi-join on user_id with the range
    * as a post-join filter — the join key carries the shuffle, the
    * time bound never degenerates it to a BNLJ. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"))
    views.join(clicks,
        col("user_id") === col("cu") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("interval 10 minutes"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("user_id")).as("n_users"),
        round(avg((unix_micros(col("click_ts")) - unix_micros(col("view_ts"))) / 1e6), 4)
          .as("avg_gap_sec"),
        floor(max(unix_micros(col("click_ts")) - unix_micros(col("view_ts"))) / lit(1000000L))
          .cast("long").as("max_gap_sec"))
  }

  /** Ordered conversion funnel: earliest view → first strictly-later
    * click → first strictly-later purchase, per user, collapsed to stage
    * counts and mean conversion time. Three same-partitioning window
    * stages — Catalyst reuses ONE user_id exchange for all of them —
    * then a per-user collapse and a constant-size global aggregate, so
    * the 100 TB cost is a single shuffle of (user_id, type, ts)
    * triples. Timestamps difference in exact integer microseconds. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("tv",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc",
        min(when(col("event_type") === "click" && col("ts") > col("tv"), col("ts"))).over(w))
      .withColumn("tp",
        min(when(col("event_type") === "purchase" && col("ts") > col("tc"), col("ts"))).over(w))
    staged.groupBy("user_id")
      .agg(min("tv").as("tv"), min("tc").as("tc"), min("tp").as("tp"))
      .agg(count(lit(1)).as("n_users"),
        count(col("tv")).as("n_view"),
        count(col("tc")).as("n_view_click"),
        count(col("tp")).as("n_full_funnel"),
        round(avg(when(col("tp").isNotNull,
          unix_micros(col("tp")) - unix_micros(col("tv")))) / 1e6, 2)
          .as("avg_sec_convert"))
  }

  /** Funnel step conversions with Wilson 95% score intervals — the
    * uncertainty layer the raw [[funnel]] census lacks (a 60% step on
    * 10 users and one on 10M users are NOT the same evidence; the
    * Wilson interval is the one that stays honest at small n and
    * extreme p̂, unlike the Wald ±z√(pq/n)): per step the exact integer
    * (c, n) pair drives the pinned-literal double formula — identical
    * IEEE ops in the same order on both engines — rounded to bp. z is
    * pinned at 1.959964 (z² 3.841459, the χ²₁ table constant).
    *
    * Scale: the [[funnel]] single user exchange, a 1-row census, and a
    * 3-row finish. */
  def funnelWilson(spark: SparkSession, dir: String): DataFrame = {
    val base = funnel(spark, dir)
      .selectExpr("n_view", "n_view_click", "n_full_funnel")
    val steps = base.selectExpr(
      "stack(3, 'click_to_purchase', n_full_funnel, n_view_click," +
        " 'view_to_click', n_view_click, n_view," +
        " 'view_to_purchase', n_full_funnel, n_view) AS (step, c, n)")
    steps.selectExpr("step", "CAST(c AS BIGINT) AS c", "CAST(n AS BIGINT) AS n",
        "CASE WHEN n = 0 THEN NULL ELSE (c * 10000) DIV n END AS rate_bp",
        """CAST(CASE WHEN n = 0 THEN NULL ELSE round(
          | ((CAST(c AS DOUBLE) / n + 3.841459 / (2 * n)
          |   - 1.959964 * sqrt((CAST(c AS DOUBLE) / n) * (1 - CAST(c AS DOUBLE) / n) / n
          |     + 3.841459 / (4 * CAST(n AS DOUBLE) * n)))
          |  / (1 + 3.841459 / n)) * 10000) END AS BIGINT) AS wilson_lo_bp""".stripMargin,
        """CAST(CASE WHEN n = 0 THEN NULL ELSE round(
          | ((CAST(c AS DOUBLE) / n + 3.841459 / (2 * n)
          |   + 1.959964 * sqrt((CAST(c AS DOUBLE) / n) * (1 - CAST(c AS DOUBLE) / n) / n
          |     + 3.841459 / (4 * CAST(n AS DOUBLE) * n)))
          |  / (1 + 3.841459 / n)) * 10000) END AS BIGINT) AS wilson_hi_bp""".stripMargin)
      .orderBy("step")
  }

  val AttributionHorizonUs = 1800L * 1000000L

  /** Position-based (40/20/40) multi-touch attribution: every purchase
    * credits the clicks of the same user inside the preceding 30 minutes
    * — first and last touch get 40% each, the middles split the
    * remaining 20% evenly; 1 touch takes all, 2 touches split 50/50.
    * Credits are integer basis points with the integer-division
    * remainder assigned to the first touch, so the per-purchase split
    * always sums to exactly 10000.
    *
    * Scale: NOT a self-join — a conditional count/min over a RANGE
    * frame on the merged per-user stream, so the whole op is one
    * shuffle of (user_id, us) pairs and a key-local sort; the credit
    * split is a pure expression of the touch count. */
  def attributionMulti(spark: SparkSession, dir: String): DataFrame = {
    val byU = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-AttributionHorizonUs, -1L)
    val n = col("n_touch")
    val midEach = expr("2000 div (n_touch - 2)")
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("n_touch",
        count(when(col("event_type") === "click", 1)).over(byU))
      .withColumn("first_us",
        min(when(col("event_type") === "click", col("us"))).over(byU))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), n,
        when(n === 0, 0L).when(n === 1, 10000L).when(n === 2, 5000L)
          .otherwise(lit(4000L) + (lit(2000L) - (n - 2) * midEach))
          .as("first_bp"),
        when(n <= 1, 0L).when(n === 2, 5000L).otherwise(4000L).as("last_bp"),
        when(n <= 2, 0L).otherwise(midEach).as("mid_each_bp"),
        when(n > 0, expr("(us - first_us) div 1000000")).as("window_sec"))
      .orderBy("event_id")
  }

  val DecayHalfLifeUs = 300L * 1000000L // 5-min half-life inside the horizon

  /** Time-decay multi-touch attribution — the exponential companion to
    * [[attributionMulti]]'s position weights (the other standard
    * marketing model): every click in the 30-min horizon before a
    * purchase earns 1024 >> (age DIV halflife) units — power-of-two
    * halving, so decay is EXACT integer arithmetic, no exp() anywhere —
    * and first/last-touch shares come out in bp of the summed units.
    * First/last weights derive from min/max click time (weight is a
    * pure function of the timestamp, so equal-µs ties cannot diverge).
    *
    * Scale: the pair join is the interval-join posture — hash on user,
    * fan-out bounded by horizon÷click-rate, never users²; one
    * partial+final per-purchase rollup. */
  def attributionDecay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"),
      col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("pus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"))
    p.join(c, Seq("user_id"))
      .filter(col("cus") < col("pus") &&
        col("cus") >= col("pus") - AttributionHorizonUs)
      .withColumn("w", expr("shiftright(1024L, " +
        s"CAST(least((pus - cus) DIV $DecayHalfLifeUs, 10L) AS INT))"))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_touch"), sum("w").as("w_total_units"),
        max("pus").as("pus"), min("cus").as("fc"), max("cus").as("lc"))
      .selectExpr("purchase_id", "n_touch", "w_total_units",
        s"""(shiftright(1024L, CAST(least((pus - fc) DIV $DecayHalfLifeUs, 10L)
           |  AS INT)) * 10000) DIV w_total_units AS first_share_bp""".stripMargin,
        s"""(shiftright(1024L, CAST(least((pus - lc) DIV $DecayHalfLifeUs, 10L)
           |  AS INT)) * 10000) DIV w_total_units AS last_share_bp""".stripMargin)
      .orderBy("purchase_id")
  }

  /** Within-session Markov transition matrix: for every ordered pair of
    * consecutive events inside a 30-min-gap session, the transition
    * count and probability (micro units, integer DIV by the from-state
    * total). The lead() pair and the led session id ride the
    * sessionizer's single user_id exchange (monotone session ids — one
    * membership compare); the census is a ≤ |types|² partial+final agg
    * and the from-state totals broadcast back onto it. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .withColumn("to_session", lead("session_id", 1).over(w))
      .filter(col("to_session") === col("session_id"))
    val counts = pairs.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("tot"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div tot").as("p_micro"))
      .orderBy("from_type", "to_type")
  }

  /** Path predictability — per from-state entropy of the next-event
    * distribution over [[markovTransitions]]' within-session pairs (the
    * journey-analysis question the raw matrix doesn't answer: HOW
    * deterministic is each state?): H = Σ (n/T)·ln(T/n) folded as the
    * all-integer Σ n·microln(T/n) DIV T (the SPRT/woe ln-of-integer-
    * ratio discipline — one double log per CELL, micro-rounded, then
    * exact integer sums), plus the argmax next state and its share in
    * bp, fully tie-broken by name.
    *
    * Scale: everything after the sessionizer's single user exchange
    * operates on the ≤ |types|² transition census — bounded at any
    * corpus size. */
  def pathEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cells = markovTransitions(spark, dir)
      .select(col("from_type"), col("to_type"), col("n"))
    val byFrom = Window.partitionBy("from_type") // ≤ |types| cells each
    val rk = Window.partitionBy("from_type").orderBy(col("n").desc, col("to_type"))
    cells
      .withColumn("tot", sum("n").over(byFrom))
      .withColumn("term",
        col("n") * expr("CAST(round(ln(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)"))
      .withColumn("rk", row_number().over(rk))
      .groupBy("from_type")
      .agg(max("tot").as("t"),
        count(lit(1)).as("n_next"),
        expr("sum(term) DIV max(tot)").as("entropy_micro"),
        max(when(col("rk") === 1, col("to_type"))).as("top_next"),
        expr("max(CASE WHEN rk = 1 THEN (n * 10000) DIV tot END)").as("top_share_bp"))
      .orderBy("from_type")
  }

  val QteFractions: Seq[(String, Double)] =
    Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9))

  /** Quantile treatment effects — the DISTRIBUTIONAL causal readout the
    * mean-difference family (q_ab_test, q_cuped, q_did) can't see (a
    * treatment that fattens the tail while the median sits still reads
    * as "no effect" on means): per hash56 arm the exact p25/p50/p75/p90
    * of purchase cents via the bounded bracketed selection
    * ([[graft.operators.ExactQuantiles]] — never a value buffer, never
    * a global sort), QTE = treated − control per quantile. Integer
    * inputs make every interpolation midpoint exactly representable,
    * so the doubles hash cross-engine.
    *
    * Scale: the ExactQuantiles pass posture (histogram narrowing over
    * bounded brackets) on each arm; the finish is 4-row arithmetic. */
  def qte(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(pmod(hash56(col("user_id").cast("string")), lit(2)).as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val q = ExactQuantiles.quantiles(p, "cents", QteFractions,
      groupBy = Seq("arm"))
      .collect().map(r => r.getLong(r.fieldIndex("arm")) ->
        QteFractions.map { case (n, _) => r.getDouble(r.fieldIndex(n)) }).toMap
    QteFractions.map(_._1).zipWithIndex.map { case (name, i) =>
      (name, q(0L)(i), q(1L)(i), q(1L)(i) - q(0L)(i))
    }.toDF("quantile", "control_cents", "treated_cents", "qte_cents")
      .orderBy("quantile")
  }

  val DebounceUs = 60L * 1000000L

  /** Event debounce census — the stream-hygiene pass every ingest
    * pipeline runs before analytics (double-clicks, retry storms, at-
    * least-once duplicates): an event is DROPPED when the same user
    * fired the same type within the preceding [[DebounceUs]] (1 min);
    * emitted per type: kept/dropped counts, drop share in bp, and the
    * kept events' value sum in exact cents (what survives for revenue).
    * Chained same-type bursts collapse to their FIRST event only when
    * gaps stay under the window — exactly lag semantics, pinned.
    *
    * Scale: one (user, type)-keyed lag window — a single exchange —
    * then a |types|-bounded census. */
  def debounce(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("dropped",
        when(col("prev_us").isNotNull &&
          unix_micros(col("ts")) - col("prev_us") <= DebounceUs, 1L).otherwise(0L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("dropped").as("n_dropped"),
        sum(when(col("dropped") === 0L,
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
          .as("kept_cents"))
      .selectExpr("event_type", "n_events", "n_dropped",
        "(n_dropped * 10000) DIV n_events AS drop_bp", "kept_cents")
      .orderBy("event_type")
  }

  /** Sequential-pattern support — the gapped "eventually follows"
    * census [[topPaths]]' adjacent trigrams can't see (PrefixSpan's
    * 2-pattern core): for every ORDERED type pair (a, b), in how many
    * sessions does some a-event strictly precede some b-event? Per
    * session that predicate collapses to first(a) < last(b), so one
    * (session, type) rollup with min/max timestamps replaces any
    * event-pair join; the pair generator is a session-keyed self-join
    * whose fan-out is ≤ |types|² per session — bounded multiplier,
    * linear in sessions. Support in floored bp of all sessions.
    *
    * Scale: the sessionizer's one user exchange + a session-grain
    * rollup + the bounded-fan-out pair join; the census is ≤ |types|²
    * rows at any corpus size. */
  def seqPatterns(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id", "event_type")
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .localCheckpoint() // feeds both pair sides and the session total
    val nSessions = sess.select("user_id", "session_id").distinct().count()
    val a = sess.selectExpr("user_id", "session_id",
      "event_type AS a", "first_us")
    val b = sess.selectExpr("user_id AS ub", "session_id AS sb",
      "event_type AS b", "last_us")
    a.join(b, col("user_id") === col("ub") && col("session_id") === col("sb")
        && col("a") =!= col("b") && col("first_us") < col("last_us"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_sessions"))
      .selectExpr("a", "b", "n_sessions",
        s"(n_sessions * 10000) DIV $nSessions AS support_bp")
      .orderBy("a", "b")
  }

  val RemovalStates: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  val RemovalSteps = 12

  /** Markov-chain (removal-effect) attribution — the marketing-science
    * upgrade over position rules ([[attributionMulti]],
    * [[attributionDecay]]): model the session as a Markov chain over
    * the pinned [[RemovalStates]], make 'purchase' absorbing, and
    * credit each channel by how much the K-step conversion probability
    * DROPS when transitions into that channel are removed (the walk
    * dies there — the canonical removal-effect move; sessions starting
    * at the removed channel die too, the denominator stays). The whole
    * chain runs in integer micro with per-step truncation — next(s) =
    * Σ pm(s,t)·p(t) DIV 10⁶ — so the [[RemovalSteps]]-step recurrence
    * replays engine-exact in an unrolled-CTE oracle (the q_kmeans
    * unrolled-Lloyd discipline).
    *
    * Scale: the transition matrix and start census are ≤ |types|² and
    * |types| rows (type-domain bounded — the KM driver-fold class), so
    * the driver recurrence is O(K·|types|²) at ANY corpus size; the
    * corpus-scan cost is exactly the sessionizer's. */
  def removalEffect(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin(RemovalStates: _*))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("to_type", lead("event_type", 1).over(byUser))
      .withColumn("to_session", lead("session_id", 1).over(byUser))
      .localCheckpoint() // one sessionizer pass feeds matrix and starts
    // bounded collects: ≤ |types|² cells and ≤ |types| start rows
    val cells = e.filter(col("to_session") === col("session_id"))
      .groupBy(col("event_type").as("f"), col("to_type").as("t"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val starts = e.filter(col("new_s") === 1)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nSessions = starts.values.sum
    val tots = RemovalStates.map(f =>
      f -> RemovalStates.map(t => cells.getOrElse((f, t), 0L)).sum).toMap
    def pm(f: String, t: String): Long =
      if (tots(f) == 0L) 0L else cells.getOrElse((f, t), 0L) * 1000000L / tots(f)
    // K-step absorption probability with transitions into `removed` cut
    def convMicro(removed: Option[String]): Long = {
      var p = RemovalStates.map(s =>
        s -> (if (s == "purchase") 1000000L else 0L)).toMap
      for (_ <- 1 to RemovalSteps) {
        p = RemovalStates.map { s =>
          s -> (if (s == "purchase") 1000000L
          else RemovalStates.filterNot(removed.contains)
            .map(t => pm(s, t) * p(t)).sum / 1000000L)
        }.toMap
      }
      val liveStarts = RemovalStates.filterNot(removed.contains)
      liveStarts.map(s => starts.getOrElse(s, 0L) * p(s)).sum / nSessions
    }
    val base = convMicro(None)
    RemovalStates.filterNot(_ == "purchase").map { c =>
      val withoutC = convMicro(Some(c))
      val bp = if (base == 0L) None
        else Some((base - withoutC) * 10000L / base)
      (c, base, withoutC, bp)
    }.toDF("channel", "conv_base_micro", "conv_removed_micro", "removal_bp")
      .orderBy("channel")
  }

  /** Funnel latency distribution: per converting user, the integer
    * seconds from first view to first strictly-later purchase, then the
    * exact p50/p90 of those latencies via the bounded bracketed
    * selection (never a value buffer) plus the conversion count. The
    * per-user stage reuses the funnel's one-exchange window pattern;
    * latencies are integers so quantile interpolation midpoints are
    * exactly representable in both engines. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val lat = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("tv",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tp",
        min(when(col("event_type") === "purchase" && col("ts") > col("tv"),
          col("ts"))).over(w))
      .groupBy("user_id")
      .agg(min("tv").as("tv"), min("tp").as("tp"))
      .filter(col("tp").isNotNull)
      .select(col("user_id"),
        ((unix_micros(col("tp")) - unix_micros(col("tv")))
          .cast("long") / lit(1000000L)).cast("long").cast("double")
          .as("lat_sec"))
    val q = ExactQuantiles.quantiles(
      lat, "lat_sec", Seq("p50_sec" -> 0.5, "p90_sec" -> 0.9))
    lat.agg(count(lit(1)).as("n_converted"),
        min("lat_sec").cast("long").as("min_sec"),
        max("lat_sec").cast("long").as("max_sec"))
      .crossJoin(broadcast(q.select(
        round(col("p50_sec"), 4).as("p50_sec"),
        round(col("p90_sec"), 4).as("p90_sec"))))
  }

  val RollingDays = 7

  /** Rolling 7-day distinct active users (WAU) per day — the classic
    * sliding-distinct that has NO window-function form (exact COUNT
    * DISTINCT over a moving frame isn't mergeable). stickiness_bp =
    * 10⁴·DAU DIV WAU (the DAU/WAU engagement ratio), integers
    * throughout.
    *
    * Scale (r13 rebuild): instead of fanning each active day ×
    * [[RollingDays]] and re-distincting per target day (the r12 2.3×
    * 10×-ratio was that fanned (day, user) exchange), decompose each
    * user's window coverage into DISJOINT calendar runs: activity day d
    * covers [d, d+6], and consecutive activity days overlapping within
    * the window merge seamlessly at the prev+[[RollingDays]] cut, so
    * per (user, d) the new coverage is [max(d, prev+7), d+6] — exactly
    * one +1/−1 boundary-delta pair. WAU(day) is then a running sum of
    * deltas over the CALENDAR-BOUNDED day grain. Shuffle profile: one
    * per-user lag window (events already collapsed to daily grain) +
    * one tiny day-grain aggregate — no ×7 fan-out, no sliding
    * re-distinct, and the only single-partition window runs over the
    * day grain (bounded by the calendar horizon, whitelisted). Days
    * with history shorter than the window report partial windows
    * (standard dashboard semantics). */
  def rollingDau(spark: SparkSession, dir: String): DataFrame =
    rollingDauOf(Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct())

  /** Core over any distinct (d DATE, user_id) daily-active frame; see
    * [[rollingDau]]. */
  private[graft] def rollingDauOf(daily: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("d")
    val runs = daily
      .withColumn("prev", lag(col("d"), 1).over(byUser))
      .withColumn("lo", when(col("prev").isNull, col("d"))
        .otherwise(greatest(col("d"), date_add(col("prev"), RollingDays))))
      .withColumn("hi", date_add(col("d"), RollingDays - 1))
    // prev < d ⇒ lo = max(d, prev+7) ≤ d+6 = hi always; each run is a
    // non-empty disjoint coverage interval of its user.
    // Both boundary deltas of a run come out of ONE pass (explode of a
    // 2-struct array) — a union of two selects over `runs` planned the
    // per-user lag window (and the upstream distinct) twice unless
    // exchange reuse happened to kick in
    val deltas = runs
      .select(explode(array(
        struct(col("lo").as("wd"), lit(1L).as("delta")),
        struct(date_add(col("hi"), 1).as("wd"), lit(-1L).as("delta")))).as("e"))
      .select(col("e.wd").as("wd"), col("e.delta").as("delta"))
      .groupBy("wd").agg(sum("delta").as("delta"))
    val dau = daily.groupBy(col("d").as("wd")).agg(count(lit(1)).as("dau"))
    // running sum evaluated over boundary ∪ activity days (WAU is
    // constant between boundaries); report only days with activity
    val days = deltas.join(dau, Seq("wd"), "full_outer")
      .select(col("wd"), coalesce(col("delta"), lit(0L)).as("delta"),
        col("dau"))
    days
      .withColumn("wau", sum("delta").over(Window.orderBy("wd")))
      .filter(col("dau").isNotNull)
      .selectExpr("wd", "dau", "wau", "(dau * 10000) DIV wau AS stickiness_bp")
      .orderBy("wd")
  }

  /** "Converted" = at least this many purchase events (the mean is ~13
    * purchases/user in the synthetic stream, so an above-average cut
    * splits users non-degenerately at every SF). */
  val AbConvMin = 15
  /** χ²(1df) 95% critical value in micro-units. */
  val AbCritMicro = 3841459L
  /** Largest pooled user count for which the integer z² formula cannot
    * overflow Long: worst case |t| ≤ (N/2)², so the big product is
    * bounded by 250·N³ ≤ 2⁶³ → N ≤ 3.3·10⁵. Past this the operator
    * returns a NULL verdict instead of a silently wrapped one — the
    * documented remedy is running the test on a hash sample of users
    * (the hash56-mod arm split is already sample-stable). */
  val AbZ2MaxN = 300000L

  /** Two-proportion A/B significance test — the experimentation
    * primitive over the event stream: users hash-split into arms
    * (portable hash56, the same resumable-membership contract as
    * corpusSample), per-arm conversion counted, and the pooled
    * two-proportion z² computed ENTIRELY in integer arithmetic as
    * z²·10⁶ ≈ (|t|·10³ DIV n_a·n_b) · (|t|·10³·N DIV c·(N−c)) with
    * t = c_a·n_b − c_b·n_a — the cross-multiplied form with the scale
    * split across both factors (truncation ~2·10⁻³ of z², far inside
    * the χ² threshold), so no fp mean/sqrt touches the decision (same
    * discipline as anomalyDow's 2σ test). Output is one row: arm sizes, conversions, cvr in bp,
    * z²-micro, and the significance verdict at χ²₁ 95%.
    *
    * Scale: one distinct-users pass + one filtered purchase count,
    * both partial-aggregated; the final arithmetic runs on a 2-row
    * frame. Degenerate pools (c = 0 or c = N) pin z² = 0. */
  def abTest(spark: SparkSession, dir: String): DataFrame =
    abTestDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type) frame. */
  def abTestDf(ev: DataFrame): DataFrame = {
    val users = ev.select(col("user_id")).distinct()
      .withColumn("arm", pmod(hash56(col("user_id").cast("string")), lit(2)))
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("np"))
      .filter(col("np") >= AbConvMin)
      .select(col("user_id")).withColumn("cv", lit(1L))
    users.join(conv, Seq("user_id"), "left")
      .groupBy("arm").agg(count(lit(1)).as("n"),
        coalesce(sum("cv"), lit(0L)).as("c"))
      .agg(
        sum(when(col("arm") === 0, col("n"))).as("n_a"),
        sum(when(col("arm") === 0, col("c"))).as("c_a"),
        sum(when(col("arm") === 1, col("n"))).as("n_b"),
        sum(when(col("arm") === 1, col("c"))).as("c_b"))
      .selectExpr("n_a", "c_a", "n_b", "c_b",
        // empty-arm guard: DIV-by-zero is NULL in Spark but an ERROR in
        // DuckDB — pin the degenerate case to 0 in both engines
        "CAST(CASE WHEN coalesce(n_a, 0) = 0 THEN 0 ELSE (c_a * 10000) DIV n_a END AS BIGINT) AS cvr_a_bp",
        "CAST(CASE WHEN coalesce(n_b, 0) = 0 THEN 0 ELSE (c_b * 10000) DIV n_b END AS BIGINT) AS cvr_b_bp",
        // both factors carry a 10^3 scale (product 10^6): truncation error
        // is ~2e-3 of z² instead of the up-to-1-z²-unit loss of an
        // unscaled second factor. Overflow guard: Spark WRAPS Long
        // overflow where DuckDB errors, so past AbZ2MaxN pooled users
        // the verdict is NULLed at runtime (never silently flipped) —
        // rerun on a hash sample of users to test bigger pools
        s"""CAST(CASE WHEN n_a + n_b > $AbZ2MaxN THEN NULL
           | WHEN coalesce(n_a, 0) = 0 OR coalesce(n_b, 0) = 0
           |   OR (c_a + c_b) = 0 OR (c_a + c_b) = (n_a + n_b) THEN 0
           | ELSE (abs(c_a * n_b - c_b * n_a) * 1000 DIV (n_a * n_b))
           |    * (abs(c_a * n_b - c_b * n_a) * 1000 * (n_a + n_b)
           |       DIV ((c_a + c_b) * (n_a + n_b - c_a - c_b)))
           | END AS BIGINT) AS z2_micro""".stripMargin)
      .withColumn("significant", col("z2_micro") > AbCritMicro)
  }

  /** Cohen's d standardized effect size for the A/B split — the
    * MAGNITUDE companion to [[abTestDf]]'s yes/no z² verdict (at
    * warehouse n everything reads "significant"; d is the n-free
    * standardized lift that says whether it matters):
    * d = (x̄_B − x̄_A)/s_pooled over per-user purchase revenue in exact
    * cents (non-purchasers count 0 — intent-to-treat). Arm n/Σx/Σx²
    * are exact DECIMAL(38,0) integers (Σx² reaches users·cents², past
    * Long near 10⁷ users); only the final d touches doubles, with the
    * IDENTICAL expression shape on both engines and round-6 output.
    * Degenerate pools (either arm < 2 users, zero pooled variance) pin
    * a NULL d — visible, never a division blow-up.
    *
    * Scale: one user-keyed rollup partial-aggregated to a 2-arm frame,
    * then 1-row arithmetic — the q_ab_test posture. */
  def effectSize(spark: SparkSession, dir: String): DataFrame =
    effectSizeDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type, value) frame. */
  def effectSizeDf(ev: DataFrame): DataFrame = {
    val users = ev.select(col("user_id")).distinct()
      .withColumn("arm", pmod(hash56(col("user_id").cast("string")), lit(2)))
    val rev = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    users.join(rev, Seq("user_id"), "left")
      .select(col("arm"), coalesce(col("v"), lit(0L)).cast("decimal(38,0)").as("v"))
      .groupBy("arm").agg(count(lit(1)).as("n"),
        sum(col("v")).as("s"), sum(col("v") * col("v")).as("ss"))
      .agg(
        sum(when(col("arm") === 0, col("n"))).as("n_a"),
        sum(when(col("arm") === 0, col("s"))).as("s_a"),
        sum(when(col("arm") === 0, col("ss"))).as("ss_a"),
        sum(when(col("arm") === 1, col("n"))).as("n_b"),
        sum(when(col("arm") === 1, col("s"))).as("s_b"),
        sum(when(col("arm") === 1, col("ss"))).as("ss_b"))
      .selectExpr("n_a", "n_b",
        "CAST(s_a AS BIGINT) AS sum_a_cents", "CAST(s_b AS BIGINT) AS sum_b_cents",
        // exact integer micro-cents mean gap (decimal DIV, no fp)
        """CAST((s_b * 1000000) DIV n_b - (s_a * 1000000) DIV n_a AS BIGINT)
          |  AS mean_gap_micro""".stripMargin,
        // the one fp step, identical shape both engines:
        // pooled = Σ(n·ss − s²)/n per arm over (n_a + n_b − 2)
        """round(CASE
          |  WHEN n_a < 2 OR n_b < 2 THEN CAST(NULL AS DOUBLE)
          |  WHEN (CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
          |        - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / n_a
          |     + (CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
          |        - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / n_b = 0.0
          |    THEN CAST(NULL AS DOUBLE)
          |  ELSE (CAST(s_b AS DOUBLE) / n_b - CAST(s_a AS DOUBLE) / n_a)
          |    / sqrt(((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
          |             - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / n_a
          |          + (CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
          |             - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / n_b)
          |         / (n_a + n_b - 2))
          |  END, 6) AS cohen_d""".stripMargin)
  }

  /** The 4 attribution channels, bit i of the per-user exposure mask. */
  val ShapleyChannels: Seq[String] = Seq("click", "view", "signup", "error")

  /** Shapley-value attribution — the game-theoretic completion of the
    * attribution family (position 40/20/40, time-decay, and Markov
    * removal effect are heuristics; Shapley is the unique credit split
    * satisfying efficiency/symmetry/dummy): channels are coalition
    * players, v(S) = observed conversion rate (bp) of users whose exact
    * exposure set is S (empty subsets contribute 0 — a documented
    * convention), and φ_c = Σ_{S∌c} |S|!(k−1−|S|)!·(v(S∪c)−v(S)) / k!.
    * With k = 4 the 32 (channel, S) pairs and their factorial weights
    * are pinned literals; φ_bp = (Σ weighted marginals) DIV 24 — exact
    * integer end to end.
    *
    * Scale: one events scan → per-user (bitmask, converted) rollup →
    * a 16-row subset census; everything after is literal-table joins
    * on ≤32 rows. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame =
    shapleyDf(Tables.events(spark, dir))

  private def shapleyFact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)

  /** The 32 (channel, S-without, S-with, |S|!(k−1−|S|)!) literals both
    * engines join against. */
  private[graft] lazy val shapleyPairs: Seq[(String, Int, Int, Long)] = {
    val k = ShapleyChannels.length
    for {
      ci <- 0 until k
      s <- 0 until (1 << k) if (s & (1 << ci)) == 0
    } yield (ShapleyChannels(ci), s, s | (1 << ci),
      shapleyFact(Integer.bitCount(s)) * shapleyFact(k - 1 - Integer.bitCount(s)))
  }

  /** Core over any (user_id, event_type) frame. */
  def shapleyDf(ev: DataFrame): DataFrame = {
    val spark2 = ev.sparkSession
    import spark2.implicits._
    val k = ShapleyChannels.length
    val bit = ShapleyChannels.zipWithIndex
      .map { case (c, i) => s"WHEN '$c' THEN ${1 << i}" }
      .mkString("CASE event_type ", " ", " ELSE 0 END")
    val users = ev.selectExpr("user_id", s"$bit AS b",
        "CAST(event_type = 'purchase' AS INT) AS p")
      .groupBy("user_id")
      .agg(expr("CAST(sum(DISTINCT b) AS INT)").as("mask"), max("p").as("cv"))
    val census = users.groupBy("mask")
      .agg(count(lit(1)).as("n"), sum("cv").as("c"))
      .selectExpr("mask", "(c * 10000) DIV n AS v_bp")
    val pdf = broadcast(shapleyPairs.toDF("channel", "s_without", "s_with", "w"))
    pdf
      .join(census.selectExpr("mask AS s_with", "v_bp AS v1"),
        Seq("s_with"), "left")
      .join(census.selectExpr("mask AS s_without", "v_bp AS v0"),
        Seq("s_without"), "left")
      .selectExpr("channel",
        "w * (coalesce(v1, 0) - coalesce(v0, 0)) AS m")
      .groupBy("channel")
      .agg(expr(s"CAST(sum(m) DIV ${shapleyFact(k)} AS BIGINT)").as("phi_bp"))
      .orderBy("channel")
  }

  /** Sample-ratio-mismatch guardrail — the experimentation sanity check
    * that must run BEFORE any A/B readout (a biased split invalidates
    * q_ab_test/q_effect_size silently): χ²(1) of the arm sizes against
    * the designed 50/50, (n_a−n_b)²·10⁶ DIV (n_a+n_b) in pure integers
    * vs the pinned critical value. 'yes' = the assignment itself is
    * broken. One distinct-users pass → 2-row census → 1-row verdict. */
  def srmCheck(spark: SparkSession, dir: String): DataFrame =
    srmDf(Tables.events(spark, dir))

  /** Core over any (user_id) frame. */
  def srmDf(ev: DataFrame): DataFrame =
    ev.select(col("user_id")).distinct()
      .withColumn("arm", pmod(hash56(col("user_id").cast("string")), lit(2)))
      .groupBy("arm").agg(count(lit(1)).as("n"))
      // otherwise(0) + coalesce: a completely wiped-out arm must read
      // n = 0 (the exact failure SRM exists to catch), never NULL
      .agg(coalesce(sum(when(col("arm") === 0, col("n")).otherwise(0L)),
          lit(0L)).as("n_a"),
        coalesce(sum(when(col("arm") === 1, col("n")).otherwise(0L)),
          lit(0L)).as("n_b"))
      .selectExpr("n_a", "n_b",
        """CAST((n_a - n_b) * (n_a - n_b) * 1000000 DIV (n_a + n_b)
          |  AS BIGINT) AS srm_chi2_micro""".stripMargin)
      .withColumn("mismatch", col("srm_chi2_micro") > AbCritMicro)

  val IpwStrata = 5 // activity-quintile strata (bucket = events DIV 20 capped)

  /** Stratified IPW average treatment effect — the OBSERVATIONAL causal
    * estimator next to the randomized A/B family (CUPED/DiD assume a
    * designed assignment; here treatment is self-selected — users who
    * signed up — and exposure propensity is estimated per activity
    * stratum): e(s) = treated fraction of stratum s as an exact
    * fraction, ATE_bp = (Σ_s [y¹_s·n_s·10⁴ DIV t_s − y⁰_s·n_s·10⁴ DIV
    * (n_s−t_s)]) DIV N over strata with both arms populated; degenerate
    * strata (all or none treated — propensity 0/1, IPW undefined) are
    * EXCLUDED and accounted in n_excluded, never silently zeroed.
    *
    * Scale: one events scan → per-user (events, treated, converted)
    * rollup → a strata-bounded census → 1-row arithmetic. */
  def ipwAte(spark: SparkSession, dir: String): DataFrame =
    ipwDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type) frame. */
  def ipwDf(ev: DataFrame): DataFrame =
    ev.groupBy("user_id").agg(
        count(lit(1)).as("ne"),
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("t"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("y"))
      .selectExpr(s"least(ne DIV 20, ${IpwStrata - 1}) AS s", "t", "y")
      .groupBy("s").agg(count(lit(1)).as("n"), sum("t").as("nt"),
        sum(when(col("t") === 1, col("y")).otherwise(0)).as("y1"),
        sum(when(col("t") === 0, col("y")).otherwise(0)).as("y0"))
      .agg(
        sum("n").as("n_users"),
        sum(when(col("nt") > 0 && col("nt") < col("n"), col("n"))
          .otherwise(0L)).as("n_used"),
        sum(when(col("nt") === 0 || col("nt") === col("n"), col("n"))
          .otherwise(0L)).as("n_excluded"),
        sum(when(col("nt") > 0 && col("nt") < col("n"),
          expr("(y1 * n * 10000) DIV nt - (y0 * n * 10000) DIV (n - nt)"))
          .otherwise(0L)).as("sum_terms"))
      .selectExpr("n_users", "n_used", "n_excluded",
        """CAST(CASE WHEN n_used = 0 THEN NULL
          |  ELSE sum_terms DIV n_used END AS BIGINT) AS ate_bp""".stripMargin)

  val SprtUpliftNum = 11L // H1: p1 = (11/10)·p0 — a pinned +10% uplift
  val SprtUpliftDen = 10L
  val SprtLnUpliftMicro = math.round(math.log(11.0 / 10.0) * 1e6)
  val SprtBoundMicro = math.round(math.log(19.0) * 1e6) // α=β=0.05

  /** Wald SPRT for conversion uplift — the PEEKING-SAFE sequential
    * companion to [[abTestDf]]'s fixed-horizon z² (run it on every
    * ingest batch; the likelihood-ratio boundaries keep α/β valid under
    * continuous monitoring, which the z-test famously does not):
    * H₀ p = p₀ (arm A's observed rate) vs H₁ p = 1.1·p₀, LLR over arm B
    * = c_B·ln(1.1) + (n_B−c_B)·ln((1−1.1·p₀)/(1−p₀)). The second log's
    * argument reduces to the INTEGER ratio (10·n_A − 11·c_A)/(10·(n_A −
    * c_A)), so both engines micro-round the same double (the woe
    * discipline); the LLR is then an exact integer sum, compared to the
    * ±ln 19 boundaries in micro. Degenerate p₀ (0, or ≥ 1/1.1) pins a
    * NULL verdict in both engines.
    *
    * Scale: identical posture to q_ab_test — two user-keyed rollups to
    * a 2-arm frame, then 1-row arithmetic. */
  def sprtTest(spark: SparkSession, dir: String): DataFrame =
    sprtDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type) frame. */
  def sprtDf(ev: DataFrame): DataFrame = {
    val users = ev.select(col("user_id")).distinct()
      .withColumn("arm", pmod(hash56(col("user_id").cast("string")), lit(2)))
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("np"))
      .filter(col("np") >= AbConvMin)
      .select(col("user_id")).withColumn("cv", lit(1L))
    users.join(conv, Seq("user_id"), "left")
      .groupBy("arm").agg(count(lit(1)).as("n"),
        coalesce(sum("cv"), lit(0L)).as("c"))
      .agg(
        sum(when(col("arm") === 0, col("n"))).as("n_a"),
        sum(when(col("arm") === 0, col("c"))).as("c_a"),
        sum(when(col("arm") === 1, col("n"))).as("n_b"),
        sum(when(col("arm") === 1, col("c"))).as("c_b"))
      .selectExpr("n_a", "c_a", "n_b", "c_b",
        s"""CAST(CASE WHEN coalesce(c_a, 0) = 0
           |  OR $SprtUpliftDen * n_a <= $SprtUpliftNum * c_a THEN NULL
           | ELSE round(ln(CAST($SprtUpliftDen * n_a - $SprtUpliftNum * c_a
           |     AS DOUBLE) / CAST($SprtUpliftDen * (n_a - c_a) AS DOUBLE))
           |   * 1000000) END AS BIGINT) AS term0_micro""".stripMargin)
      .selectExpr("n_a", "c_a", "n_b", "c_b", "term0_micro",
        s"""CAST(CASE WHEN term0_micro IS NULL THEN NULL
           | ELSE c_b * $SprtLnUpliftMicro + (n_b - c_b) * term0_micro
           | END AS BIGINT) AS llr_micro""".stripMargin)
      .selectExpr("n_a", "c_a", "n_b", "c_b", "term0_micro", "llr_micro",
        s"""CASE WHEN llr_micro IS NULL THEN NULL
           | WHEN llr_micro >= $SprtBoundMicro THEN 'uplift'
           | WHEN llr_micro <= -$SprtBoundMicro THEN 'no_uplift'
           | ELSE 'continue' END AS verdict""".stripMargin)
  }

  /** CUPED variance reduction — the experimentation-stack upgrade the
    * A/B family ([[abTestDf]], [[sprtDf]]) reads next: using each
    * user's PRE-period activity as the control covariate,
    * θ = cov(pre, post)/var(pre) and the variance-reduction factor
    * ρ² = cov²/(var·var) tell how much sensitivity the adjustment buys.
    * Both come from exact integer user-level sums, cross-multiplied in
    * DECIMAL(38,0)/HUGEINT — θ in micro, ρ² in bp, plus the raw
    * post-period arm difference in micro events/user. Degenerate
    * variances pin NULL.
    *
    * Scale: one user-grain rollup (pre/post counts per user), one
    * 1-row moment aggregate — the q_ab_test posture. */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val mid = ev.agg(
      expr("timestamp_micros(CAST((min(unix_micros(ts)) + max(unix_micros(ts))) / 2 AS LONG))"))
      .head().getTimestamp(0)
    val users = ev.groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase" && col("ts") <= lit(mid), 1L)
          .otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" && col("ts") > lit(mid), 1L)
          .otherwise(0L)).as("y"))
      .withColumn("arm", pmod(hash56(col("user_id").cast("string")), lit(2)))
    users.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(when(col("arm") === 0, col("y"))).as("ya"),
        sum(when(col("arm") === 0, 1L)).as("na"),
        sum(when(col("arm") === 1, col("y"))).as("yb"),
        sum(when(col("arm") === 1, 1L)).as("nb"))
      .selectExpr("n", "sx", "sy",
        """CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx
          |    - CAST(sx AS DECIMAL(38,0)) * sx = 0 THEN NULL
          | ELSE ((CAST(n AS DECIMAL(38,0)) * sxy
          |    - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000)
          |   DIV (CAST(n AS DECIMAL(38,0)) * sxx
          |    - CAST(sx AS DECIMAL(38,0)) * sx) END AS BIGINT)
          | AS theta_micro""".stripMargin,
        """CAST(CASE WHEN (CAST(n AS DECIMAL(38,0)) * sxx
          |      - CAST(sx AS DECIMAL(38,0)) * sx)
          |    * (CAST(n AS DECIMAL(38,0)) * syy
          |      - CAST(sy AS DECIMAL(38,0)) * sy) = 0 THEN NULL
          | ELSE ((CAST(n AS DECIMAL(38,0)) * sxy
          |     - CAST(sx AS DECIMAL(38,0)) * sy)
          |    * (CAST(n AS DECIMAL(38,0)) * sxy
          |     - CAST(sx AS DECIMAL(38,0)) * sy) * 10000)
          |   DIV ((CAST(n AS DECIMAL(38,0)) * sxx
          |      - CAST(sx AS DECIMAL(38,0)) * sx)
          |    * (CAST(n AS DECIMAL(38,0)) * syy
          |      - CAST(sy AS DECIMAL(38,0)) * sy)) END AS BIGINT)
          | AS rho2_bp""".stripMargin,
        """CAST((CAST(yb AS DECIMAL(38,0)) * na - CAST(ya AS DECIMAL(38,0)) * nb)
          | * 1000000 DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)
          | AS raw_diff_micro""".stripMargin)
  }

  /** Difference-in-differences — the quasi-experimental causal
    * estimator the A/B family ([[abTestDf]], [[cuped]]) reaches for
    * when assignment wasn't randomized at exposure time: arms from the
    * hash56 user split, pre/post from the observation-window midpoint
    * (the CUPED clock), outcome = purchase revenue per user in exact
    * cents. DiD = (post_t − pre_t)/n_t − (post_c − pre_c)/n_c, each
    * per-arm delta an integer micro-cents-per-user quotient (truncating
    * DIV matches across engines for negative deltas too — the
    * Theil–Sen discipline). Population = ALL distinct users in the arm,
    * so non-purchasers weigh the denominators.
    *
    * Scale: the q_ab_test posture — one user-grain rollup of pre/post
    * cents, one 1-row arithmetic finish; the midpoint is a 1-row agg. */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val mid = ev.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2").as("mu"))
    ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase" && expr("unix_micros(ts) <= mu"),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("pre"),
        sum(when(col("event_type") === "purchase" && expr("unix_micros(ts) > mu"),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("post"))
      .withColumn("arm", pmod(hash56(col("user_id").cast("string")), lit(2)))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, col("pre")).otherwise(0L)).as("pre_c_cents"),
        sum(when(col("arm") === 0, col("post")).otherwise(0L)).as("post_c_cents"),
        sum(when(col("arm") === 1, col("pre")).otherwise(0L)).as("pre_t_cents"),
        sum(when(col("arm") === 1, col("post")).otherwise(0L)).as("post_t_cents"))
      .selectExpr("n_c", "n_t", "pre_c_cents", "post_c_cents",
        "pre_t_cents", "post_t_cents",
        """CAST(CASE WHEN n_c = 0 THEN NULL
          | ELSE ((post_c_cents - pre_c_cents) * 1000000) DIV n_c
          | END AS BIGINT) AS delta_c_micro""".stripMargin,
        """CAST(CASE WHEN n_t = 0 THEN NULL
          | ELSE ((post_t_cents - pre_t_cents) * 1000000) DIV n_t
          | END AS BIGINT) AS delta_t_micro""".stripMargin)
      .withColumn("did_micro", col("delta_t_micro") - col("delta_c_micro"))
  }

  /** Kaplan–Meier time-to-conversion curve — survival analysis with
    * censoring, the piece simple funnel latency (q_funnel_time) cannot
    * express: users who never purchase still contribute risk-set time
    * until the observation window ends. Durations are whole days from
    * first view to first subsequent purchase (event) or to the global
    * last event day (censored). The KM product is the integer recurrence
    * S_k = (S_{k-1} · (n_k − d_k)) DIV n_k in micro-units from 10⁶ —
    * engine-exact, replayed by a recursive-CTE oracle.
    *
    * Scale: per-user durations are one groupBy over the stream; the
    * risk-set table is a DAY-GRAIN histogram (bounded by the observation
    * horizon, not the user count), so its suffix-sum window and the
    * driver fold both run on ≤ horizon rows at any scale. */
  def survivalKm(spark: SparkSession, dir: String): DataFrame =
    survivalKmDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type, ts) frame. */
  def survivalKmDf(ev: DataFrame): DataFrame = {
    val spark2 = ev.sparkSession
    import spark2.implicits._
    val t0 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val maxDay = ev.agg(max(to_date(col("ts"))).as("maxd"))
    val durs = t0
      .join(firstPurchase, col("user_id") === col("pu") && col("pts") >= col("t0"), "left")
      .groupBy(col("user_id"), col("t0")).agg(min(col("pts")).as("p"))
      .crossJoin(broadcast(maxDay))
      .select(
        when(col("p").isNotNull,
          datediff(to_date(col("p")), to_date(col("t0"))))
          .otherwise(datediff(col("maxd"), to_date(col("t0")))).as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("event"))
    val hist = durs.groupBy("dur")
      .agg(count(lit(1)).as("m"), sum("event").as("d"))
    // suffix sum over the bounded day-grain histogram -> risk set n_t
    val w = Window.orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val table = hist.withColumn("n_risk", sum("m").over(w))
      .filter(col("d") >= 1)
      .select(col("dur").cast("int").as("day"), col("n_risk"), col("d"))
      .orderBy("day")
      // driver fold, PINNED (judge r8 ask #7): the curve is the
      // sequential INTEGER recurrence s_t = floor(s_{t-1}(n_t-d_t)/n_t)
      // - each step floors the previous floor, so the product is not a
      // prefix-decomposable monoid (no associative combine reproduces
      // the interleaved floors), and the log-space prefix sum NA uses
      // would be fp-inexact and break the engine-exact oracle. The fold
      // input is the day-grain histogram - bounded by the day horizon
      // (hundreds of rows at ANY corpus size), never by users - so the
      // driver cost is O(days), same class as the other bounded
      // collects.
      .collect()
    var s = 1000000L
    val rows = table.map { r =>
      val (day, n, d) = (r.getInt(0), r.getLong(1), r.getLong(2))
      s = s * (n - d) / n
      (day, n, d, s)
    }
    rows.toSeq.toDF("day", "n_risk", "n_events", "surv_micro").orderBy("day")
  }

  /** Restricted mean survival time — the single-number summary the KM
    * curve family reads off last (mean days-to-conversion ACCOUNTING
    * for censoring, restricted to the observation horizon τ — the
    * estimand regulators ask for when hazards aren't proportional):
    * RMST(τ) = ∫₀^τ S(t)dt = Σ S(t_{i-1})·(t_i − t_{i-1}) over the KM
    * step function — S in integer micro from the same pinned product
    * recurrence as [[survivalKmDf]], so the integral is an EXACT
    * integer micro-day sum replayed verbatim by the recursive-CTE
    * oracle. τ = the longest observed duration (event or censored).
    *
    * Scale: identical to KM — day-grain bounded histogram, O(days)
    * driver fold. */
  def rmst(spark: SparkSession, dir: String): DataFrame =
    rmstDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type, ts) frame. */
  def rmstDf(ev: DataFrame): DataFrame = {
    val spark2 = ev.sparkSession
    import spark2.implicits._
    val t0 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val maxDay = ev.agg(max(to_date(col("ts"))).as("maxd"))
    val durs = t0
      .join(firstPurchase, col("user_id") === col("pu") && col("pts") >= col("t0"), "left")
      .groupBy(col("user_id"), col("t0")).agg(min(col("pts")).as("p"))
      .crossJoin(broadcast(maxDay))
      .select(
        when(col("p").isNotNull,
          datediff(to_date(col("p")), to_date(col("t0"))))
          .otherwise(datediff(col("maxd"), to_date(col("t0")))).as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("event"))
    val hist = durs.groupBy("dur")
      .agg(count(lit(1)).as("m"), sum("event").as("d"))
    val w = Window.orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val table = hist.withColumn("n_risk", sum("m").over(w))
      .select(col("dur").cast("long").as("day"), col("n_risk"), col("d"))
      .orderBy("day")
      .collect() // bounded: day-grain horizon (the KM driver-fold class)
    val tau = table.map(_.getLong(0)).max
    var s = 1000000L
    var prev = 0L
    var integral = 0L // micro-days: Σ S(t_{i-1})·Δt, S step-left
    var nEventDays = 0L
    table.foreach { r =>
      val (day, n, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      integral += s * (day - prev)
      prev = day
      if (d >= 1) { s = s * (n - d) / n; nEventDays += 1 }
    }
    Seq((tau, nEventDays, s, integral))
      .toDF("horizon_days", "n_event_days", "final_surv_micro",
        "rmst_micro_days")
  }

  /** Nelson–Aalen cumulative hazard — [[survivalKmDf]]'s estimator twin
    * (H(t) = Σ d/n vs KM's Π(1−d/n); NA is the one epidemiologists
    * overlay to read the hazard RATE): per event day the hazard is
    * (d·10⁶) DIV n_risk and the curve is a running SUM — additive, so
    * unlike KM's product it needs NO driver fold: the whole estimator
    * is a histogram, a suffix-sum window, and a prefix-sum window,
    * fully distributed end to end.
    *
    * Scale: the duration histogram is day-grain bounded; both windows
    * run over that bounded table, never over users. */
  def nelsonAalen(spark: SparkSession, dir: String): DataFrame =
    nelsonAalenDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type, ts) frame. */
  def nelsonAalenDf(ev: DataFrame): DataFrame = {
    val t0 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val maxDay = ev.agg(max(to_date(col("ts"))).as("maxd"))
    val durs = t0
      .join(firstPurchase, col("user_id") === col("pu") && col("pts") >= col("t0"), "left")
      .groupBy(col("user_id"), col("t0")).agg(min(col("pts")).as("p"))
      .crossJoin(broadcast(maxDay))
      .select(
        when(col("p").isNotNull,
          datediff(to_date(col("p")), to_date(col("t0"))))
          .otherwise(datediff(col("maxd"), to_date(col("t0")))).as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("event"))
    val hist = durs.groupBy("dur")
      .agg(count(lit(1)).as("m"), sum("event").as("d"))
    val wSuf = Window.orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPre = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("n_risk", sum("m").over(wSuf))
      .filter(col("d") >= 1)
      .withColumn("haz_micro", expr("(d * 1000000) DIV n_risk"))
      .withColumn("cumhaz_micro", sum("haz_micro").over(wPre))
      .select(col("dur").cast("int").as("day"), col("n_risk"),
        col("d").as("n_events"), col("haz_micro"), col("cumhaz_micro"))
      .orderBy("day")
  }

  /** Log-rank (Mantel–Cox) test — the two-sample significance
    * companion the KM/NA pair ([[survivalKmDf]], [[nelsonAalenDf]])
    * reads next: do the hash56 arms share one time-to-conversion
    * distribution? Durations and censoring are exactly the KM
    * derivation; per event day the arm-1 expectation is
    * e1 = (d·n1·10⁶) DIV n and the variance term factors two-step as
    * (d·(n−d)·((n1·n2·10⁶) DIV n²)) DIV (n−1) — the q_mann_whitney
    * wide-decimal split, keeping every intermediate under 10³⁸ out to
    * ~10⁹ users. χ²₁ = (O₁−E₁)²/V in micro against the pinned 3.841459
    * critical value. Degenerate V = 0 pins NULL.
    *
    * Scale: the KM posture — one user-grain duration rollup, then a
    * DAY-GRAIN pivot whose suffix-sum windows run over the bounded
    * observation horizon (hundreds of rows at any corpus size), and a
    * 1-row arithmetic finish. */
  def logRank(spark: SparkSession, dir: String): DataFrame =
    logRankDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type, ts) frame. */
  def logRankDf(ev: DataFrame): DataFrame = {
    val t0 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val maxDay = ev.agg(max(to_date(col("ts"))).as("maxd"))
    val durs = t0
      .join(firstPurchase, col("user_id") === col("pu") && col("pts") >= col("t0"), "left")
      .groupBy(col("user_id"), col("t0")).agg(min(col("pts")).as("p"))
      .crossJoin(broadcast(maxDay))
      .select(
        pmod(hash56(col("user_id").cast("string")), lit(2)).as("arm"),
        when(col("p").isNotNull,
          datediff(to_date(col("p")), to_date(col("t0"))))
          .otherwise(datediff(col("maxd"), to_date(col("t0")))).as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("event"))
    val hist = durs.groupBy("dur").agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("m1"),
      sum(when(col("arm") === 0, col("event")).otherwise(0L)).as("d1"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("m2"),
      sum(when(col("arm") === 1, col("event")).otherwise(0L)).as("d2"))
    // suffix sums over the bounded day-grain histogram → per-arm risk sets
    val w = Window.orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hist
      .withColumn("n1", sum("m1").over(w))
      .withColumn("n2", sum("m2").over(w))
      .filter(col("d1") + col("d2") >= 1L)
      .selectExpr("d1", "d1 + d2 AS d", "n1", "n2", "n1 + n2 AS n")
      .selectExpr("d1",
        "(CAST(d AS DECIMAL(38,0)) * n1 * 1000000) DIV n AS e1m",
        """CASE WHEN n <= 1 THEN CAST(0 AS DECIMAL(38,0))
          | ELSE (CAST(d AS DECIMAL(38,0)) * (n - d)
          |   * ((CAST(n1 AS DECIMAL(38,0)) * n2 * 1000000)
          |      DIV (CAST(n AS DECIMAL(38,0)) * n))) DIV (n - 1)
          | END AS vm""".stripMargin)
      .agg(sum("d1").as("o1"),
        sum("e1m").cast("decimal(38,0)").as("e1_micro"),
        sum("vm").cast("decimal(38,0)").as("v_micro"))
      .selectExpr("CAST(o1 AS BIGINT) AS o1",
        "CAST(e1_micro AS BIGINT) AS e1_micro",
        "CAST(v_micro AS BIGINT) AS v_micro",
        """CAST(CASE WHEN v_micro = 0 THEN NULL
          | ELSE ((CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_micro)
          |   * (CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_micro))
          |   DIV v_micro
          | END AS BIGINT) AS chi2_micro""".stripMargin)
      .withColumn("significant",
        when(col("chi2_micro").isNull, lit(null).cast("boolean"))
          .otherwise(col("chi2_micro") > 3841459L))
  }

  /** Pike hazard-ratio estimate — the EFFECT SIZE to [[logRankDf]]'s
    * significance verdict (the pair every clinical/churn readout ships
    * together): HR ≈ (O₁/E₁)/(O₂/E₂) over the same per-day risk-set
    * table, with both arms' expectations in integer micro (E₂ by the
    * complementary quotient) and the ratio finished as
    * (O₁·E₂·10⁶) DIV (E₁·O₂) in DECIMAL(38,0). Degenerate arms (no
    * events or zero expectation) pin NULL.
    *
    * Scale: the KM/log-rank posture — one duration rollup, bounded
    * day-grain suffix windows, 1-row arithmetic. */
  def hazardRatio(spark: SparkSession, dir: String): DataFrame =
    hazardRatioDf(Tables.events(spark, dir))

  /** Core over any (user_id, event_type, ts) frame. */
  def hazardRatioDf(ev: DataFrame): DataFrame = {
    val t0 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val maxDay = ev.agg(max(to_date(col("ts"))).as("maxd"))
    val durs = t0
      .join(firstPurchase, col("user_id") === col("pu") && col("pts") >= col("t0"), "left")
      .groupBy(col("user_id"), col("t0")).agg(min(col("pts")).as("p"))
      .crossJoin(broadcast(maxDay))
      .select(
        pmod(hash56(col("user_id").cast("string")), lit(2)).as("arm"),
        when(col("p").isNotNull,
          datediff(to_date(col("p")), to_date(col("t0"))))
          .otherwise(datediff(col("maxd"), to_date(col("t0")))).as("dur"),
        when(col("p").isNotNull, lit(1L)).otherwise(lit(0L)).as("event"))
    val hist = durs.groupBy("dur").agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("m1"),
      sum(when(col("arm") === 0, col("event")).otherwise(0L)).as("d1"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("m2"),
      sum(when(col("arm") === 1, col("event")).otherwise(0L)).as("d2"))
    val w = Window.orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hist
      .withColumn("n1", sum("m1").over(w))
      .withColumn("n2", sum("m2").over(w))
      .filter(col("d1") + col("d2") >= 1L)
      .selectExpr("d1", "d2", "d1 + d2 AS d", "n1", "n2", "n1 + n2 AS n")
      .selectExpr("d1", "d2",
        "(CAST(d AS DECIMAL(38,0)) * n1 * 1000000) DIV n AS e1m",
        "(CAST(d AS DECIMAL(38,0)) * n2 * 1000000) DIV n AS e2m")
      .agg(sum("d1").as("o1"), sum("d2").as("o2"),
        sum("e1m").cast("decimal(38,0)").as("e1m"),
        sum("e2m").cast("decimal(38,0)").as("e2m"))
      .selectExpr("CAST(o1 AS BIGINT) AS o1", "CAST(o2 AS BIGINT) AS o2",
        "CAST(e1m AS BIGINT) AS e1_micro", "CAST(e2m AS BIGINT) AS e2_micro",
        """CAST(CASE WHEN e1m = 0 OR o2 = 0 THEN NULL
          | ELSE (CAST(o1 AS DECIMAL(38,0)) * e2m * 1000000)
          |   DIV (e1m * o2) END AS BIGINT) AS hr_micro""".stripMargin)
  }

  /** OHLC candlestick bars — the canonical time-series downsample
    * (open/high/low/close + volume per bucket) the tumbling-count
    * window gate doesn't cover. Open/close are pinned by struct-min/max
    * over the TOTAL (ts, event_id) order — one partial+final aggregate,
    * no window, no sort — and are raw selected values (bit-identical
    * cross-engine); only volume is an fp sum, rounded 4 per the
    * q_events_window convention. Purchase stream, 30-minute bars. */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame =
    ohlcBarsDf(Tables.events(spark, dir).filter(col("event_type") === "purchase"))

  /** Core over any (ts, event_id, value) frame. */
  def ohlcBarsDf(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_trades"),
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        round(sum("value"), 4).as("volume"))
      .select(col("w.start").as("wstart"), col("n_trades"),
        col("o.value").as("open"), col("high"), col("low"),
        col("c.value").as("close"), col("volume"))
      .orderBy("wstart")

  /** Time-weighted average value (TWAP) per user-day — the sampling-
    * rate-proof mean (a burst of identical readings must not outweigh a
    * long-held value; the plain AVG the other gates use is sampling-
    * biased by construction). Each observation holds until the user's
    * next event that day; the last observation of a day carries zero
    * weight (dropped — the interval is unknown). Arithmetic is exact:
    * value in integer cents × duration in integer micros, one DIV at
    * the end — no fp aggregation. One (user) keyed window exchange +
    * a (user, day) rollup. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "d").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("d", to_date(col("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_us", col("next_us") - unix_micros(col("ts")))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("cents") * col("dur_us")).as("wsum"),
        sum("dur_us").as("dur_total_us"))
      .filter(col("dur_total_us") > 0)
      .selectExpr("user_id", "d", "n_intervals",
        "CAST(wsum DIV dur_total_us AS BIGINT) AS twap_cents")
      .orderBy("user_id", "d")
  }

  /** Growth accounting — the weekly new/retained/resurrected/churned
    * census (the canonical MAU-accounting identity behind every growth
    * dashboard: active(w) = new(w) + retained(w) + resurrected(w),
    * churned(w) = users active in w−7d but absent in w): the per-user
    * active-week list classifies each active week by its lagged
    * predecessor (none → new; adjacent → retained; gapped →
    * resurrected), and each active week whose successor is not the
    * adjacent week emits a churn event into w+7d — bounded by the
    * corpus' last week so the open frontier doesn't fabricate churn.
    * quick_ratio_bp = (new+resurrected)·10⁴ DIV churned (NULL when
    * churned = 0) — all-integer, engine-exact.
    *
    * Scale: one distinct rollup onto the (user, week) grain, one
    * user-keyed lag/lead window over that grain (per-user row counts
    * are calendar-bounded, never event-proportional), a 1-row
    * broadcast of the frontier week, and a week-grain census. */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(spark, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    val frontier = weeks.agg(max("w").as("mw"))
    val byU = Window.partitionBy("user_id").orderBy("w")
    val lab = weeks
      .withColumn("pw", lag("w", 1).over(byU))
      .withColumn("nw", lead("w", 1).over(byU))
    val actives = lab.select(col("w"),
      when(col("pw").isNull, lit("new"))
        .when(datediff(col("w"), col("pw")) === 7, lit("retained"))
        .otherwise(lit("resurrected")).as("cls"))
    val churn = lab.crossJoin(broadcast(frontier))
      .filter((col("nw").isNull || datediff(col("nw"), col("w")) > 7)
        && datediff(col("mw"), col("w")) >= 7)
      .select(date_add(col("w"), 7).as("w"), lit("churned").as("cls"))
    actives.unionAll(churn)
      .groupBy(col("w").as("week"))
      .agg(
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("cls") === "churned", 1L).otherwise(0L)).as("n_churned"))
      .withColumn("quick_ratio_bp",
        when(col("n_churned") > 0,
          expr("(n_new + n_resurrected) * 10000 DIV n_churned")))
      .orderBy("week")
  }

  /** Power-user curve — the engagement-frequency histogram (the "L30"
    * chart): how many users were active on exactly k distinct days of
    * the corpus window, with each bucket's share of the user base in
    * floored basis points. The shape (right-skew vs the smile of a
    * habit-forming product) is the classic read; the census is
    * all-integer so both engines land identical rows.
    *
    * Scale: one distinct rollup onto the (user, day) grain, a per-user
    * count (calendar-bounded), and a histogram over the bounded
    * day-count domain with a 1-row broadcast total. */
  def powerCurve(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("n_days"))
    val total = perUser.agg(count(lit(1)).as("n_total"))
    perUser.groupBy("n_days").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .selectExpr("n_days", "n_users",
        "n_users * 10000 DIV n_total AS share_bp")
      .orderBy("n_days")
  }

  /** Revenue growth accounting — [[growthAccounting]]'s money companion
    * (the MRR-bridge every SaaS board deck carries): weekly purchase
    * revenue per user in exact cents, each user-week classified against
    * the user's previous revenue week — first ever → new; adjacent →
    * the delta splits into expansion (growth) or contraction (decline);
    * gapped → resurrected — and a user's whole prior-week revenue
    * churns into w+7d when no adjacent week follows (frontier-bounded).
    * The bridge identity total(w) − total(w−7d) = new + resurrected +
    * expansion − contraction − churned holds exactly, all-integer.
    *
    * Scale: one (user, week) purchase rollup, one user-keyed lag/lead
    * window over calendar-bounded per-user rows, and a week-grain
    * census — the [[growthAccounting]] posture with cents. */
  def revenueAccounting(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .agg(sum(expr("CAST(round(value * 100) AS LONG)")).as("cents"))
    val frontier = weekly.agg(max("w").as("mw"))
    val byU = Window.partitionBy("user_id").orderBy("w")
    val lab = weekly
      .withColumn("pw", lag("w", 1).over(byU))
      .withColumn("pc", lag("cents", 1).over(byU))
      .withColumn("nw", lead("w", 1).over(byU))
    val actives = lab.select(col("w"),
      when(col("pw").isNull, col("cents")).otherwise(0L).as("new_cents"),
      when(col("pw").isNotNull && datediff(col("w"), col("pw")) === 7
        && col("cents") > col("pc"), col("cents") - col("pc"))
        .otherwise(0L).as("expansion_cents"),
      when(col("pw").isNotNull && datediff(col("w"), col("pw")) === 7
        && col("cents") < col("pc"), col("pc") - col("cents"))
        .otherwise(0L).as("contraction_cents"),
      when(col("pw").isNotNull && datediff(col("w"), col("pw")) > 7,
        col("cents")).otherwise(0L).as("resurrected_cents"),
      lit(0L).as("churned_cents"),
      col("cents").as("total_cents"))
    val churn = lab.crossJoin(broadcast(frontier))
      .filter((col("nw").isNull || datediff(col("nw"), col("w")) > 7)
        && datediff(col("mw"), col("w")) >= 7)
      .select(date_add(col("w"), 7).as("w"), lit(0L).as("new_cents"),
        lit(0L).as("expansion_cents"), lit(0L).as("contraction_cents"),
        lit(0L).as("resurrected_cents"), col("cents").as("churned_cents"),
        lit(0L).as("total_cents"))
    actives.unionAll(churn)
      .groupBy(col("w").as("week"))
      .agg(sum("new_cents").as("new_cents"),
        sum("expansion_cents").as("expansion_cents"),
        sum("contraction_cents").as("contraction_cents"),
        sum("resurrected_cents").as("resurrected_cents"),
        sum("churned_cents").as("churned_cents"),
        sum("total_cents").as("total_cents"))
      .orderBy("week")
  }

  val queries: Map[String, Q] = Map(
    "q_revenue_accounting" -> (revenueAccounting _),
    "q_power_curve" -> (powerCurve _),
    "q_growth_accounting" -> (growthAccounting _),
    "q_twap" -> (twap _),
    "q_ohlc_bars" -> (ohlcBars _),
    "q_survival_km" -> (survivalKm _),
    "q_nelson_aalen" -> (nelsonAalen _),
    "q_ab_test" -> (abTest _),
    "q_effect_size" -> (effectSize _),
    "q_ab_srm" -> (srmCheck _),
    "q_ipw_ate" -> (ipwAte _),
    "q_shapley_attribution" -> (shapleyAttribution _),
    "q_sprt" -> (sprtTest _),
    "q_cuped" -> (cuped _),
    "q_did" -> (diffInDiff _),
    "q_logrank" -> (logRank _),
    "q_rmst" -> (rmst _),
    "q_hazard_ratio" -> (hazardRatio _),
    "q_rolling_dau" -> (rollingDau _),
    "q_events_window" -> (tumblingWindow _),
    "q_events_session" -> (sessionize _),
    "q_events_json" -> (jsonProps _),
    "q_events_funnel" -> (funnel _),
    "q_asof_join" -> (asofJoin _),
    "q_asof_forward" -> (asofForward _),
    "q_interval_join" -> (intervalJoin _),
    "q_cohort_retention" -> (cohortRetention _),
    "q_cohort_ltv" -> (cohortLtv _),
    "q_activity_coverage" -> (activityCoverage _),
    "q_abandonment" -> (abandonment _),
    "q_peak_concurrency" -> (peakConcurrency _),
    "q_top_paths" -> (topPaths _),
    "q_attribution_multi" -> (attributionMulti _),
    "q_attribution_decay" -> (attributionDecay _),
    "q_markov_transitions" -> (markovTransitions _),
    "q_path_entropy" -> (pathEntropy _),
    "q_seq_patterns" -> (seqPatterns _),
    "q_removal_effect" -> (removalEffect _),
    "q_funnel_ci" -> (funnelWilson _),
    "q_debounce" -> (debounce _),
    "q_qte" -> (qte _),
    "q_funnel_time" -> (funnelLatency _))

  val oracles: Map[String, String] = Map(
    "q_revenue_accounting" ->
      """WITH wk AS (SELECT user_id, date_trunc('week', ts)::DATE AS w,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |mw AS (SELECT max(w) AS mw FROM wk),
        |lab AS (SELECT user_id, w, cents,
        |    lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw,
        |    lag(cents) OVER (PARTITION BY user_id ORDER BY w) AS pc,
        |    lead(w) OVER (PARTITION BY user_id ORDER BY w) AS nw
        |  FROM wk),
        |ev AS (
        |  SELECT w,
        |    CASE WHEN pw IS NULL THEN cents ELSE 0 END AS new_cents,
        |    CASE WHEN pw IS NOT NULL AND w - pw = 7 AND cents > pc
        |      THEN cents - pc ELSE 0 END AS expansion_cents,
        |    CASE WHEN pw IS NOT NULL AND w - pw = 7 AND cents < pc
        |      THEN pc - cents ELSE 0 END AS contraction_cents,
        |    CASE WHEN pw IS NOT NULL AND w - pw > 7 THEN cents ELSE 0 END
        |      AS resurrected_cents,
        |    0 AS churned_cents, cents AS total_cents
        |  FROM lab
        |  UNION ALL
        |  SELECT w + 7, 0, 0, 0, 0, cents, 0 FROM lab CROSS JOIN mw
        |  WHERE (nw IS NULL OR nw - w > 7) AND mw - w >= 7)
        |SELECT w AS week,
        |  sum(new_cents)::BIGINT AS new_cents,
        |  sum(expansion_cents)::BIGINT AS expansion_cents,
        |  sum(contraction_cents)::BIGINT AS contraction_cents,
        |  sum(resurrected_cents)::BIGINT AS resurrected_cents,
        |  sum(churned_cents)::BIGINT AS churned_cents,
        |  sum(total_cents)::BIGINT AS total_cents
        |FROM ev GROUP BY w ORDER BY week""".stripMargin,
    "q_power_curve" ->
      """WITH pu AS (SELECT user_id, count(*)::BIGINT AS n_days
        |  FROM (SELECT DISTINCT user_id, ts::DATE AS d FROM events)
        |  GROUP BY user_id),
        |t AS (SELECT count(*)::BIGINT AS n_total FROM pu)
        |SELECT n_days, count(*)::BIGINT AS n_users,
        |  (count(*) * 10000 // n_total)::BIGINT AS share_bp
        |FROM pu CROSS JOIN t GROUP BY n_days, n_total
        |ORDER BY n_days""".stripMargin,
    "q_growth_accounting" ->
      """WITH weeks AS (SELECT DISTINCT user_id,
        |    date_trunc('week', ts)::DATE AS w FROM events),
        |mw AS (SELECT max(w) AS mw FROM weeks),
        |lab AS (SELECT user_id, w,
        |    lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw,
        |    lead(w) OVER (PARTITION BY user_id ORDER BY w) AS nw
        |  FROM weeks),
        |ev AS (
        |  SELECT w, CASE WHEN pw IS NULL THEN 'new'
        |                 WHEN w - pw = 7 THEN 'retained'
        |                 ELSE 'resurrected' END AS cls
        |  FROM lab
        |  UNION ALL
        |  SELECT w + 7 AS w, 'churned' AS cls FROM lab CROSS JOIN mw
        |  WHERE (nw IS NULL OR nw - w > 7) AND mw - w >= 7)
        |SELECT w AS week,
        |  sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)::BIGINT AS n_new,
        |  sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_retained,
        |  sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_resurrected,
        |  sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_churned,
        |  CASE WHEN sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) > 0
        |    THEN ((sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)
        |           + sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END))
        |          * 10000 // sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END)
        |         )::BIGINT END AS quick_ratio_bp
        |FROM ev GROUP BY w ORDER BY week""".stripMargin,
    "q_twap" ->
      """WITH p AS (SELECT user_id, ts::DATE AS d,
        |    round(value * 100)::BIGINT AS cents,
        |    epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id, ts::DATE
        |      ORDER BY ts, event_id) AS next_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, d, count(*)::BIGINT AS n_intervals,
        |  (sum(cents * (next_us - us)) // sum(next_us - us))::BIGINT
        |    AS twap_cents
        |FROM p WHERE next_us IS NOT NULL
        |GROUP BY user_id, d HAVING sum(next_us - us) > 0
        |ORDER BY user_id, d""".stripMargin,
    "q_ohlc_bars" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart,
        |  count(*) AS n_trades,
        |  min({'t': ts, 'e': event_id, 'v': value})['v'] AS open,
        |  max(value) AS high, min(value) AS low,
        |  max({'t': ts, 'e': event_id, 'v': value})['v'] AS close,
        |  round(sum(value), 4) AS volume
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_nelson_aalen" ->
      """WITH t0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |fp AS (SELECT t0.user_id, t0.t0, min(e.ts) AS p
        |  FROM t0 LEFT JOIN events e ON e.user_id = t0.user_id
        |    AND e.event_type = 'purchase' AND e.ts >= t0.t0
        |  GROUP BY t0.user_id, t0.t0),
        |md AS (SELECT max(ts::DATE) AS maxd FROM events),
        |durs AS (SELECT CASE WHEN p IS NOT NULL
        |      THEN date_diff('day', t0::DATE, p::DATE)
        |      ELSE date_diff('day', t0::DATE, maxd) END AS dur,
        |    (CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS event
        |  FROM fp CROSS JOIN md),
        |hist AS (SELECT dur, count(*)::BIGINT AS m, sum(event)::BIGINT AS d
        |  FROM durs GROUP BY dur),
        |tab AS (SELECT dur, d, sum(m) OVER (ORDER BY dur
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n_risk
        |  FROM hist),
        |hz AS (SELECT dur::INT AS day, n_risk, d,
        |    (d * 1000000) // n_risk AS haz_micro
        |  FROM tab WHERE d >= 1)
        |SELECT day, n_risk, d AS n_events, haz_micro::BIGINT AS haz_micro,
        |  sum(haz_micro) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS cumhaz_micro
        |FROM hz ORDER BY day""".stripMargin,
    "q_hazard_ratio" ->
      s"""WITH t0 AS (SELECT user_id, min(ts) AS t0 FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |fp AS (SELECT t0.user_id, t0.t0, min(e.ts) AS p
         |  FROM t0 LEFT JOIN events e ON e.user_id = t0.user_id
         |    AND e.event_type = 'purchase' AND e.ts >= t0.t0
         |  GROUP BY t0.user_id, t0.t0),
         |md AS (SELECT max(ts::DATE) AS maxd FROM events),
         |durs AS (SELECT
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm,
         |    CASE WHEN p IS NOT NULL
         |      THEN date_diff('day', t0::DATE, p::DATE)
         |      ELSE date_diff('day', t0::DATE, maxd) END AS dur,
         |    (CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS event
         |  FROM fp CROSS JOIN md),
         |hist AS (SELECT dur,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS m1,
         |    sum(CASE WHEN arm = 0 THEN event ELSE 0 END)::BIGINT AS d1,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS m2,
         |    sum(CASE WHEN arm = 1 THEN event ELSE 0 END)::BIGINT AS d2
         |  FROM durs GROUP BY dur),
         |tab AS (SELECT d1, d2, d1 + d2 AS d,
         |    sum(m1) OVER (ORDER BY dur
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n1,
         |    sum(m2) OVER (ORDER BY dur
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n2
         |  FROM hist),
         |terms AS (SELECT d1, d2,
         |    (d::HUGEINT * n1 * 1000000) // (n1 + n2) AS e1m,
         |    (d::HUGEINT * n2 * 1000000) // (n1 + n2) AS e2m
         |  FROM tab WHERE d >= 1),
         |s AS (SELECT sum(d1)::HUGEINT AS o1, sum(d2)::HUGEINT AS o2,
         |    sum(e1m) AS e1m, sum(e2m) AS e2m FROM terms)
         |SELECT o1::BIGINT AS o1, o2::BIGINT AS o2,
         |  e1m::BIGINT AS e1_micro, e2m::BIGINT AS e2_micro,
         |  (CASE WHEN e1m = 0 OR o2 = 0 THEN NULL
         |    ELSE (o1 * e2m * 1000000) // (e1m * o2) END)::BIGINT AS hr_micro
         |FROM s""".stripMargin,
    "q_rmst" ->
      """WITH RECURSIVE t0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |fp AS (SELECT t0.user_id, t0.t0, min(e.ts) AS p
        |  FROM t0 LEFT JOIN events e ON e.user_id = t0.user_id
        |    AND e.event_type = 'purchase' AND e.ts >= t0.t0
        |  GROUP BY t0.user_id, t0.t0),
        |md AS (SELECT max(ts::DATE) AS maxd FROM events),
        |durs AS (SELECT CASE WHEN p IS NOT NULL
        |      THEN date_diff('day', t0::DATE, p::DATE)
        |      ELSE date_diff('day', t0::DATE, maxd) END AS dur,
        |    (CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS event
        |  FROM fp CROSS JOIN md),
        |hist AS (SELECT dur, count(*)::BIGINT AS m, sum(event)::BIGINT AS d
        |  FROM durs GROUP BY dur),
        |ord AS (SELECT dur, d, sum(m) OVER (ORDER BY dur
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n_risk,
        |    row_number() OVER (ORDER BY dur) AS rn
        |  FROM hist),
        |rec AS (
        |  SELECT rn, dur AS day,
        |    CASE WHEN d >= 1 THEN (1000000 * (n_risk - d)) // n_risk
        |      ELSE 1000000 END AS s,
        |    1000000 * dur AS integral,
        |    (CASE WHEN d >= 1 THEN 1 ELSE 0 END)::BIGINT AS ne
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.rn, o.dur,
        |    CASE WHEN o.d >= 1 THEN (r.s * (o.n_risk - o.d)) // o.n_risk
        |      ELSE r.s END,
        |    r.integral + r.s * (o.dur - r.day),
        |    r.ne + CASE WHEN o.d >= 1 THEN 1 ELSE 0 END
        |  FROM rec r JOIN ord o ON o.rn = r.rn + 1)
        |SELECT (SELECT max(dur) FROM ord)::BIGINT AS horizon_days,
        |  ne::BIGINT AS n_event_days, s::BIGINT AS final_surv_micro,
        |  integral::BIGINT AS rmst_micro_days
        |FROM rec WHERE rn = (SELECT max(rn) FROM ord)""".stripMargin,
    "q_logrank" ->
      s"""WITH t0 AS (SELECT user_id, min(ts) AS t0 FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |fp AS (SELECT t0.user_id, t0.t0, min(e.ts) AS p
         |  FROM t0 LEFT JOIN events e ON e.user_id = t0.user_id
         |    AND e.event_type = 'purchase' AND e.ts >= t0.t0
         |  GROUP BY t0.user_id, t0.t0),
         |md AS (SELECT max(ts::DATE) AS maxd FROM events),
         |durs AS (SELECT
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm,
         |    CASE WHEN p IS NOT NULL
         |      THEN date_diff('day', t0::DATE, p::DATE)
         |      ELSE date_diff('day', t0::DATE, maxd) END AS dur,
         |    (CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS event
         |  FROM fp CROSS JOIN md),
         |hist AS (SELECT dur,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS m1,
         |    sum(CASE WHEN arm = 0 THEN event ELSE 0 END)::BIGINT AS d1,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS m2,
         |    sum(CASE WHEN arm = 1 THEN event ELSE 0 END)::BIGINT AS d2
         |  FROM durs GROUP BY dur),
         |tab AS (SELECT d1, d1 + d2 AS d,
         |    sum(m1) OVER (ORDER BY dur
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n1,
         |    sum(m2) OVER (ORDER BY dur
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n2
         |  FROM hist),
         |terms AS (SELECT d1,
         |    (d::HUGEINT * n1 * 1000000) // (n1 + n2) AS e1m,
         |    CASE WHEN n1 + n2 <= 1 THEN 0::HUGEINT
         |      ELSE (d::HUGEINT * (n1 + n2 - d)
         |        * ((n1::HUGEINT * n2 * 1000000)
         |           // ((n1 + n2)::HUGEINT * (n1 + n2)))) // (n1 + n2 - 1)
         |      END AS vm
         |  FROM tab WHERE d >= 1),
         |s AS (SELECT sum(d1)::HUGEINT AS o1, sum(e1m) AS e1_micro,
         |    sum(vm) AS v_micro FROM terms)
         |SELECT o1::BIGINT AS o1, e1_micro::BIGINT AS e1_micro,
         |  v_micro::BIGINT AS v_micro,
         |  (CASE WHEN v_micro = 0 THEN NULL
         |    ELSE ((o1 * 1000000 - e1_micro) * (o1 * 1000000 - e1_micro))
         |      // v_micro END)::BIGINT AS chi2_micro,
         |  CASE WHEN v_micro = 0 THEN NULL
         |    ELSE ((CASE WHEN v_micro = 0 THEN NULL
         |      ELSE ((o1 * 1000000 - e1_micro) * (o1 * 1000000 - e1_micro))
         |        // v_micro END) > 3841459) END AS significant
         |FROM s""".stripMargin,
    "q_survival_km" ->
      """WITH RECURSIVE t0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |fp AS (SELECT t0.user_id, t0.t0, min(e.ts) AS p
        |  FROM t0 LEFT JOIN events e ON e.user_id = t0.user_id
        |    AND e.event_type = 'purchase' AND e.ts >= t0.t0
        |  GROUP BY t0.user_id, t0.t0),
        |md AS (SELECT max(ts::DATE) AS maxd FROM events),
        |durs AS (SELECT CASE WHEN p IS NOT NULL
        |      THEN date_diff('day', t0::DATE, p::DATE)
        |      ELSE date_diff('day', t0::DATE, maxd) END AS dur,
        |    (CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS event
        |  FROM fp CROSS JOIN md),
        |hist AS (SELECT dur, count(*)::BIGINT AS m, sum(event)::BIGINT AS d
        |  FROM durs GROUP BY dur),
        |tab AS (SELECT dur, d, sum(m) OVER (ORDER BY dur
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n_risk
        |  FROM hist),
        |ev AS (SELECT dur::INT AS day, n_risk, d,
        |    row_number() OVER (ORDER BY dur) AS rn
        |  FROM tab WHERE d >= 1),
        |rec AS (
        |  SELECT rn, day, n_risk, d,
        |    (1000000 * (n_risk - d)) // n_risk AS surv FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT ev.rn, ev.day, ev.n_risk, ev.d,
        |    (rec.surv * (ev.n_risk - ev.d)) // ev.n_risk
        |  FROM rec JOIN ev ON ev.rn = rec.rn + 1)
        |SELECT day, n_risk, d AS n_events, surv::BIGINT AS surv_micro
        |FROM rec ORDER BY day""".stripMargin,
    "q_did" ->
      s"""WITH mid AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
         |    AS mu FROM events),
         |u AS (SELECT user_id,
         |    sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) <= mu
         |      THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS pre,
         |    sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) > mu
         |      THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS post,
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm
         |  FROM events CROSS JOIN mid GROUP BY user_id),
         |m AS (SELECT
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
         |    sum(CASE WHEN arm = 0 THEN pre ELSE 0 END)::BIGINT AS pre_c_cents,
         |    sum(CASE WHEN arm = 0 THEN post ELSE 0 END)::BIGINT AS post_c_cents,
         |    sum(CASE WHEN arm = 1 THEN pre ELSE 0 END)::BIGINT AS pre_t_cents,
         |    sum(CASE WHEN arm = 1 THEN post ELSE 0 END)::BIGINT AS post_t_cents
         |  FROM u)
         |SELECT n_c, n_t, pre_c_cents, post_c_cents, pre_t_cents, post_t_cents,
         |  (CASE WHEN n_c = 0 THEN NULL
         |    ELSE ((post_c_cents - pre_c_cents) * 1000000) // n_c
         |    END)::BIGINT AS delta_c_micro,
         |  (CASE WHEN n_t = 0 THEN NULL
         |    ELSE ((post_t_cents - pre_t_cents) * 1000000) // n_t
         |    END)::BIGINT AS delta_t_micro,
         |  ((CASE WHEN n_t = 0 THEN NULL
         |    ELSE ((post_t_cents - pre_t_cents) * 1000000) // n_t END)
         |   - (CASE WHEN n_c = 0 THEN NULL
         |    ELSE ((post_c_cents - pre_c_cents) * 1000000) // n_c END))::BIGINT
         |    AS did_micro
         |FROM m""".stripMargin,
    "q_cuped" ->
      s"""WITH mid AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
         |    AS mu FROM events),
         |u AS (SELECT user_id,
         |    sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) <= mu
         |      THEN 1 ELSE 0 END)::BIGINT AS x,
         |    sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) > mu
         |      THEN 1 ELSE 0 END)::BIGINT AS y,
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm
         |  FROM events CROSS JOIN mid GROUP BY user_id),
         |m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         |    sum(y)::BIGINT AS sy,
         |    sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y) AS syy,
         |    sum(x::HUGEINT * y) AS sxy,
         |    sum(CASE WHEN arm = 0 THEN y END)::BIGINT AS ya,
         |    sum(CASE WHEN arm = 0 THEN 1 END)::BIGINT AS na,
         |    sum(CASE WHEN arm = 1 THEN y END)::BIGINT AS yb,
         |    sum(CASE WHEN arm = 1 THEN 1 END)::BIGINT AS nb
         |  FROM u)
         |SELECT n, sx, sy,
         |  (CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN NULL
         |    ELSE ((n::HUGEINT * sxy - sx::HUGEINT * sy) * 1000000)
         |      // (n::HUGEINT * sxx - sx::HUGEINT * sx) END)::BIGINT
         |    AS theta_micro,
         |  (CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx)
         |      * (n::HUGEINT * syy - sy::HUGEINT * sy) = 0 THEN NULL
         |    ELSE ((n::HUGEINT * sxy - sx::HUGEINT * sy)
         |       * (n::HUGEINT * sxy - sx::HUGEINT * sy) * 10000)
         |      // ((n::HUGEINT * sxx - sx::HUGEINT * sx)
         |       * (n::HUGEINT * syy - sy::HUGEINT * sy)) END)::BIGINT AS rho2_bp,
         |  ((yb::HUGEINT * na - ya::HUGEINT * nb) * 1000000
         |    // (na::HUGEINT * nb))::BIGINT AS raw_diff_micro
         |FROM m""".stripMargin,
    "q_sprt" ->
      s"""WITH u AS (SELECT user_id,
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm
         |  FROM (SELECT DISTINCT user_id FROM events)),
         |cv AS (SELECT user_id, 1::BIGINT AS cv FROM events
         |  WHERE event_type = 'purchase'
         |  GROUP BY user_id HAVING count(*) >= $AbConvMin),
         |a AS (SELECT arm, count(*)::BIGINT AS n,
         |    coalesce(sum(cv), 0)::BIGINT AS c
         |  FROM u LEFT JOIN cv USING (user_id) GROUP BY arm),
         |p AS (SELECT
         |    sum(CASE WHEN arm = 0 THEN n END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 0 THEN c END)::BIGINT AS c_a,
         |    sum(CASE WHEN arm = 1 THEN n END)::BIGINT AS n_b,
         |    sum(CASE WHEN arm = 1 THEN c END)::BIGINT AS c_b
         |  FROM a),
         |t AS (SELECT *,
         |    (CASE WHEN coalesce(c_a, 0) = 0
         |      OR $SprtUpliftDen * n_a <= $SprtUpliftNum * c_a THEN NULL
         |     ELSE round(ln(($SprtUpliftDen * n_a - $SprtUpliftNum * c_a)::DOUBLE
         |       / ($SprtUpliftDen * (n_a - c_a))::DOUBLE) * 1000000)
         |     END)::BIGINT AS term0_micro
         |  FROM p),
         |l AS (SELECT *,
         |    (CASE WHEN term0_micro IS NULL THEN NULL
         |     ELSE c_b * $SprtLnUpliftMicro + (n_b - c_b) * term0_micro
         |     END)::BIGINT AS llr_micro
         |  FROM t)
         |SELECT n_a, c_a, n_b, c_b, term0_micro, llr_micro,
         |  CASE WHEN llr_micro IS NULL THEN NULL
         |   WHEN llr_micro >= $SprtBoundMicro THEN 'uplift'
         |   WHEN llr_micro <= -$SprtBoundMicro THEN 'no_uplift'
         |   ELSE 'continue' END AS verdict
         |FROM l""".stripMargin,
    "q_ab_test" ->
      s"""WITH u AS (SELECT user_id,
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm
         |  FROM (SELECT DISTINCT user_id FROM events)),
         |cv AS (SELECT user_id, 1::BIGINT AS cv FROM events
         |  WHERE event_type = 'purchase'
         |  GROUP BY user_id HAVING count(*) >= $AbConvMin),
         |a AS (SELECT arm, count(*)::BIGINT AS n,
         |    coalesce(sum(cv), 0)::BIGINT AS c
         |  FROM u LEFT JOIN cv USING (user_id) GROUP BY arm),
         |p AS (SELECT
         |    sum(CASE WHEN arm = 0 THEN n END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 0 THEN c END)::BIGINT AS c_a,
         |    sum(CASE WHEN arm = 1 THEN n END)::BIGINT AS n_b,
         |    sum(CASE WHEN arm = 1 THEN c END)::BIGINT AS c_b
         |  FROM a)
         |SELECT n_a, c_a, n_b, c_b,
         |  (CASE WHEN coalesce(n_a, 0) = 0 THEN 0
         |    ELSE (c_a * 10000) // n_a END)::BIGINT AS cvr_a_bp,
         |  (CASE WHEN coalesce(n_b, 0) = 0 THEN 0
         |    ELSE (c_b * 10000) // n_b END)::BIGINT AS cvr_b_bp,
         |  z2_micro, z2_micro > $AbCritMicro AS significant
         |FROM (SELECT *,
         |  (CASE WHEN n_a + n_b > $AbZ2MaxN THEN NULL
         |   WHEN coalesce(n_a, 0) = 0 OR coalesce(n_b, 0) = 0
         |     OR (c_a + c_b) = 0 OR (c_a + c_b) = (n_a + n_b) THEN 0
         |   ELSE (abs(c_a * n_b - c_b * n_a) * 1000 // (n_a * n_b))
         |      * (abs(c_a * n_b - c_b * n_a) * 1000 * (n_a + n_b)
         |         // ((c_a + c_b) * (n_a + n_b - c_a - c_b)))
         |   END)::BIGINT AS z2_micro FROM p)""".stripMargin,
    "q_shapley_attribution" -> {
      val bit = ShapleyChannels.zipWithIndex
        .map { case (c, i) => s"WHEN '$c' THEN ${1 << i}" }
        .mkString("CASE event_type ", " ", " ELSE 0 END")
      val pv = shapleyPairs
        .map { case (c, s0, s1, w) => s"('$c', $s0, $s1, $w)" }.mkString(", ")
      s"""WITH u AS (SELECT user_id,
         |    CAST(sum(DISTINCT $bit) AS INT) AS mask,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv
         |  FROM events GROUP BY user_id),
         |census AS (SELECT mask,
         |    (sum(cv) * 10000) // count(*) AS v_bp FROM u GROUP BY mask),
         |pairs(channel, s_without, s_with, w) AS (VALUES $pv),
         |m AS (SELECT channel,
         |    w * (coalesce(c1.v_bp, 0) - coalesce(c0.v_bp, 0)) AS m
         |  FROM pairs LEFT JOIN census c1 ON c1.mask = s_with
         |  LEFT JOIN census c0 ON c0.mask = s_without)
         |SELECT channel, (sum(m) // ${shapleyFact(ShapleyChannels.length)})::BIGINT AS phi_bp
         |FROM m GROUP BY channel ORDER BY channel""".stripMargin
    },
    "q_ab_srm" ->
      s"""WITH u AS (SELECT user_id,
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm
         |  FROM (SELECT DISTINCT user_id FROM events)),
         |a AS (SELECT
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
         |  FROM u)
         |SELECT n_a, n_b,
         |  ((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b))::BIGINT
         |    AS srm_chi2_micro,
         |  ((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)) > $AbCritMicro
         |    AS mismatch
         |FROM a""".stripMargin,
    "q_ipw_ate" ->
      s"""WITH pu AS (SELECT user_id, count(*)::BIGINT AS ne,
         |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS t,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
         |  FROM events GROUP BY user_id),
         |st AS (SELECT least(ne // 20, ${IpwStrata - 1}) AS s, t, y FROM pu),
         |g AS (SELECT s, count(*)::BIGINT AS n, sum(t)::BIGINT AS nt,
         |    sum(CASE WHEN t = 1 THEN y ELSE 0 END)::BIGINT AS y1,
         |    sum(CASE WHEN t = 0 THEN y ELSE 0 END)::BIGINT AS y0
         |  FROM st GROUP BY s),
         |agg AS (SELECT sum(n)::BIGINT AS n_users,
         |    sum(CASE WHEN nt > 0 AND nt < n THEN n ELSE 0 END)::BIGINT AS n_used,
         |    sum(CASE WHEN nt = 0 OR nt = n THEN n ELSE 0 END)::BIGINT
         |      AS n_excluded,
         |    sum(CASE WHEN nt > 0 AND nt < n
         |      THEN (y1 * n * 10000) // nt - (y0 * n * 10000) // (n - nt)
         |      ELSE 0 END)::BIGINT AS sum_terms
         |  FROM g)
         |SELECT n_users, n_used, n_excluded,
         |  (CASE WHEN n_used = 0 THEN NULL
         |    ELSE sum_terms // n_used END)::BIGINT AS ate_bp
         |FROM agg""".stripMargin,
    "q_effect_size" ->
      s"""WITH u AS (SELECT user_id,
         |    ${hash56Sql("user_id::VARCHAR")} % 2 AS arm
         |  FROM (SELECT DISTINCT user_id FROM events)),
         |rv AS (SELECT user_id,
         |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS v
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |j AS (SELECT arm, coalesce(v, 0)::HUGEINT AS v
         |  FROM u LEFT JOIN rv USING (user_id)),
         |a AS (SELECT arm, count(*)::BIGINT AS n, sum(v) AS s,
         |    sum(v * v) AS ss FROM j GROUP BY arm),
         |p AS (SELECT
         |    sum(CASE WHEN arm = 0 THEN n END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 0 THEN s END) AS s_a,
         |    sum(CASE WHEN arm = 0 THEN ss END) AS ss_a,
         |    sum(CASE WHEN arm = 1 THEN n END)::BIGINT AS n_b,
         |    sum(CASE WHEN arm = 1 THEN s END) AS s_b,
         |    sum(CASE WHEN arm = 1 THEN ss END) AS ss_b
         |  FROM a)
         |SELECT n_a, n_b,
         |  s_a::BIGINT AS sum_a_cents, s_b::BIGINT AS sum_b_cents,
         |  ((s_b * 1000000) // n_b - (s_a * 1000000) // n_a)::BIGINT
         |    AS mean_gap_micro,
         |  round(CASE
         |    WHEN n_a < 2 OR n_b < 2 THEN CAST(NULL AS DOUBLE)
         |    WHEN (CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
         |          - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / n_a
         |       + (CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
         |          - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / n_b = 0.0
         |      THEN CAST(NULL AS DOUBLE)
         |    ELSE (CAST(s_b AS DOUBLE) / n_b - CAST(s_a AS DOUBLE) / n_a)
         |      / sqrt(((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
         |               - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / n_a
         |            + (CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
         |               - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / n_b)
         |           / (n_a + n_b - 2))
         |    END, 6) AS cohen_d
         |FROM p""".stripMargin,
    "q_rolling_dau" ->
      s"""WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
         |  FROM events),
         |fanned AS (SELECT d + off AS wd, user_id
         |  FROM daily CROSS JOIN (
         |    SELECT unnest(range(0, $RollingDays))::INT AS off)),
         |wau AS (SELECT wd, count(DISTINCT user_id)::BIGINT AS wau
         |  FROM fanned GROUP BY wd),
         |dau AS (SELECT d AS wd, count(*)::BIGINT AS dau
         |  FROM daily GROUP BY d)
         |SELECT wd, dau, wau, ((dau * 10000) // wau)::BIGINT AS stickiness_bp
         |FROM dau JOIN wau USING (wd) ORDER BY wd""".stripMargin,
    "q_events_window" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS wstart, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_session" ->
      """WITH l AS (SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (SELECT user_id, event_id,
        |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM l),
        |g AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, sum(n)::BIGINT AS n_events,
        |  max(n) AS max_session_events, round(avg(n), 4) AS avg_session_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |  round(avg(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id, ts, last_click_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_asof_forward" ->
      """SELECT event_id, user_id, ts, next_click_ts,
        |  CASE WHEN next_click_ts IS NULL THEN prev_click_ts
        |       WHEN prev_click_ts IS NULL THEN next_click_ts
        |       WHEN epoch_us(ts) - epoch_us(prev_click_ts)
        |         <= epoch_us(next_click_ts) - epoch_us(ts) THEN prev_click_ts
        |       ELSE next_click_ts END AS nearest_click_ts
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts,
        |    first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_ts
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_interval_join" ->
      """SELECT count(*) AS n_pairs,
        |  count(DISTINCT v.user_id) AS n_users,
        |  round(avg((epoch_us(c.click_ts) - epoch_us(v.view_ts)) / 1e6), 4)
        |    AS avg_gap_sec,
        |  (max(epoch_us(c.click_ts) - epoch_us(v.view_ts)) // 1000000)
        |    AS max_gap_sec
        |FROM (SELECT user_id, ts AS view_ts FROM events
        |      WHERE event_type = 'view') v
        |JOIN (SELECT user_id, ts AS click_ts FROM events
        |      WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        | AND c.click_ts >= v.view_ts
        | AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTES""".stripMargin,
    "q_peak_concurrency" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_us
        |  FROM events),
        |s AS (SELECT user_id, us,
        |    sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM l),
        |sess AS (SELECT user_id, session_id, min(us) AS s0, max(us) AS s1
        |  FROM s GROUP BY 1, 2),
        |sw AS (SELECT us, delta,
        |    sum(delta) OVER (ORDER BY us, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM (SELECT s0 AS us, 1 AS delta FROM sess
        |    UNION ALL SELECT s1, -1 FROM sess)),
        |p AS (SELECT max(live)::BIGINT AS peak FROM sw)
        |SELECT peak AS peak_concurrency,
        |  (SELECT min(us) FROM sw CROSS JOIN p WHERE live = peak)::BIGINT
        |    AS peak_at_us,
        |  (SELECT count(*) FROM sess)::BIGINT AS n_sessions,
        |  (SELECT count(DISTINCT user_id) FROM sess)::BIGINT AS n_users
        |FROM p""".stripMargin,
    "q_abandonment" ->
      s"""WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS us,
         |    ts::DATE AS d
         |  FROM events WHERE event_type = 'view'),
         |p AS (SELECT user_id, epoch_us(ts) AS pus FROM events
         |  WHERE event_type = 'purchase'),
         |conv AS (SELECT DISTINCT v.event_id FROM v JOIN p
         |  ON p.user_id = v.user_id
         |  AND p.pus > v.us AND p.pus <= v.us + $AbandonHorizonUs)
         |SELECT d, count(*)::BIGINT AS n_views,
         |  sum(CASE WHEN conv.event_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_converted,
         |  ((count(*) - sum(CASE WHEN conv.event_id IS NOT NULL THEN 1 ELSE 0 END))
         |    * 10000 // count(*))::BIGINT AS abandoned_bp
         |FROM v LEFT JOIN conv USING (event_id)
         |GROUP BY d ORDER BY d""".stripMargin,
    "q_activity_coverage" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_us
        |  FROM events),
        |s AS (SELECT user_id, us,
        |    sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM l),
        |g AS (SELECT user_id, session_id,
        |    max(us) - min(us) AS sess_us FROM s GROUP BY 1, 2),
        |u AS (SELECT user_id, count(*)::BIGINT AS n_sessions,
        |    sum(sess_us)::BIGINT AS active_us FROM g GROUP BY user_id),
        |sp AS (SELECT user_id, max(us) - min(us) AS span_us FROM s
        |  GROUP BY user_id)
        |SELECT user_id, n_sessions, n_sessions - 1 AS n_gaps,
        |  (active_us // 1000000)::BIGINT AS active_sec,
        |  (span_us // 1000000)::BIGINT AS span_sec,
        |  (CASE WHEN span_us = 0 THEN NULL
        |    ELSE (active_us * 10000) // span_us END)::BIGINT AS coverage_bp
        |FROM u JOIN sp USING (user_id) ORDER BY user_id""".stripMargin,
    "q_cohort_ltv" ->
      """WITH firsts AS (SELECT user_id,
        |    date_trunc('week', min(ts))::DATE AS cw
        |  FROM events GROUP BY user_id),
        |sizes AS (SELECT cw, count(*)::BIGINT AS cohort_n FROM firsts
        |  GROUP BY cw),
        |rev AS (SELECT f.cw,
        |    (date_diff('day', f.cw, date_trunc('week', e.ts)::DATE) // 7)::BIGINT
        |      AS week_offset,
        |    sum(CAST(round(e.value * 100) AS BIGINT))::BIGINT AS revenue_cents
        |  FROM events e JOIN firsts f USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT rev.cw AS cohort_week, week_offset, revenue_cents,
        |  sum(revenue_cents) OVER (PARTITION BY rev.cw ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS cum_revenue_cents,
        |  cohort_n,
        |  (sum(revenue_cents) OVER (PARTITION BY rev.cw ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   // cohort_n)::BIGINT AS ltv_cents_per_user
        |FROM rev JOIN sizes ON sizes.cw = rev.cw
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_cohort_retention" ->
"""WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cw
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS aw FROM events),
        |g AS (SELECT f.cw, (date_diff('day', f.cw, a.aw) / 7)::BIGINT AS week_offset
        |  FROM a JOIN f USING (user_id)),
        |r AS (SELECT cw, week_offset, count(*) AS n_active
        |  FROM g GROUP BY cw, week_offset),
        |sz AS (SELECT cw, n_active AS cohort_n FROM r WHERE week_offset = 0)
        |SELECT r.cw AS cohort_week, r.week_offset, r.n_active, sz.cohort_n,
        |  ((r.n_active * 10000) // sz.cohort_n) AS retention_bp
        |FROM r JOIN sz USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_top_paths" ->
      s"""WITH l AS (SELECT user_id, event_id, ts, event_type,
         |    lag(epoch_us(ts)) OVER w AS prev_us,
         |    lead(event_type, 1) OVER w AS e2,
         |    lead(event_type, 2) OVER w AS e3
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (SELECT *,
         |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM l),
         |t AS (SELECT *,
         |    lead(session_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS s2
         |  FROM s)
         |SELECT event_type AS e1, e2, e3, count(*) AS n
         |FROM t WHERE s2 = session_id
         |GROUP BY 1, 2, 3
         |ORDER BY n DESC, e1, e2, e3 LIMIT $PathTopK""".stripMargin,
    "q_events_funnel" ->
      """WITH s AS (SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS tv
        |  FROM events),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
        |      OVER (PARTITION BY user_id) AS tc FROM s),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
        |      OVER (PARTITION BY user_id) AS tp FROM s2),
        |u AS (SELECT user_id, min(tv) AS tv, min(tc) AS tc, min(tp) AS tp
        |  FROM s3 GROUP BY user_id)
        |SELECT count(*) AS n_users, count(tv) AS n_view,
        |  count(tc) AS n_view_click, count(tp) AS n_full_funnel,
        |  round(avg(CASE WHEN tp IS NOT NULL
        |    THEN epoch_us(tp) - epoch_us(tv) END) / 1e6, 2) AS avg_sec_convert
        |FROM u""".stripMargin,
    "q_attribution_decay" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |p AS (SELECT event_id AS purchase_id, user_id, us AS pus FROM e
         |  WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, us AS cus FROM e WHERE event_type = 'click'),
         |pr AS (SELECT purchase_id, pus, cus,
         |    (1024::BIGINT >> least((pus - cus) // $DecayHalfLifeUs, 10)::INT)
         |      AS w
         |  FROM p JOIN c USING (user_id)
         |  WHERE cus < pus AND cus >= pus - $AttributionHorizonUs),
         |g AS (SELECT purchase_id, count(*)::BIGINT AS n_touch,
         |    sum(w)::BIGINT AS w_total_units, max(pus) AS pus,
         |    min(cus) AS fc, max(cus) AS lc
         |  FROM pr GROUP BY purchase_id)
         |SELECT purchase_id, n_touch, w_total_units,
         |  (((1024::BIGINT >> least((pus - fc) // $DecayHalfLifeUs, 10)::INT)
         |    * 10000) // w_total_units)::BIGINT AS first_share_bp,
         |  (((1024::BIGINT >> least((pus - lc) // $DecayHalfLifeUs, 10)::INT)
         |    * 10000) // w_total_units)::BIGINT AS last_share_bp
         |FROM g ORDER BY purchase_id""".stripMargin,
    "q_attribution_multi" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |w AS (SELECT *,
         |    count(CASE WHEN event_type = 'click' THEN 1 END)
         |      OVER win AS n_touch,
         |    min(CASE WHEN event_type = 'click' THEN us END)
         |      OVER win AS first_us
         |  FROM e
         |  WINDOW win AS (PARTITION BY user_id ORDER BY us
         |    RANGE BETWEEN $AttributionHorizonUs PRECEDING AND 1 PRECEDING))
         |SELECT event_id, user_id, n_touch,
         |  CASE WHEN n_touch = 0 THEN 0 WHEN n_touch = 1 THEN 10000
         |       WHEN n_touch = 2 THEN 5000
         |       ELSE 4000 + (2000 - (n_touch - 2) * (2000 // (n_touch - 2)))
         |  END AS first_bp,
         |  CASE WHEN n_touch <= 1 THEN 0 WHEN n_touch = 2 THEN 5000
         |       ELSE 4000 END AS last_bp,
         |  CASE WHEN n_touch <= 2 THEN 0
         |       ELSE 2000 // (n_touch - 2) END AS mid_each_bp,
         |  CASE WHEN n_touch > 0 THEN (us - first_us) // 1000000
         |  END AS window_sec
         |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_qte" -> {
      val qcols = (arm: Int) => QteFractions.map { case (n, f) =>
        s"quantile_cont(cents, $f) FILTER (arm = $arm) AS ${n}_$arm" }.mkString(",\n    ")
      val rows = QteFractions.map { case (n, _) =>
        s"SELECT '$n' AS quantile, ${n}_0 AS control_cents, ${n}_1 AS treated_cents, ${n}_1 - ${n}_0 AS qte_cents FROM m"
      }.mkString("\nUNION ALL ")
      s"""WITH p AS (SELECT
         |    ${graft.functions.TextFns.hash56Sql("user_id::VARCHAR")} % 2 AS arm,
         |    round(value * 100)::BIGINT AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |m AS (SELECT ${qcols(0)},
         |    ${qcols(1)} FROM p)
         |SELECT * FROM ($rows) ORDER BY quantile""".stripMargin
    },
    "q_debounce" ->
      s"""WITH l AS (SELECT user_id, event_id, event_type, ts, value,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
         |      ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |f AS (SELECT event_type, value,
         |    CASE WHEN prev_us IS NOT NULL
         |      AND epoch_us(ts) - prev_us <= $DebounceUs THEN 1 ELSE 0 END
         |      AS dropped
         |  FROM l)
         |SELECT event_type, count(*)::BIGINT AS n_events,
         |  sum(dropped)::BIGINT AS n_dropped,
         |  (sum(dropped) * 10000 // count(*))::BIGINT AS drop_bp,
         |  sum(CASE WHEN dropped = 0 THEN round(value * 100)::BIGINT
         |    ELSE 0 END)::BIGINT AS kept_cents
         |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_funnel_ci" -> {
      def wilson(sign: String): String =
        s"""CASE WHEN n = 0 THEN NULL ELSE round(
           | ((c::DOUBLE / n + 3.841459 / (2 * n)
           |   $sign 1.959964 * sqrt((c::DOUBLE / n) * (1 - c::DOUBLE / n) / n
           |     + 3.841459 / (4 * n::DOUBLE * n)))
           |  / (1 + 3.841459 / n)) * 10000) END""".stripMargin
      s"""WITH s AS (SELECT user_id, event_type, ts,
         |    min(CASE WHEN event_type = 'view' THEN ts END)
         |      OVER (PARTITION BY user_id) AS tv
         |  FROM events),
         |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
         |      OVER (PARTITION BY user_id) AS tc FROM s),
         |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
         |      OVER (PARTITION BY user_id) AS tp FROM s2),
         |u AS (SELECT user_id, min(tv) AS tv, min(tc) AS tc, min(tp) AS tp
         |  FROM s3 GROUP BY user_id),
         |f AS (SELECT count(tv)::BIGINT AS n_view,
         |    count(tc)::BIGINT AS n_view_click,
         |    count(tp)::BIGINT AS n_full_funnel FROM u),
         |steps AS (
         |  SELECT 'click_to_purchase' AS step, n_full_funnel AS c,
         |    n_view_click AS n FROM f
         |  UNION ALL SELECT 'view_to_click', n_view_click, n_view FROM f
         |  UNION ALL SELECT 'view_to_purchase', n_full_funnel, n_view FROM f)
         |SELECT step, c, n,
         |  CASE WHEN n = 0 THEN NULL ELSE (c * 10000) // n END AS rate_bp,
         |  (${wilson("-")})::BIGINT AS wilson_lo_bp,
         |  (${wilson("+")})::BIGINT AS wilson_hi_bp
         |FROM steps ORDER BY step""".stripMargin
    },
    "q_seq_patterns" ->
      """WITH l AS (SELECT user_id, event_id, ts, event_type,
        |    lag(epoch_us(ts)) OVER w AS prev_us
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *,
        |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM l),
        |r AS (SELECT user_id, session_id, event_type,
        |    min(epoch_us(ts))::BIGINT AS first_us,
        |    max(epoch_us(ts))::BIGINT AS last_us
        |  FROM s GROUP BY 1, 2, 3),
        |ns AS (SELECT count(*)::BIGINT AS n
        |  FROM (SELECT DISTINCT user_id, session_id FROM r)),
        |p AS (SELECT x.event_type AS a, y.event_type AS b,
        |    count(*)::BIGINT AS n_sessions
        |  FROM r x JOIN r y USING (user_id, session_id)
        |  WHERE x.event_type <> y.event_type AND x.first_us < y.last_us
        |  GROUP BY 1, 2)
        |SELECT a, b, n_sessions,
        |  (n_sessions * 10000) // (SELECT n FROM ns) AS support_bp
        |FROM p ORDER BY a, b""".stripMargin,
    "q_removal_effect" -> {
      val statesList = RemovalStates.map(s => s"'$s'").mkString(", ")
      def chain(tag: String, removed: Option[String]): String = {
        val cut = removed.map(r => s" AND pm.t <> '$r'").getOrElse("")
        val steps = (1 to RemovalSteps).map { k =>
          s"""p_${tag}_$k AS (SELECT st0.s,
             |  CASE WHEN st0.s = 'purchase' THEN 1000000
             |    ELSE coalesce(sum(pm.m * q.p), 0) // 1000000 END AS p
             |  FROM states st0
             |  LEFT JOIN pm ON pm.f = st0.s$cut
             |  LEFT JOIN p_${tag}_${k - 1} q ON q.s = pm.t
             |  GROUP BY st0.s)""".stripMargin
        }.mkString(",\n")
        val live = removed.map(r => s" WHERE st.s <> '$r'").getOrElse("")
        s"""p_${tag}_0 AS (SELECT s,
           |  CASE WHEN s = 'purchase' THEN 1000000 ELSE 0 END AS p FROM states),
           |$steps,
           |conv_$tag AS (SELECT coalesce(sum(st.n * p.p), 0)
           |    // (SELECT n FROM ns) AS conv
           |  FROM st JOIN p_${tag}_$RemovalSteps p ON p.s = st.s$live)""".stripMargin
      }
      val variants = RemovalStates.filterNot(_ == "purchase")
      val chains = (chain("base", None) +:
        variants.map(c => chain(c, Some(c)))).mkString(",\n")
      val rows = variants.map { c =>
        s"""SELECT '$c' AS channel,
           |  (SELECT conv FROM conv_base)::BIGINT AS conv_base_micro,
           |  (SELECT conv FROM conv_$c)::BIGINT AS conv_removed_micro,
           |  (CASE WHEN (SELECT conv FROM conv_base) = 0 THEN NULL
           |    ELSE (((SELECT conv FROM conv_base) - (SELECT conv FROM conv_$c))
           |      * 10000) // (SELECT conv FROM conv_base) END)::BIGINT
           |    AS removal_bp""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH l AS (SELECT user_id, event_id, ts, event_type,
         |    lag(epoch_us(ts)) OVER w AS prev_us
         |  FROM events WHERE event_type IN ($statesList)
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (SELECT *,
         |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
         |      THEN 1 ELSE 0 END AS new_s,
         |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM l),
         |t AS (SELECT *,
         |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS to_type,
         |    lead(session_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS to_session
         |  FROM s),
         |states AS (SELECT unnest([$statesList]) AS s),
         |c AS (SELECT event_type AS f, to_type AS t, count(*)::BIGINT AS n
         |  FROM t WHERE to_session = session_id GROUP BY 1, 2),
         |tots AS (SELECT f, sum(n)::BIGINT AS tot FROM c GROUP BY f),
         |pm AS (SELECT f, t, (n * 1000000) // tot AS m FROM c JOIN tots USING (f)),
         |st AS (SELECT event_type AS s, count(*)::BIGINT AS n
         |  FROM t WHERE new_s = 1 GROUP BY 1),
         |ns AS (SELECT sum(n)::BIGINT AS n FROM st),
         |$chains
         |SELECT * FROM ($rows) ORDER BY channel""".stripMargin
    },
    "q_path_entropy" ->
      """WITH l AS (SELECT user_id, event_id, ts, event_type,
        |    lag(epoch_us(ts)) OVER w AS prev_us,
        |    lead(event_type, 1) OVER w AS to_type
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *,
        |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM l),
        |t AS (SELECT *,
        |    lead(session_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_session
        |  FROM s),
        |c AS (SELECT event_type AS from_type, to_type, count(*)::BIGINT AS n
        |  FROM t WHERE to_session = session_id GROUP BY 1, 2),
        |x AS (SELECT from_type, to_type, n,
        |    sum(n) OVER (PARTITION BY from_type)::BIGINT AS tot,
        |    row_number() OVER (PARTITION BY from_type
        |      ORDER BY n DESC, to_type) AS rk
        |  FROM c),
        |y AS (SELECT from_type, to_type, n, tot, rk,
        |    n * round(ln(tot::DOUBLE / n::DOUBLE) * 1000000)::BIGINT AS term
        |  FROM x)
        |SELECT from_type, max(tot)::BIGINT AS t,
        |  count(*)::BIGINT AS n_next,
        |  (sum(term) // max(tot))::BIGINT AS entropy_micro,
        |  max(CASE WHEN rk = 1 THEN to_type END) AS top_next,
        |  max(CASE WHEN rk = 1 THEN (n * 10000) // tot END)::BIGINT
        |    AS top_share_bp
        |FROM y GROUP BY from_type ORDER BY from_type""".stripMargin,
    "q_markov_transitions" ->
      """WITH l AS (SELECT user_id, event_id, ts, event_type,
        |    lag(epoch_us(ts)) OVER w AS prev_us,
        |    lead(event_type, 1) OVER w AS to_type
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *,
        |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM l),
        |t AS (SELECT *,
        |    lead(session_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_session
        |  FROM s),
        |c AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |  FROM t WHERE to_session = session_id GROUP BY 1, 2),
        |tt AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY from_type)
        |SELECT from_type, to_type, n,
        |  ((n * 1000000) // tot)::BIGINT AS p_micro
        |FROM c JOIN tt USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "q_funnel_time" ->
      """WITH s AS (SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS tv
        |  FROM events),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tv THEN ts END)
        |      OVER (PARTITION BY user_id) AS tp FROM s),
        |u AS (SELECT user_id, min(tv) AS tv, min(tp) AS tp
        |  FROM s2 GROUP BY user_id),
        |lat AS (SELECT ((epoch_us(tp) - epoch_us(tv)) // 1000000) AS lat_sec
        |  FROM u WHERE tp IS NOT NULL)
        |SELECT count(*) AS n_converted,
        |  min(lat_sec)::BIGINT AS min_sec, max(lat_sec)::BIGINT AS max_sec,
        |  round(quantile_cont(lat_sec, 0.5), 4) AS p50_sec,
        |  round(quantile_cont(lat_sec, 0.9), 4) AS p90_sec
        |FROM lat""".stripMargin)
}
