package graft.operators

import graft.SparkSpec

/** Invariant and naive-replay checks for the event/time-series analytics
  * additions (multi-touch attribution, Markov transitions, funnel
  * latency, EWMA, CUSUM, vocabulary growth, mix shift), plus plan-shape
  * asserts for the ones whose 100 TB viability depends on structure:
  * attribution must be a pure window (never a self-join), and the
  * 8-lag EWMA / prefix-sum CUSUM must each collapse into ONE Window
  * node so all their window columns ride a single key exchange. */
class AnalyticsOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attributionMulti credits always sum to exactly 10000 bp") {
    val rows = Events.attributionMulti(spark, dir).collect()
    assert(rows.nonEmpty)
    var touched = 0
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_touch"))
      val first = r.getLong(r.fieldIndex("first_bp"))
      val last = r.getLong(r.fieldIndex("last_bp"))
      val mid = r.getLong(r.fieldIndex("mid_each_bp"))
      if (n == 0) {
        assert(first == 0 && last == 0 && mid == 0)
        assert(r.isNullAt(r.fieldIndex("window_sec")))
      } else {
        touched += 1
        val total = first + last + math.max(0L, n - 2) * mid
        assert(total == 10000L, s"n=$n first=$first last=$last mid=$mid")
        assert(r.getLong(r.fieldIndex("window_sec")) >= 0L)
      }
    }
    assert(touched > 0, "test data must exercise the credited path")
  }

  test("growthAccounting holds the MAU-accounting identity week over week") {
    import org.apache.spark.sql.functions._
    val rows = Events.growthAccounting(spark, dir)
      .orderBy("week").collect()
    assert(rows.nonEmpty)
    // active(w) = new + retained + resurrected must replay the direct
    // distinct-user census, and active(w) − churned(w+1) + new(w+1) +
    // resurrected(w+1) = active(w+1) (the identity the census exists for)
    val active = graft.Tables.events(spark, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct().groupBy("w").count()
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    var prevActive = 0L
    rows.foreach { r =>
      val w = r.getDate(r.fieldIndex("week")).toString
      val nNew = r.getLong(r.fieldIndex("n_new"))
      val nRet = r.getLong(r.fieldIndex("n_retained"))
      val nRes = r.getLong(r.fieldIndex("n_resurrected"))
      val nChu = r.getLong(r.fieldIndex("n_churned"))
      val act = nNew + nRet + nRes
      assert(act == active.getOrElse(w, 0L), s"week $w census mismatch")
      // retained(w) = active(w-1) − churned(w): both count last week's
      // actives by whether they came back
      assert(nRet == prevActive - nChu, s"week $w retention identity")
      prevActive = act
    }
    assert(rows.head.getLong(rows.head.fieldIndex("n_retained")) == 0L)
    assert(rows.head.getLong(rows.head.fieldIndex("n_resurrected")) == 0L)
  }

  test("revenueAccounting holds the MRR bridge identity week over week") {
    val rows = Events.revenueAccounting(spark, dir).orderBy("week").collect()
    assert(rows.nonEmpty)
    def g(r: org.apache.spark.sql.Row, c: String) = r.getLong(r.fieldIndex(c))
    var prevTotal = 0L
    var moved = false
    rows.foreach { r =>
      // total(w) = total(w-1) + new + resurrected + expansion
      //            - contraction - churned — the bridge must close
      val total = prevTotal + g(r, "new_cents") + g(r, "resurrected_cents") +
        g(r, "expansion_cents") - g(r, "contraction_cents") -
        g(r, "churned_cents")
      assert(total == g(r, "total_cents"),
        s"week ${r.get(0)}: bridge $total != total ${g(r, "total_cents")}")
      if (g(r, "expansion_cents") > 0 || g(r, "contraction_cents") > 0)
        moved = true
      prevTotal = total
    }
    assert(moved, "test data must exercise the expansion/contraction path")
    assert(g(rows.head, "new_cents") == g(rows.head, "total_cents"))
  }

  test("diffInDiff partitions users and cents exactly across arms and periods") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, dir)
    val r = Events.diffInDiff(spark, dir).collect().head
    def g(c: String) = r.getLong(r.fieldIndex(c))
    assert(g("n_c") + g("n_t") ==
      ev.select(countDistinct("user_id")).head().getLong(0))
    val totalCents = ev.filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))).head().getLong(0)
    assert(g("pre_c_cents") + g("post_c_cents") + g("pre_t_cents") +
      g("post_t_cents") == totalCents)
    assert(g("did_micro") == g("delta_t_micro") - g("delta_c_micro"))
  }

  test("blockingQuality: containment pins PC=100% for the truth-aligned scheme") {
    // sf0.01: the sf0.001 customer table has all-unique truth keys
    // (truth_pairs = 0 → NULL pc, the degenerate guard's own case)
    val got = Relational.blockingQuality(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> r).toMap
    val degen = Relational.blockingQuality(spark, dir).collect()
    assert(degen.forall(r => r.getLong(r.fieldIndex("truth_pairs")) > 0 ||
      r.isNullAt(r.fieldIndex("pc_bp"))))
    assert(got.keySet == Set("bal_bucket", "nation"))
    got.values.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("found_pairs") <= g("truth_pairs"))
      assert(g("pc_bp") >= 0 && g("pc_bp") <= 10000)
      assert(g("rr_bp") >= 0 && g("rr_bp") <= 10000)
      val n = g("n_records")
      assert(g("cand_pairs") <= n * (n - 1) / 2)
    }
    // the truth key CONTAINS the balance bucket, so every truth pair is
    // co-located under bal_bucket blocking — PC must be exactly 100%
    val bb = got("bal_bucket")
    assert(bb.getLong(bb.fieldIndex("found_pairs")) ==
      bb.getLong(bb.fieldIndex("truth_pairs")))
    assert(bb.getLong(bb.fieldIndex("pc_bp")) == 10000L)
    // nation is NOT in the truth key: it must lose some truth pairs
    val nn = got("nation")
    assert(nn.getLong(nn.fieldIndex("pc_bp")) < 10000L)
  }

  test("priceElasticity covers every brand with a defined slope") {
    val rows = Relational.priceElasticity(spark, dir).collect()
    assert(rows.length == 25) // TPC-H brand domain: Brand#11..Brand#55
    val nTotal = rows.map(_.getLong(1)).sum
    import org.apache.spark.sql.functions._
    val expected = graft.Tables.lineitem(spark, dir)
      .filter(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100 / l_quantity) AS BIGINT) >= 1")
        && col("l_quantity") >= 1)
      .count()
    assert(nTotal == expected, "every valid lineitem feeds exactly one brand")
    // ln-spread sanity: a brand with >1 distinct price must have a slope
    assert(rows.forall(r => !r.isNullAt(2)))
  }

  test("pathEntropy matches a naive replay over the transition matrix") {
    val cells = Events.markovTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = Events.pathEntropy(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val from = r.getString(0)
      val mine = cells.filter(_._1 == from)
      val tot = mine.map(_._3).sum
      val h = mine.map { case (_, _, n) =>
        n * math.round(math.log(tot.toDouble / n.toDouble) * 1e6) }.sum / tot
      val top = mine.minBy { case (_, t, n) => (-n, t) }
      assert(r.getLong(r.fieldIndex("t")) == tot)
      assert(r.getLong(r.fieldIndex("n_next")) == mine.length)
      assert(r.getLong(r.fieldIndex("entropy_micro")) == h, s"$from entropy")
      assert(r.getString(r.fieldIndex("top_next")) == top._2)
      assert(r.getLong(r.fieldIndex("top_share_bp")) == top._3 * 10000 / tot)
      // a deterministic state (single next) must read zero entropy
      if (mine.length == 1) assert(h == 0L)
    }
  }

  test("hellingerDrift: bounded in [0, 1e6], near zero on a stable split") {
    val r = DataQuality.hellingerDrift(spark, dir).collect().head
    val h2 = r.getLong(r.fieldIndex("h2_micro"))
    assert(h2 >= 0L && h2 <= 1000000L)
    assert(r.getLong(r.fieldIndex("affinity_micro")) >= 0L)
    // the synthetic order-value distribution is stationary: the two
    // halves must read almost identical (H² well under the 0.25 alarm)
    assert(h2 < 250000L, s"h2=$h2 on stationary data")
    assert(r.getLong(r.fieldIndex("n_buckets")) > 0L)
  }

  test("theilIndex: non-negative, under its ln(n) ceiling, replayed") {
    val rows = Relational.theilIndex(spark, dir).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val revs = graft.Tables.lineitem(spark, dir)
      .join(graft.Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long"), col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).filter(_._2 > 0)
    rows.foreach { r =>
      val nation = r.get(0).asInstanceOf[Number].longValue
      val xs = revs.filter(_._1 == nation).map(_._2)
      val s = xs.map(BigInt(_)).sum
      val expected = (xs.map(x => BigInt(x) *
        math.round(math.log(x.toDouble * xs.length / s.toDouble) * 1e6)).sum / s).toLong
      val theil = r.getLong(r.fieldIndex("theil_micro"))
      assert(theil == expected, s"nation $nation")
      // Jensen: T ≥ 0 (up to the per-term micro rounding slack)
      assert(theil >= -xs.length, s"nation $nation negative")
      assert(theil <= r.getLong(r.fieldIndex("ceiling_micro")))
    }
  }

  test("hhi: bounded by 1/n and 1, exact BigInt replay per nation") {
    import org.apache.spark.sql.functions._
    val revs = graft.Tables.lineitem(spark, dir)
      .join(graft.Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long"), col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val rows = Relational.hhi(spark, dir).collect()
    rows.foreach { r =>
      val nation = r.get(0).asInstanceOf[Number].longValue
      val xs = revs.filter(_._1 == nation).map(x => BigInt(x._2))
      val (s, s2) = (xs.sum, xs.map(x => x * x).sum)
      val expected = (s2 * 1000000) / (s * s)
      assert(r.getLong(r.fieldIndex("hhi_micro")) == expected.toLong, s"n$nation")
      // HHI ∈ [1/n, 1]: equal shares floor, monopoly ceiling
      assert(r.getLong(r.fieldIndex("hhi_micro")) >= 1000000L / xs.length - 1)
      assert(r.getLong(r.fieldIndex("hhi_micro")) <= 1000000L)
    }
  }

  test("priceIndex: the base year reads exactly 1e6; weights replay") {
    val rows = Relational.priceIndex(spark, dir).collect()
    assert(rows.nonEmpty)
    val byYear = rows.map(r => r.getInt(0) -> r).toMap
    val baseYr = byYear.keys.min
    assert(byYear(baseYr).getLong(2) == 1000000L, "base year is the unit")
    // common-part counts never exceed the base year's own census
    val baseParts = byYear(baseYr).getLong(1)
    rows.foreach(r => assert(r.getLong(1) <= baseParts))
  }

  test("varianceRatio: near-unity on iid daily sums, NULL-free at gate scale") {
    val rows = Temporal.varianceRatio(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Temporal.VrLags)
    rows.foreach { r =>
      if (r.isNullAt(2)) // the short-series guard: under 4 complete blocks
        assert(r.getLong(1) < 4L, s"k=${r.getInt(0)} null without cause")
      else {
        val vr = r.getLong(2)
        // iid synthetic revenue: VR must sit in a generous unity band
        assert(vr > 500000L && vr < 2000000L, s"k=${r.getInt(0)} vr=$vr")
      }
    }
    assert(!rows.head.isNullAt(2), "k=2 must resolve even on the small corpus")
  }

  test("overdispersion: VMR replay and verdict thresholds") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts"))).count()
      .collect().map(r => r.getString(0) -> r.getLong(2))
    val got = Temporal.overdispersion(spark, dir).collect()
    got.foreach { r =>
      val xs = daily.filter(_._1 == r.getString(0)).map(x => BigInt(x._2))
      val (n, s, s2) = (BigInt(xs.length), xs.sum, xs.map(x => x * x).sum)
      val vmr = ((n * s2 - s * s) * 1000000) / ((n - 1) * s)
      assert(r.getLong(r.fieldIndex("n")) == n.toLong)
      assert(r.getLong(r.fieldIndex("vmr_micro")) == vmr.toLong, r.getString(0))
      val v = r.getString(r.fieldIndex("verdict"))
      if (vmr > 1200000) assert(v == "overdispersed")
      else if (vmr < 800000) assert(v == "underdispersed")
      else assert(v == "poisson-ish")
    }
  }

  test("lexicalRichness: hapax never exceeds types, types never exceed tokens") {
    val rows = TextAnalysis.lexicalRichness(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("n_hapax") <= g("n_types") && g("n_types") <= g("n_tokens"))
      assert(g("ttr_bp") == g("n_types") * 10000 / g("n_tokens"))
      assert(g("hapax_bp") == g("n_hapax") * 10000 / g("n_types"))
    }
  }

  test("qte matches a naive per-arm interpolated-quantile replay") {
    import org.apache.spark.sql.functions._
    val vals = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .selectExpr("CAST(user_id AS STRING) AS u", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (Sketches.hash56Jvm(r.getString(0)) % 2, r.getLong(1)))
    def quant(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val pos = p * (s.length - 1)
      val lo = s(pos.toInt).toDouble
      val hi = s(math.min(s.length - 1, pos.toInt + 1)).toDouble
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val byArm = vals.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = Events.qte(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    Events.QteFractions.foreach { case (n, f) =>
      val (c, t) = (quant(byArm(0L), f), quant(byArm(1L), f))
      assert(got(n) == ((c, t, t - c)), s"$n: ${got(n)} vs ($c, $t)")
    }
  }

  test("debounce: census conserves events; drops only shadowed repeats") {
    import org.apache.spark.sql.functions._
    val rows = Events.debounce(spark, dir).collect()
    val total = graft.Tables.events(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == total, "event conservation")
    rows.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("n_dropped") < g("n_events"),
        "every (user,type) stream keeps at least its first event")
      assert(g("drop_bp") == g("n_dropped") * 10000 / g("n_events"))
    }
    // naive replay on one type: recompute drops in plain Scala
    val et = rows.head.getString(0)
    val evs = graft.Tables.events(spark, dir)
      .filter(col("event_type") === et)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dropped = evs.groupBy(_._1).values.map { g =>
      val sorted = g.sortBy(r => (r._3, r._2))
      sorted.zip(sorted.drop(1)).count { case (a, b) => b._3 - a._3 <= 60000000L }
    }.sum
    assert(rows.head.getLong(2) == dropped, s"type $et naive drop replay")
  }

  test("xyzClassification: classes partition parts; shares sum to ~10000") {
    val rows = Relational.xyzClassification(spark, dir).collect()
    val classes = rows.map(r => Option(r.getString(0))).toSet
    assert(classes.subsetOf(Set(Some("X"), Some("Y"), Some("Z"), None)))
    val share = rows.map(_.getLong(3)).sum
    assert(share >= 10000 - rows.length && share <= 10000, s"shares $share")
    import org.apache.spark.sql.functions._
    val nParts = graft.Tables.lineitem(spark, dir)
      .select(countDistinct("l_partkey")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == nParts, "part conservation")
  }

  test("basketTriples: support is anti-monotone over the itemset lattice") {
    import org.apache.spark.sql.functions._
    // sf0.01: the sf0.001 baskets have no support-2 triples at all
    val sf = "/root/testdata/sf0.01"
    val rows = Relational.basketTriples(spark, sf).collect()
    assert(rows.nonEmpty)
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val wanted = rows.flatMap(r =>
      Seq((r.getLong(0), r.getLong(1)), (r.getLong(0), r.getLong(2)),
        (r.getLong(1), r.getLong(2)))).toSet
    val pairCounts = items.selectExpr("ok", "pk AS a")
      .join(items.selectExpr("ok AS ok2", "pk AS b"),
        col("ok") === col("ok2") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter { case (k, _) => wanted(k) }
    rows.foreach { r =>
      val (p1, p2, p3, sup) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p1 < p2 && p2 < p3)
      assert(sup >= Relational.TripleMinSup)
      Seq((p1, p2), (p1, p3), (p2, p3)).foreach { pr =>
        assert(pairCounts(pr) >= sup, s"pair $pr under triple ($p1,$p2,$p3)")
      }
    }
  }

  test("conformal: splits partition each series; the band is a real residual") {
    import org.apache.spark.sql.functions._
    val rows = Temporal.conformal(spark, dir).collect()
    assert(rows.length == 5) // priority domain
    val days = graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("pri"), to_date(col("o_orderdate")))
      .count().groupBy("pri").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("n_train") + g("n_cal") + g("n_test") == days(r.getString(0)),
        s"${r.getString(0)} split partition")
      assert(g("q90_resid_cents") >= 0L)
      assert(g("coverage_bp") >= 0L && g("coverage_bp") <= 10000L)
      // nominal 90%: small held-out sets wander, but not collapse
      assert(g("coverage_bp") >= 6000L, s"${r.getString(0)} coverage")
    }
  }

  test("filePlanner matches an exact integer byte-model replay") {
    import org.apache.spark.sql.functions._
    val truth = graft.Tables.lineitem(spark, dir)
      .select(year(col("l_shipdate")).as("yr"),
        expr("8 * 8 + length(l_returnflag) + length(l_linestatus)").as("rb"))
      .groupBy("yr").agg(count(lit(1)).as("n"), sum("rb").as("b"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Layout.filePlanner(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSet == truth.keySet)
    val meanBytes = truth.values.map(_._2).sum / truth.size
    rows.foreach { r =>
      val (n, b) = truth(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == b)
      assert(r.getLong(3) == b / n)
      assert(r.getLong(4) == (b + Layout.PlannerTargetBytes - 1) / Layout.PlannerTargetBytes)
      assert(r.getLong(5) == b * 10000 / meanBytes)
    }
  }

  test("slopeInfluence: LOO slopes match an exact BigInt refit replay") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .orderBy("d").collect().map(r => (r.getDate(0), r.getLong(1)))
    val d0 = daily.head._1.toLocalDate
    val xy = daily.map { case (d, y) =>
      (BigInt(java.time.temporal.ChronoUnit.DAYS.between(d0, d.toLocalDate)), BigInt(y))
    }
    def slope(pts: Seq[(BigInt, BigInt)]): Option[BigInt] = {
      val n = BigInt(pts.length)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
      val den = n * sxx - sx * sx
      if (den == 0) None else Some((n * sxy - sx * sy) * 1000000 / den)
    }
    val full = slope(xy.toSeq).get
    val got = Temporal.slopeInfluence(spark, dir).collect()
    assert(got.length == Temporal.InfluenceTopK)
    got.foreach { r =>
      val x = BigInt(r.getLong(r.fieldIndex("x")))
      assert(r.getLong(r.fieldIndex("slope_full_micro")) == full.toLong)
      val loo = slope(xy.toSeq.filterNot(_._1 == x)).get
      assert(r.getLong(r.fieldIndex("slope_loo_micro")) == loo.toLong,
        s"day ${r.get(0)}")
      assert(r.getLong(r.fieldIndex("influence_micro")) == (loo - full).toLong)
    }
  }

  test("alsoBought: per-anchor leaderboards are strict and bounded") {
    val rows = Relational.alsoBought(spark, dir).collect()
    val byPart = rows.groupBy(_.getLong(0))
    assert(byPart.size <= Relational.AlsoBoughtParts && byPart.nonEmpty)
    byPart.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      assert(sorted.length <= Relational.AlsoBoughtK)
      sorted.sliding(2).foreach {
        case Array(p, q) =>
          assert(p.getLong(4) > q.getLong(4) ||
            (p.getLong(4) == q.getLong(4) && p.getLong(3) < q.getLong(3)))
        case _ => ()
      }
      val tot = sorted.head.getLong(1)
      assert(sorted.forall(r => r.getLong(4) <= tot && r.getLong(1) == tot))
      assert(sorted.forall(r => r.getLong(3) != r.getLong(0)),
        "an anchor never recommends itself")
    }
  }

  test("binSeg finds planted level shifts at the exact indexes") {
    // two planted shifts: 10→50 after index 4, 50→20 after index 8
    val xs = Seq[Long](10, 10, 10, 10, 50, 50, 50, 50, 20, 20, 20, 20)
    val got = Temporal.binSeg(xs).map(t => t._1 -> t._2).toMap
    // global split lands on one of the two true breaks
    assert(got("global") == 4 || got("global") == 8, s"$got")
    // each recursion finds the remaining break
    if (got("global") == 4) assert(got("right") == 8 - 4 + 4, s"$got")
    else assert(got("left") == 4, s"$got")
    // constant series: max |n·S_k − k·S_n| = 0 for every k → tie-break
    // picks k = 1 everywhere it can split
    val const = Temporal.binSeg(Seq.fill(8)(7L)).map(t => t._1 -> t._2).toMap
    assert(const("global") == 1)
    // short series: no split at all below CpMinSeg
    assert(Temporal.binSeg(Seq(1L, 2L, 3L)).isEmpty)
  }

  test("funnelWilson: interval brackets the rate, stays honest at p=1") {
    val rows = Events.funnelWilson(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (c, n) = (r.getLong(1), r.getLong(2))
      val (rate, lo, hi) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo <= rate && rate <= hi, s"${r.getString(0)}: $lo <= $rate <= $hi")
      assert(lo >= 0 && hi <= 10000)
      // identical pinned-literal double replay
      val p = c.toDouble / n
      def w(s: Int) = math.round(
        ((p + 3.841459 / (2 * n) + s * 1.959964 * math.sqrt(
          p * (1 - p) / n + 3.841459 / (4 * n.toDouble * n)))
          / (1 + 3.841459 / n)) * 10000)
      assert(lo == w(-1) && hi == w(1), s"${r.getString(0)} replay")
      // the whole point vs Wald: a p̂=1 step still confesses uncertainty
      if (c == n) assert(lo < 10000 && hi == 10000)
    }
  }

  test("modularity: degree identity, bounded index, exact contribution replay") {
    import org.apache.spark.sql.functions._
    val rows = Graph.modularity(spark, dir).collect()
    assert(rows.nonEmpty)
    // recompute m exactly as the operator derives it
    val l = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val m = l.select(col("o"), col("p").as("a"))
      .join(l.select(col("o"), col("p").as("b")), "o")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= Graph.KcoreMinW).count()
    val q = rows.head.getLong(rows.head.fieldIndex("q_micro"))
    assert(q >= -1000000L && q <= 1000000L)
    rows.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      // every intra edge adds 2 to the community's degree sum
      assert(g("d_c") >= 2 * g("e_c"), s"community ${r.get(0)}")
      assert(g("q_micro") == q)
      val contrib = ((BigInt(4) * m * g("e_c") - BigInt(g("d_c")) * g("d_c"))
        * 1000000) / (BigInt(4) * m * m)
      assert(g("contrib_micro") == contrib.toLong, s"community ${r.get(0)} contrib")
    }
  }

  test("seqPatterns matches a naive sessionized eventually-follows replay") {
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // naive replay: sessionize per user by the 30-min gap, then per
    // session check every ordered type pair via first(a) < last(b)
    val bySession = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var sid = 0L; var prev = Long.MinValue
      sorted.map { r =>
        if (prev == Long.MinValue || r._3 - prev > 1800000000L) sid += 1
        prev = r._3
        ((u, sid), (r._4, r._3))
      }
    }.groupBy(_._1).values.toSeq
    val nSessions = bySession.size
    val expected = scala.collection.mutable.Map.empty[(String, String), Long]
    bySession.foreach { s =>
      val first = s.map(_._2).groupBy(_._1).view.mapValues(_.map(_._2).min)
      val last = s.map(_._2).groupBy(_._1).view.mapValues(_.map(_._2).max)
      for (a <- first.keys; b <- last.keys if a != b && first(a) < last(b))
        expected((a, b)) = expected.getOrElse((a, b), 0L) + 1
    }
    val got = Events.seqPatterns(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, n) =>
      assert(got(k) == ((n, n * 10000 / nSessions)), s"$k")
    }
  }

  test("removalEffect: removing any channel never raises conversion; base is shared") {
    val rows = Events.removalEffect(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Events.RemovalStates.filterNot(_ == "purchase").sorted)
    val base = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == base, "all rows share the same base conversion")
      val removed = r.getLong(2)
      assert(removed <= base, s"${r.getString(0)}: removal cannot raise conversion")
      assert(r.getLong(3) == (base - removed) * 10000L / base)
    }
    assert(base > 0L, "the gate corpus must convert")
  }

  test("zipfSlope matches a naive top-k OLS replay") {
    import org.apache.spark.sql.functions._
    val counts = graft.Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy { case (w, n) => (-n, w) }.take(TextAnalysis.ZipfTopK)
    val xy = top.zipWithIndex.map { case ((_, n), i) =>
      (BigInt(math.round(math.log(i + 1.0) * 1e6)),
        BigInt(math.round(math.log(n.toDouble) * 1e6)))
    }
    val k = BigInt(xy.length)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum; val sxx = xy.map(p => p._1 * p._1).sum
    val den = k * sxx - sx * sx
    val slope = ((k * sxy - sx * sy) * 1000000) / den
    val icept = (sy * sxx - sx * sxy) / den
    val got = TextAnalysis.zipfSlope(spark, dir).collect().head
    assert(got.getLong(0) == k.toLong)
    assert(got.getLong(1) == slope.toLong, s"slope ${got.getLong(1)} vs $slope")
    assert(got.getLong(2) == icept.toLong)
  }

  test("attributionDecay halving weights and boundary shares on the gate frame") {
    val rows = Events.attributionDecay(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_touch"))
      val wt = r.getLong(r.fieldIndex("w_total_units"))
      val fb = r.getLong(r.fieldIndex("first_share_bp"))
      val lb = r.getLong(r.fieldIndex("last_share_bp"))
      assert(n >= 1 && wt >= 1, s"n=$n wt=$wt")
      // every weight is a power of two in [1, 1024]; totals bounded
      assert(wt <= 1024 * n, s"wt=$wt n=$n")
      assert(wt >= n, "min weight unit is 1")
      // the most recent click can never be out-credited by the oldest
      assert(lb >= fb, s"decay must favor recency: first=$fb last=$lb")
      assert(fb >= 0 && lb <= 10000)
      if (n == 1) assert(fb == 10000 && lb == 10000)
    }
  }

  test("attributionMulti is a pure window plan — no self-join anywhere") {
    val plan = Events.attributionMulti(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"attribution must not join:\n$plan")
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
  }

  test("cusumShift matches the naive recursive CUSUM replay") {
    val got = Temporal.cusumShift(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(3), r.getInt(4))).toMap
    val daily = graft.Tables.events(spark, dir)
      .selectExpr("event_type AS et", "CAST(ts AS DATE) AS d")
      .groupBy("et", "d").count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val series = rows.sortBy(_._2).map(x => (x._2, x._3))
      val mu = series.map(_._2).sum * 1000L / series.length
      var s = 0L
      series.foreach { case (d, x) =>
        s = math.max(0L, s + x * 1000L - mu)
        val (cusum, alarm) = got((et, d))
        assert(cusum == s, s"$et $d: got $cusum want $s")
        assert(alarm == (if (s > 5L * mu) 1 else 0), s"$et $d alarm")
      }
    }
    assert(got.size == daily.length)
  }

  test("ewmaSmooth matches the naive dyadic-weight replay") {
    val got = Temporal.ewmaSmooth(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(3)).toMap
    val daily = graft.Tables.orders(spark, dir)
      .selectExpr("o_orderpriority AS pri", "CAST(o_orderdate AS DATE) AS d",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS c")
      .groupBy("pri", "d").sum("c").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (pri, rows) =>
      val series = rows.sortBy(_._2)
      series.indices.foreach { i =>
        val lags = (0 until Temporal.EwmaLags).flatMap { j =>
          if (i - j >= 0) Some((1L << (Temporal.EwmaLags - 1 - j), series(i - j)._3))
          else None
        }
        val want = lags.map { case (w, v) => w * v }.sum * 1000L / lags.map(_._1).sum
        assert(got((pri, series(i)._2)) == want, s"$pri ${series(i)._2}")
      }
    }
  }

  test("EWMA and CUSUM each collapse into one Window node") {
    def windows(plan: String): Int =
      plan.linesIterator.count(_.contains("Window ["))
    val ewma = Temporal.ewmaSmooth(spark, dir)
      .queryExecution.executedPlan.toString
    assert(windows(ewma) == 1, s"8 lags must share one Window node:\n$ewma")
    // CUSUM's running min consumes the prefix sum, so the two Window
    // nodes are a dependent chain — the scale invariant is that no
    // exchange sits between them (they share the et partitioning)
    val cusum = Temporal.cusumShift(spark, dir)
      .queryExecution.executedPlan.toString
    val lines = cusum.linesIterator.toVector
    val wIdx = lines.zipWithIndex.filter(_._1.contains("Window [")).map(_._2)
    assert(wIdx.length == 2, s"expected the chained pair of Window nodes:\n$cusum")
    assert(!lines.slice(wIdx.min + 1, wIdx.max).exists(_.contains("Exchange")),
      s"prefix sum and running min must share one exchange:\n$cusum")
  }

  test("markovTransitions probabilities are consistent with the counts") {
    val rows = Events.markovTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ts) =>
      val tot = ts.map(_._3).sum
      ts.foreach { case (f, t, n, p) =>
        assert(p == n * 1000000L / tot, s"$f->$t")
      }
      val pSum = ts.map(_._4).sum
      assert(pSum <= 1000000L && pSum > 1000000L - ts.length,
        s"per-from probabilities must sum to 1e6 minus truncation dust, got $pSum")
    }
  }

  test("vocabGrowth is monotone and ends at the full vocabulary") {
    val rows = TextAnalysis.vocabGrowth(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.map(_._1).toSeq == TextAnalysis.VocabCutsPct)
    assert(rows.sliding(2).forall(p => p(0)._2 <= p(1)._2), "monotone")
    val total = graft.Tables.documents(spark, dir)
      .selectExpr("explode(split(trim(text), '\\\\s+')) AS term")
      .select("term").distinct().count()
    assert(rows.last._2 == total, s"100% cut must equal |vocabulary| $total")
  }

  test("mixShift shares sum to 10000 bp minus truncation dust") {
    val rows = Relational.mixShift(spark, dir).collect()
    assert(rows.nonEmpty)
    val s1 = rows.map(_.getLong(3)).sum
    val s2 = rows.map(_.getLong(4)).sum
    assert(s1 > 10000L - rows.length && s1 <= 10000L, s"share1 sum $s1")
    assert(s2 > 10000L - rows.length && s2 <= 10000L, s"share2 sum $s2")
    assert(rows.map(_.getLong(5)).sum == s2 - s1, "delta decomposes")
  }

  test("funnelLatency quantiles are ordered within min/max") {
    val r = Events.funnelLatency(spark, dir).head()
    assert(r.getLong(0) > 0, "test data must convert someone")
    val (mn, mx) = (r.getLong(1), r.getLong(2))
    val (p50, p90) = (r.getDouble(3), r.getDouble(4))
    assert(mn <= p50 && p50 <= p90 && p90 <= mx, s"$mn $p50 $p90 $mx")
  }

  test("acfOf recovers a pure weekly period: acf(7) = 1, off-lags < 1") {
    val spark2 = spark
    import spark2.implicits._
    // 70 days of an exact period-7 sawtooth (plus a trend-free base):
    // lag-7 pairs are identical → Pearson r = 1; other lags mix phases
    val daily = (0 until 70).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        1000L + (i % 7) * 37L)
    }.toDF("d", "cents")
    val rows = Temporal.acfOf(daily).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(rows(7) == 1.0, s"lag-7 of a period-7 series: ${rows(7)}")
    (1 to 6).foreach(l => assert(rows(l) < 1.0, s"lag $l"))
    assert(rows.size == Temporal.AcfMaxLag)
  }

  test("anomalyDow integer 2-sigma test agrees with the fp z-score") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val base = java.time.LocalDate.of(2024, 1, 1)
    val series = (0 until 140).map { i =>
      val spike = if (i == 33 || i == 94) 4000L else 0L
      (java.sql.Date.valueOf(base.plusDays(i)), 1000L + rnd.nextInt(200) + spike)
    }
    val got = Temporal.anomalyDowOf(series.toDF("d", "x")).collect()
      .map(r => r.getDate(0).toString).toSet
    // naive fp replay: per-dow population mean/var, |x-mu| > 2*sigma
    val byDow = series.groupBy(t => t._1.toLocalDate.getDayOfWeek)
    val expect = series.filter { case (d, x) =>
      val g = byDow(d.toLocalDate.getDayOfWeek).map(_._2.toDouble)
      val mu = g.sum / g.size
      val v = g.map(e => (e - mu) * (e - mu)).sum / g.size
      (x - mu) * (x - mu) > 4 * v
    }.map(_._1.toString).toSet
    assert(got == expect, s"got $got expect $expect")
    assert(got.contains("2024-02-03") && got.contains("2024-04-04"),
      "both planted spikes must be flagged")
  }

  test("burstinessOf: constant series has Fano 0, a bursty one exceeds 1e6") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    def day(i: Int) = java.sql.Date.valueOf(base.plusDays(i))
    val daily =
      (0 until 30).map(i => ("flat", day(i), 5L)) ++
        (0 until 30).map(i => ("bursty", day(i), if (i % 10 == 0) 91L else 1L))
    val rows = Temporal.burstinessOf(daily.toDF("et", "d", "c")).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rows("flat")._1 == 0L, "constant daily counts: zero variance")
    assert(rows("flat")._2 == 10000L, "peak equals mean")
    assert(rows("bursty")._1 > 1000000L, "super-Poisson burst train")
    assert(rows("bursty")._2 > 80000L, "peak is ~9x the mean")
  }

  test("waterfillOf is max-min fair and exhausts the budget up to floor dust") {
    val spark2 = spark
    import spark2.implicits._
    val caps = Seq(("tiny", 50L), ("small", 300L), ("mid", 1000L),
      ("big", 5000L), ("huge", 9000L)).toDF("source", "cap")
    val rows = TextAnalysis.waterfillOf(caps).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val budget = 15350L * TextAnalysis.WaterfillBudgetPct / 100L
    val spent = rows.map(_._3).sum
    assert(rows.forall { case (_, cap, alloc) => alloc <= cap }, "cap respected")
    assert(spent <= budget, s"spent $spent budget $budget")
    assert(budget - spent < rows.length, "floor dust only")
    val level = rows.map(_._3).max
    rows.foreach { case (s, cap, alloc) =>
      assert(alloc == math.min(cap, level), s"$s not waterfilled: $alloc")
    }
    assert(rows.count(_._3 == level) >= 2, "the big sources share one level")
  }

  test("aucOfScores: perfect separation = 1e6, ties-only = 500000, replay") {
    val spark2 = spark
    import spark2.implicits._
    def auc(rows: Seq[(Long, Long)]): Long =
      Relational.aucOfScores(rows.toDF("s", "pos")).head().getLong(2)
    // all positives above all negatives
    assert(auc(Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L))) == 1000000L)
    // inverted ranking
    assert(auc(Seq((1L, 1L), (2L, 1L), (10L, 0L), (11L, 0L))) == 0L)
    // everything tied: exactly chance
    assert(auc(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L))) == 500000L)
    // mixed case vs the naive pairwise count (ties = half)
    val mixed = Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L))
    val pos = mixed.filter(_._2 == 1L).map(_._1)
    val neg = mixed.filter(_._2 == 0L).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(auc(mixed) == u2 * 1000000L / (2L * pos.size * neg.size))
  }

  test("incrementalAggOf merge handles base-only and delta-only keys") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    def day(i: Int) = java.sql.Date.valueOf(base.plusDays(i))
    // cutoff at 90% of [0,100] = day 90: cust 1 spans both sides,
    // cust 2 is base-only, cust 3 appears ONLY in the delta window
    val o = Seq((1L, day(0), 100L), (1L, day(95), 10L),
      (2L, day(50), 200L), (3L, day(99), 77L), (1L, day(100), 5L))
      .toDF("o_custkey", "d", "cents")
    val got = Relational.incrementalAggOf(o).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 115L), (2L, 1L, 200L), (3L, 1L, 77L)),
      s"merge must equal full recompute: $got")
  }

  test("rollingDauOf equals the naive trailing-7-day distinct union") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.time.LocalDate.of(2024, 3, 1)
    def day(i: Int) = java.sql.Date.valueOf(base.plusDays(i))
    val rnd = new scala.util.Random(11)
    // 20 days of activity with a gap (days 8-9 silent) and churn
    val daily = (0 until 20).filterNot(i => i == 8 || i == 9).flatMap { i =>
      (0 until 5 + rnd.nextInt(5)).map(_ => (day(i), (rnd.nextInt(12) + 1).toLong))
    }.distinct
    val got = Events.rollingDauOf(daily.toDF("d", "user_id")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    val activeDays = daily.map(_._1.toLocalDate).distinct
    val expect = activeDays.sorted.map { d =>
      val dau = daily.count(_._1.toLocalDate == d).toLong
      val wau = daily.filter { case (dd, _) =>
        val off = java.time.temporal.ChronoUnit.DAYS.between(dd.toLocalDate, d)
        off >= 0 && off < Events.RollingDays
      }.map(_._2).distinct.size.toLong
      (d.toString, dau, wau, dau * 10000L / wau)
    }
    assert(got.toSeq == expect, s"got ${got.toSeq}\nexp $expect")
    assert(got.forall { case (_, dau, wau, _) => wau >= dau }, "WAU >= DAU")
  }

  test("psiDrift contributions are non-negative and counts conserve") {
    val rows = DataQuality.psiDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"(p-q)ln(p/q) >= 0: $r")
      assert(r.getLong(1) + r.getLong(2) > 0, "observed buckets only")
    }
    val nOrders = graft.Tables.orders(spark, dir).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == nOrders,
      "every order lands in exactly one (bucket, half)")
  }

  test("calibration deciles are equi-depth within interpolation slack") {
    val rows = Relational.calibration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0 to 9), "all ten deciles present")
    val ns = rows.map(_._2)
    val ideal = ns.sum / 10.0
    ns.foreach(n => assert(math.abs(n - ideal) <= ideal * 0.05 + 2,
      s"equi-depth: $n vs $ideal"))
    rows.foreach { case (_, n, bp) => assert(bp >= 0 && bp <= 10000 && n > 0) }
  }

  test("filterSweep is one scan + one Expand — never 8 pipeline passes") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "a b c", "en", 250L), (2L, "x x x", "fr", 10L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val qe = TextAnalysis.filterSweepDf(docs).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Expand"), s"cube must plan as Expand:\n$plan")
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"exactly one scan of the corpus:\n$plan")
    val rows = TextAnalysis.filterSweepDf(docs).collect()
    // flag tuples (1,1,1) and (0,0,0): every grouping set splits them
    // except the empty one -> 2 rows x 7 sets + 1 = 15
    assert(rows.length == 15, s"got ${rows.length}")
    val all = rows.find(r => r.getInt(0) == -1 && r.getInt(1) == -1 &&
      r.getInt(2) == -1).get
    assert(all.getLong(3) == 2L && all.getLong(4) == 6L)
    val strict = rows.find(r => r.getInt(0) == 1 && r.getInt(1) == 1 &&
      r.getInt(2) == 1).get
    assert(strict.getLong(3) == 1L && strict.getLong(4) == 3L)
  }
}
