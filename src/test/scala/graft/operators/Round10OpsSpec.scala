package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Hand-computed / replay cases for the round-10 additions: Ljung–Box,
  * Croston, Cramér's V, Cohen's d, t-closeness, simplified silhouette. */
class Round10OpsSpec extends SparkSpec {

  /** JVM replica of hash56 % 2 — picks user ids with known arms. */
  private def arm(uid: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(uid.toString.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 14)
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("croston: two-demand series replays the coupled EWMA by hand") {
    val spark2 = spark
    import spark2.implicits._
    // part 1: q=10 on day 0, q=20 on day 3 (gap 3)
    //   z1 = 10e6, p1 = 1e6
    //   z2 = (20e6 + 4·10e6)/5 = 12e6
    //   p2 = (3e6 + 4·1e6)/5 = 1.4e6
    //   rate = 12e6·1e6 DIV 1.4e6 = 8571428 (floor of 8571428.57…)
    // part 2: single demand q=7 → z=7e6, p=1e6, rate=7e6
    val daily = Seq(
      (1L, java.sql.Date.valueOf("2020-01-01"), 10L),
      (1L, java.sql.Date.valueOf("2020-01-04"), 20L),
      (2L, java.sql.Date.valueOf("2020-02-01"), 7L)).toDF("pk", "d", "q")
    val got = Temporal.crostonOf(daily).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got(1L) == ((2L, 12000000L, 1400000L, 8571428L)), got(1L).toString)
    assert(got(2L) == ((1L, 7000000L, 1000000L, 7000000L)), got(2L).toString)
  }

  test("ljungBox: Q replays exactly from the gate's own ACF integers") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic irregular series, long enough for all 7 lags
    val daily = Seq.tabulate(40)(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        ((i * 2654435761L) % 997 + 50 * i))).toDF("d", "cents")
    val rho = Temporal.acfOf(daily).collect()
      .map(r => r.getInt(0) -> math.round(r.getDouble(2) * 1e6)).toMap
    val n = 40L
    val s = rho.map { case (k, r) => (r * r) / (n - k) }.sum
    val wantQ = (n * (n + 2) * s) / 1000000L
    val row = Temporal.ljungBoxOf(daily).head()
    assert(row.getLong(0) == n && row.getLong(1) == 7L)
    assert(row.getLong(2) == wantQ, s"Q replay: ${row.getLong(2)} vs $wantQ")
    // verdict must agree with the pinned df=7 critical value
    val wantV = if (wantQ > 14067140L) "yes" else "no"
    assert(row.getString(3) == wantV)
  }

  test("cramersV: with a binary label every feature's v2 = chi2 DIV n") {
    val dir = "/root/testdata/sf0.001"
    val n = Tables.lineitem(spark, dir).count()
    val chi = DataQuality.chi2Select(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val v = DataQuality.cramersV(spark, dir).collect()
    assert(v.length == 4)
    v.foreach { r =>
      val f = r.getString(0)
      assert(r.getLong(3) == chi(f) / n,
        s"$f: v2 ${r.getLong(3)} != chi2/n ${chi(f) / n}")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
  }

  test("effectSize: hand-computed Cohen's d on 2+2 users") {
    val spark2 = spark
    import spark2.implicits._
    val as = (1L to 400L).filter(arm(_) == 0).take(2)
    val bs = (1L to 400L).filter(arm(_) == 1).take(2)
    // arm0 revenues 100, 200 cents; arm1 revenues 300, 500 cents
    val ev = Seq(
      (as(0), "purchase", 1.00), (as(1), "purchase", 2.00),
      (bs(0), "purchase", 3.00), (bs(1), "purchase", 5.00))
      .toDF("user_id", "event_type", "value")
    val r = Events.effectSizeDf(ev).head()
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert((r.getLong(2), r.getLong(3)) == ((300L, 800L)))
    assert(r.getLong(4) == 250000000L) // (400 − 150) cents in micro
    // pooled var = ((2·50000−300²)/2 + (2·340000−800²)/2)/2 = 12500
    // d = 250 / sqrt(12500) = 2.2360679…
    assert(r.getDouble(5) == 2.236068, r.toString)
  }

  test("tCloseness: hand-computed variational distances on a 6-row fixture") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tclose").toString
    // class (0,0): s1 s1 s2 s2; class (1,0): s1 s1 → global s1=4 s2=2 N=6
    // t(A) = 10⁴·(|2·6−4·4| + |2·6−2·4|) DIV (2·4·6) = 80000 DIV 48 = 1666
    // t(B) = 10⁴·(|2·6−4·2| + |0·6−2·2|) DIV (2·2·6) = 80000 DIV 24 = 3333
    Seq((0, 0.0, "s1"), (0, 0.0, "s1"), (0, 0.0, "s2"), (0, 0.0, "s2"),
      (1, 0.0, "s1"), (1, 0.0, "s1"))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val r = Pii.tCloseness(spark, tmp).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 3333L, 2499L, 1L)), r.toString)
  }

  test("ndcg: identical fully-relevant docs rank by id and score a perfect 1.0") {
    val spark2 = spark
    import spark2.implicits._
    // three identical docs carry all 3 query terms (rel 3, tied BM25 →
    // doc_id order), one irrelevant doc scores 0 — so the observed
    // ranking IS the ideal ranking and nDCG must be exactly 10⁶
    val docs = Seq(
      (1L, "join hash scan x"), (2L, "join hash scan x"),
      (3L, "join hash scan x"), (4L, "foo bar baz"))
      .toDF("doc_id", "text")
    val r = Similarity.ndcgEvalDf(docs).head()
    val w = Similarity.NdcgW.toMap
    val want = 7L * (w(1) + w(2) + w(3))
    assert(r.getInt(0) == Similarity.NdcgK)
    assert(r.getLong(1) == want && r.getLong(2) == want, r.toString)
    assert(r.getLong(3) == 1000000L)
    assert(r.getLong(4) == 1000000L) // first relevant at rank 1
    assert(r.getLong(5) == 3L * 10000 / Similarity.NdcgK)
  }

  test("mmr: an exact duplicate of the top hit is deferred behind a diverse doc") {
    val spark2 = spark
    import spark2.implicits._
    // d1 and d2 are twins (sim 10⁴, equal top score); d3 carries all
    // terms with one extra token (score ≈ 0.91 of max, sim 5000 to the
    // twins). Greedy step 2: twin mmr = (7·10⁴ − 3·10⁴)/10 = 4000 <
    // d3's (7·~9111 − 3·5000)/10 ≈ 4877 — diversity wins, order 1,3,2.
    val docs = Seq(
      (1L, "join hash scan x"), (2L, "join hash scan x"),
      (3L, "join hash scan a b")).toDF("doc_id", "text")
    val rows = Similarity.mmrRerankDf(docs).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L), rows.mkString(";"))
    // every emitted row satisfies the mmr identity on its own columns
    rows.foreach { r =>
      assert(r.getLong(4) == (7L * r.getLong(2) - 3L * r.getLong(3)) / 10L)
    }
    // the twin's similarity to d1 is exactly 1.0, d3's exactly 0.5
    assert(rows.find(_.getLong(1) == 2L).get.getLong(3) == 10000L)
    assert(rows.find(_.getLong(1) == 3L).get.getLong(3) == 5000L)
  }

  test("mmr: a corpus with zero BM25 matches yields an empty ranking, not an NPE") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text") // none of join/hash/scan present
    val out = Similarity.mmrRerankDf(docs)
    assert(out.columns.toSeq ==
      Seq("rank", "doc_id", "score_bp", "max_sim_bp", "mmr_bp"))
    assert(out.count() == 0L)
  }

  test("shapley: single-channel converter replays the factorial weights by hand") {
    val spark2 = spark
    import spark2.implicits._
    // u1 exposed to {click} and converts; u2 exposed to nothing, doesn't.
    // v({click}) = 10⁴, v(∅) = 0, every other subset empty → 0.
    // φ_click = 0!·3!·(10⁴−0) / 4! = 60000/24 = 2500
    // φ_other = 1!·2!·(v({click,other})−v({click})) / 4!
    //         = 2·(0−10⁴)/24 = −833 (truncation toward zero)
    val ev = Seq((1L, "click"), (1L, "purchase"), (2L, "noop"))
      .toDF("user_id", "event_type")
    val got = Events.shapleyDf(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("click" -> 2500L, "view" -> -833L,
      "signup" -> -833L, "error" -> -833L), got.toString)
  }

  test("srm: balanced split passes, a wiped-out arm trips the guardrail") {
    val spark2 = spark
    import spark2.implicits._
    val as = (1L to 2000L).filter(arm(_) == 0)
    val bs = (1L to 2000L).filter(arm(_) == 1)
    val even = (as.take(3) ++ bs.take(1)).map(u => (u, "view"))
      .toDF("user_id", "event_type")
    val r1 = Events.srmDf(even).head()
    // (3−1)²·10⁶ / 4 = 10⁶ < 3.84·10⁶ → no mismatch
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getBoolean(3)) ==
      ((3L, 1L, 1000000L, false)), r1.toString)
    val broken = as.take(100).map(u => (u, "view")).toDF("user_id", "event_type")
    val r2 = Events.srmDf(broken).head()
    assert(r2.getLong(2) == 100000000L && r2.getBoolean(3), r2.toString)
  }

  test("ipw: hand-computed stratified ATE with a degenerate stratum excluded") {
    val spark2 = spark
    import spark2.implicits._
    // stratum 0: treated (signup, converts), control (no purchase),
    //   control (converts) → term = 3·10⁴/1 − 3·10⁴/2 = 15000
    // stratum 1: one user with 25 signup events — all-treated, excluded
    val ev = (Seq((1L, "signup"), (1L, "purchase"), (2L, "view"),
      (3L, "view"), (3L, "purchase")) ++
      Seq.fill(25)((4L, "signup"))).toDF("user_id", "event_type")
    val r = Events.ipwDf(ev).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 1L, 5000L)), r.toString)
  }

  test("cochranArmitage: perfect dose-response replays z2 = 4 exactly") {
    val spark2 = spark
    import spark2.implicits._
    // w∈{0,1,2}, n=2 each, r=[0,1,2]: T = 6·5 − 3·6 = 12,
    // vw = 6·10 − 36 = 24 → z² = T²·N/(R(N−R)·vw) = 144·6/(9·24) = 4,
    // no truncation (12000/24 = 500 and 72000/9 = 8000 are both exact)
    val st = (Seq.fill(2)((0, 0)) ++ Seq((1, 0), (1, 1)) ++
      Seq.fill(2)((2, 1))).toDF("w", "y")
    val r = DataQuality.cochranArmitageDf(st).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4)) == ((3L, 6L, 3L, 4000000L, true)), r.toString)
  }

  test("cohensKappa: hand 2x2 census gives kappa = 1/3 and mcc2 = 1/9") {
    val spark2 = spark
    import spark2.implicits._
    val long = Seq.fill(61)("tok").mkString(" ")
    val short = "tok tok"
    // (r1=chars>300, r2=tokens>60): a=2, b=1, c=1, d=2
    val docs = Seq(
      (1L, long, 400L), (2L, long, 400L), (3L, short, 400L),
      (4L, long, 100L), (5L, short, 100L), (6L, short, 100L))
      .toDF("doc_id", "text", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("kappa").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataQuality.cohensKappa(spark, tmp).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 2L)), r.toString)
    // κ = (6·4 − 18)·10⁴ / (36 − 18) = 3333; mcc² = 9·10⁶/81 = 111111
    assert(r.getLong(4) == 3333L && r.getLong(5) == 111111L, r.toString)
  }

  test("decileLift: 10 balanced deciles, totals and lift identities hold") {
    val dir = "/root/testdata/sf0.001"
    val rows = Relational.decileLift(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val nCust = Tables.customer(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile deal: sizes differ by <= 1")
    val resp = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 10000 / r.getLong(1))
      assert(r.getLong(4) == r.getLong(2) * nCust * 10000 / (r.getLong(1) * resp))
    }
  }

  test("forecastAccuracy: MASE and sMAPE replay by hand on a linear ramp") {
    val spark2 = spark
    import spark2.implicits._
    // y = 10,20,…,90 over 9 consecutive days: naive-1 errors all 10
    // (n1=8, sae1=80); seasonal-naive-7 pairs (d0,d7),(d1,d8) err 70
    // (n7=2, sae7=140) → mase = (140·8·10³)/(2·80) = 7000 milli.
    // sMAPE rows: 1400000/90 = 15555, 1400000/110 = 12727 → mean 14141.
    val daily = (0 until 9).map(i =>
      ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        10L * (i + 1))).toDF("pri", "d", "cents")
    val r = Temporal.forecastAccuracyOf(daily).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("A", 2L, 8L, 7000L, 14141L)), r.toString)
  }

  test("yoyGrowth: calendar-aligned months, NULL where no prior-year twin") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("yoy").toString
    Seq(("2020-01-15", 1.00), ("2021-01-20", 1.50), ("2021-02-01", 0.80))
      .toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = Temporal.yoyGrowth(spark, tmp).collect()
      .map(r => r.getDate(0).toString ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map("2020-01-01" -> None,
      "2021-01-01" -> Some(5000L), "2021-02-01" -> None), got.toString)
  }

  test("kcenterCoreset: farthest-point sampling replays a geometric line exactly") {
    val spark2 = spark
    import spark2.implicits._
    // ids 1..10 at line positions 0,1,2,5,10,20,40,80,160,320 (dim 1,
    // zeros elsewhere). FPS from id 1: picks 320,160,80,40,20,10,5 with
    // squared radii 102400,25600,6400,1600,400,100,25 — halving by
    // construction, the non-increasing invariant made exact.
    val pos = Seq(0f, 1f, 2f, 5f, 10f, 20f, 40f, 80f, 160f, 320f)
    val tmp = java.nio.file.Files.createTempDirectory("kcenter").toString
    pos.zipWithIndex.map { case (p, i) =>
      ((i + 1).toLong, p +: Seq.fill(15)(0f)) }
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.kcenterCoreset(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1, 1L, 0.0), (2, 10L, 102400.0),
      (3, 9L, 25600.0), (4, 8L, 6400.0), (5, 7L, 1600.0),
      (6, 6L, 400.0), (7, 5L, 100.0), (8, 4L, 25.0)), rows.mkString(";"))
  }

  test("seasonalDecompose: exact weekly pattern recovers its own seasonal indices") {
    val spark2 = spark
    import spark2.implicits._
    // 14 consecutive days from a Monday, y = 70·(weekday+1) cents: every
    // full 7-window sums 1960, so dev7 = 7y − 1960 = 490(wd+1) − 1960
    // and seasonal_milli = dev7·1000/7 = (y − 280)·1000 — the true
    // deviation from the weekly mean, exactly. Identical group members
    // → the weekday means explain ALL variance: share = 10⁴.
    val daily = (0 until 14).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i) // 2024-01-01 = Monday
      ("A", java.sql.Date.valueOf(d), 70L * (d.getDayOfWeek.getValue))
    }.toDF("pri", "d", "cents")
    val rows = Temporal.seasonalDecomposeOf(daily).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val dow = r.getInt(1)
      assert(r.getLong(3) == (70L * (dow + 1) - 280L) * 1000L,
        s"dow $dow: ${r.getLong(3)}")
      assert(r.getLong(4) == 10000L, s"share: $r")
    }
    // interior days 3..10 hit Thursday twice, every other weekday once
    assert(rows.map(r => r.getInt(1) -> r.getLong(2)).toMap ==
      Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 2L, 4 -> 1L, 5 -> 1L, 6 -> 1L))
  }

  test("xmrChart: one excursion past the 2.66·mRbar limit, hand-exact ratio") {
    val spark2 = spark
    import spark2.implicits._
    // cents = 10,10,10,10,50 over 5 consecutive days: mean 18,
    // mR = 0,0,0,40 → mRbar 10, limit 26.6. Only y=50 violates
    // (|50−18| = 32 > 26.6), ratio = 32/26.6 = 1.2030 → 12030 bp.
    val tmp = java.nio.file.Files.createTempDirectory("xmr").toString
    (0 until 5).map(i => ("P", f"2024-01-${i + 1}%02d",
        if (i == 4) 0.50 else 0.10))
      .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Temporal.xmrChart(spark, tmp).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("P", 5L, 4L, 1L, 12030L)), r.toString)
  }

  test("bcubed: over-merged prediction replays the per-doc averages by hand") {
    val spark2 = spark
    import spark2.implicits._
    // truth {1,2} {3}; prediction merges all three into one cluster:
    // B³ precision = (2/3 + 2/3 + 1/3)/3 = 5/9 → 5555 bp (floor);
    // recall = 1 (every truth class fully inside the prediction);
    // f1 = 2·5555·10⁴/15555 = 7142
    val pred = Seq((1L, 100L, "a"), (2L, 100L, "a"), (3L, 100L, "b"))
      .toDF("doc_id", "p", "t")
    val r = Dedup.bcubedOf(pred).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 5555L, 10000L, 7142L)), r.toString)
  }

  test("silhouette: k rows, micro bounds, global mean consistent, full coverage") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ml.KMeansGraft.silhouette(spark, dir).collect()
    assert(rows.length == graft.ml.KMeansGraft.K)
    val nEmb = Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == nEmb, "every point scored once")
    val overall = rows.head.getLong(3)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000L)
      assert(r.getLong(3) == overall, "overall stamped identically")
    }
    // overall is the floor of the weighted mean of per-cluster floors +
    // their remainders — within 1 milli of the per-cluster weighted mean
    val wmean = rows.map(r => r.getLong(2) * r.getLong(1)).sum / nEmb
    assert(math.abs(overall - wmean) <= 1000,
      s"overall $overall vs weighted mean of floors $wmean")
  }
}
