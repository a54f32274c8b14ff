package graft.operators

import graft.SparkSpec

/** Invariant suite for the round-8 second-wave gates whose primary
  * verification is the DuckDB oracle — these specs pin the semantic
  * claims the oracle match alone doesn't state explicitly (conservation
  * laws, monotonicity, closure), on the sf0.001 gate data. */
class Round8OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("cohortLtv: cumulative is monotone per cohort and conserves revenue") {
    val rows = Events.cohortLtv(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      val cums = sorted.map(_.getLong(3))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a }, "monotone")
      assert(sorted.last.getLong(3) == sorted.map(_.getLong(2)).sum,
        "final cumulative = sum of per-age revenue")
      sorted.foreach(r =>
        assert(r.getLong(5) == r.getLong(3) / r.getLong(4), "ltv = cum/n"))
    }
  }

  test("activityCoverage: coverage within [0, 10000], gaps = sessions - 1") {
    val rows = Events.activityCoverage(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) - 1, "gaps")
      assert(r.getLong(3) <= r.getLong(4), "active <= span")
      if (!r.isNullAt(5)) {
        val bp = r.getLong(5)
        assert(bp >= 0 && bp <= 10000, s"coverage_bp $bp")
      }
    }
  }

  test("kAnonymity: census internally consistent with the raw class table") {
    val r = Pii.kAnonymity(spark, dir).head()
    val n = graft.Tables.customer(spark, dir).count()
    assert(r.getLong(0) == n, "row conservation")
    assert(r.getLong(2) >= 1 && r.getLong(5) >= 1, "min k, min l >= 1")
    assert(r.getLong(3) >= r.getLong(4), "rows below k >= classes below k")
    assert(r.getLong(1) >= r.getLong(4) && r.getLong(1) >= r.getLong(6))
  }

  test("forgetCascade: shares bounded; cascade counts nest") {
    val r = Pii.forgetCascade(spark, dir).head()
    val (nc, no, nl) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nc > 0 && no >= nc / 2, "tombstoned customers have orders")
    assert(nl >= no, "orders have >= 1 line each")
    assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000, "li share bp")
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000, "cents share bp")
  }

  test("abandonment: converted <= views, bp complements conversion") {
    val rows = Events.abandonment(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c <= v)
      assert(bp == (v - c) * 10000 / v, "bp replay")
    }
  }

  test("valueMigration: matrix conserves each half's customer population") {
    val rows = Relational.valueMigration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // every half-0 customer appears exactly once in the from margin
    val o = graft.Tables.orders(spark, dir)
    val total = rows.map(_._3).sum
    val nCust = o.select("o_custkey").distinct().count()
    assert(total >= nCust, "every customer appears (some in both halves)")
    // quartile labels bounded
    rows.foreach { case (f, t, n) =>
      assert(f >= 0 && f <= 4 && t >= 0 && t <= 4 && n > 0)
      assert(!(f == 0 && t == 0), "a customer absent from BOTH halves cannot exist")
    }
    // the four from-quartiles (excluding absent) are near-equal: ntile
    val fromCounts = rows.filter(_._1 > 0).groupBy(_._1)
      .map { case (_, rs) => rs.map(_._3).sum }
    assert(fromCounts.max - fromCounts.min <= 1, s"$fromCounts")
  }

  test("spearman/kendall: exact on monotone, anti-monotone, tied series") {
    import spark.implicits._
    def frame(ys: Seq[Long]) = ys.zipWithIndex
      .map { case (y, i) => (java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"),
        (i + 1) * 10L, y) }
      .toDF("d", "v1", "v2")
    // strictly increasing y: rho = tau = +1 exactly
    val up = Temporal.spearmanOf(frame(Seq(3, 7, 9, 12, 20))).head()
    assert(up.getLong(1) == 1L && up.getLong(2) == 1000000L)
    val kUp = Temporal.kendallOf(frame(Seq(3, 7, 9, 12, 20))).head()
    assert(kUp.getLong(1) == 10L && kUp.getLong(2) == 0L, "all concordant")
    assert(kUp.getLong(5) == 1L && kUp.getLong(6) == 1000000L)
    // strictly decreasing: sign flips, magnitude stays 1
    val dn = Temporal.spearmanOf(frame(Seq(20, 12, 9, 7, 3))).head()
    assert(dn.getLong(1) == -1L && dn.getLong(2) == 1000000L)
    val kDn = Temporal.kendallOf(frame(Seq(20, 12, 9, 7, 3))).head()
    assert(kDn.getLong(5) == -1L && kDn.getLong(6) == 1000000L)
    // constant y: zero y-variance -> NULL magnitude, not a crash
    val tied = Temporal.spearmanOf(frame(Seq(5, 5, 5, 5, 5))).head()
    assert(tied.isNullAt(2), "rho2 NULL when dy = 0")
    val kTied = Temporal.kendallOf(frame(Seq(5, 5, 5, 5, 5))).head()
    assert(kTied.getLong(4) == kTied.getLong(0) && kTied.isNullAt(6),
      "all pairs y-tied -> n2 = n0, tau2 NULL")
  }

  test("fulfillmentSla: percentiles ordered and inside [min, max]") {
    val rows = Temporal.fulfillmentSla(spark, dir).collect()
    assert(rows.length == 5, "five priorities")
    rows.foreach { r =>
      val (mn, mx, p50, p90) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(mn <= p50 && p50 <= p90 && p90 <= mx, r.toString)
    }
  }
}
