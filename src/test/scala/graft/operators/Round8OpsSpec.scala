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
