package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Hand-computed Kaplan–Meier curve with censoring. */
class SurvivalSpec extends SparkSpec {

  test("censored users stay in the risk set until the window ends") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // u1: view d0 -> purchase d2 (event, dur 2)
    // u2: view d0, never purchases -> censored at global max day d4
    // u3: view d1 -> purchase same day (event, dur 0)
    // u4: purchase without any view -> excluded
    val ev = Seq(
      (1L, "view", ts("2024-01-01 08:00:00")),
      (1L, "purchase", ts("2024-01-03 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "error", ts("2024-01-05 10:00:00")), // sets the horizon at d4
      (3L, "view", ts("2024-01-02 07:00:00")),
      (3L, "purchase", ts("2024-01-02 23:00:00")),
      (4L, "purchase", ts("2024-01-02 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.survivalKmDf(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // risk sets: d0 -> 3 users, d2 -> 2 (u3 left at d0), d4 censor only
    // S(0) = 1e6 * 2/3 = 666666; S(2) = 666666 * 1/2 = 333333
    assert(got == Seq((0, 3L, 1L, 666666L), (2, 2L, 1L, 333333L)))

    // Nelson–Aalen on the same fixture: h(0) = 1e6/3 = 333333,
    // h(2) = 1e6/2 = 500000, H = running sum — additive, not product
    val na = Events.nelsonAalenDf(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(na == Seq((0, 3L, 1L, 333333L, 333333L),
      (2, 2L, 1L, 500000L, 833333L)), s"$na")
  }

  test("rmst integrates the hand-traced KM step function exactly") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // same fixture as the KM test: events at dur 0 and 2, censor at 4
    val ev = Seq(
      (1L, "view", ts("2024-01-01 08:00:00")),
      (1L, "purchase", ts("2024-01-03 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "error", ts("2024-01-05 10:00:00")),
      (3L, "view", ts("2024-01-02 07:00:00")),
      (3L, "purchase", ts("2024-01-02 23:00:00")),
      (4L, "purchase", ts("2024-01-02 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = Events.rmstDf(ev).collect().head
    // S: 1e6 → 666666 (day 0) → 333333 (day 2), censor tail at day 4
    // ∫ = 1e6·0 + 666666·2 + 333333·2 = 1999998 micro-days
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 333333L, 1999998L)), s"$r")
  }

  test("hazardRatio matches a naive integer O/E replay; arms conserve events") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = (1L to 8L).flatMap { u =>
      val view = (u, "view", ts(s"2024-01-0${(u % 3) + 1} 08:00:00"))
      val buy =
        if (u % 4 == 0) Nil
        else Seq((u, "purchase",
          ts(s"2024-01-0${math.min(9, (u % 3) + 1 + u % 5)} 12:00:00")))
      view +: buy
    }.toDF("user_id", "event_type", "ts")
    val got = Events.hazardRatioDf(ev).collect().head
    // naive replay with the logRank fixture's durations
    val maxd = (1L to 8L).flatMap(u =>
      if (u % 4 == 0) Seq((u % 3) + 1) else Seq((u % 3) + 1, math.min(9, (u % 3) + 1 + u % 5)))
      .max
    val durs = (1L to 8L).map { u =>
      val v = (u % 3) + 1
      val arm = (Sketches.hash56Jvm(u.toString) % 2).toInt
      if (u % 4 == 0) (arm, maxd - v, 0L)
      else (arm, math.min(9, v + u % 5) - v, 1L)
    }
    var (o1, o2, e1, e2) = (BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    durs.map(_._2).distinct.sorted.foreach { t =>
      val atRisk = durs.filter(_._2 >= t)
      val n1 = BigInt(atRisk.count(_._1 == 0))
      val n2 = BigInt(atRisk.count(_._1 == 1))
      val d1 = BigInt(durs.count(x => x._1 == 0 && x._2 == t && x._3 == 1))
      val d2 = BigInt(durs.count(x => x._1 == 1 && x._2 == t && x._3 == 1))
      val d = d1 + d2
      if (d >= 1) {
        o1 += d1; o2 += d2
        e1 += (d * n1 * 1000000) / (n1 + n2)
        e2 += (d * n2 * 1000000) / (n1 + n2)
      }
    }
    assert(got.getLong(0) == o1.toLong && got.getLong(1) == o2.toLong)
    assert(got.getLong(2) == e1.toLong && got.getLong(3) == e2.toLong)
    val hr = if (e1 == 0 || o2 == 0) None
      else Some((o1 * e2 * 1000000 / (e1 * o2)).toLong)
    assert((if (got.isNullAt(4)) None else Some(got.getLong(4))) == hr)
    assert(o1 + o2 == BigInt(durs.count(_._3 == 1)), "event conservation")
  }

  test("logRank matches a naive integer replay over the same durations") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // 8 users: views on d0/d1, purchases at varying lags, two censored
    val ev = (1L to 8L).flatMap { u =>
      val view = (u, "view", ts(s"2024-01-0${(u % 3) + 1} 08:00:00"))
      val buy =
        if (u % 4 == 0) Nil // censored
        else Seq((u, "purchase",
          ts(s"2024-01-0${math.min(9, (u % 3) + 1 + u % 5)} 12:00:00")))
      view +: buy
    }.toDF("user_id", "event_type", "ts")
    val got = Events.logRankDf(ev).collect().head

    // naive replay: durations + arms in plain Scala, exact integer math
    val maxd = (1L to 8L).flatMap(u =>
      if (u % 4 == 0) Seq((u % 3) + 1) else Seq((u % 3) + 1, math.min(9, (u % 3) + 1 + u % 5)))
      .max
    val durs = (1L to 8L).map { u =>
      val v = (u % 3) + 1
      val arm = (Sketches.hash56Jvm(u.toString) % 2).toInt
      if (u % 4 == 0) (arm, maxd - v, 0L)
      else (arm, math.min(9, v + u % 5) - v, 1L)
    }
    val days = durs.map(_._2).distinct.sorted
    var (o1, e1, vm) = (BigInt(0), BigInt(0), BigInt(0))
    days.foreach { t =>
      val atRisk = durs.filter(_._2 >= t)
      val n1 = BigInt(atRisk.count(_._1 == 0))
      val n2 = BigInt(atRisk.count(_._1 == 1))
      val d1 = BigInt(durs.count(x => x._1 == 0 && x._2 == t && x._3 == 1))
      val d = d1 + BigInt(durs.count(x => x._1 == 1 && x._2 == t && x._3 == 1))
      val n = n1 + n2
      if (d >= 1) {
        o1 += d1
        e1 += (d * n1 * 1000000) / n
        if (n > 1) vm += (d * (n - d) * ((n1 * n2 * 1000000) / (n * n))) / (n - 1)
      }
    }
    val chi2 = if (vm == 0) None
      else Some(((o1 * 1000000 - e1) * (o1 * 1000000 - e1) / vm).toLong)
    assert(got.getLong(0) == o1.toLong)
    assert(got.getLong(1) == e1.toLong)
    assert(got.getLong(2) == vm.toLong)
    assert((if (got.isNullAt(3)) None else Some(got.getLong(3))) == chi2)
  }
}
