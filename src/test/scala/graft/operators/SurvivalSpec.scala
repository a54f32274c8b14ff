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
}
