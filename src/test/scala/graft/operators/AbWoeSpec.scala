package graft.operators

import graft.SparkSpec

/** Hand-computed cases for the A/B z²-test and WOE/IV encoder. */
class AbWoeSpec extends SparkSpec {

  /** JVM replica of hash56 % 2 — picks user ids with known arms. */
  private def arm(uid: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(uid.toString.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 14)
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("perfectly separated arms are significant; identical arms give z2 = 0") {
    val spark2 = spark
    import spark2.implicits._
    val as = (1L to 400L).filter(arm(_) == 0).take(50)
    val bs = (1L to 400L).filter(arm(_) == 1).take(50)
    // arm A converts (>=15 purchases), arm B never does
    val sep = (as.flatMap(u => Seq.fill(15)((u, "purchase"))) ++
      bs.map(u => (u, "view"))).toDF("user_id", "event_type")
    val r = Events.abTestDf(sep).collect()(0)
    assert(r.getAs[Long]("n_a") == 50 && r.getAs[Long]("c_a") == 50)
    assert(r.getAs[Long]("n_b") == 50 && r.getAs[Long]("c_b") == 0)
    // z^2 = N for total separation (p1=1, p2=0): 100e6 micro
    assert(r.getAs[Long]("z2_micro") == 100000000L)
    assert(r.getAs[Boolean]("significant"))

    val same = (as ++ bs).flatMap(u => Seq.fill(15)((u, "purchase")))
      .toDF("user_id", "event_type")
    val r2 = Events.abTestDf(same).collect()(0)
    assert(r2.getAs[Long]("z2_micro") == 0L && !r2.getAs[Boolean]("significant"))
  }

  test("woe/iv matches the hand computation on a 3:1 split") {
    val spark2 = spark
    import spark2.implicits._
    // X: pos 3 / neg 1, Y: pos 1 / neg 3 -> woe_X = ln 3, symmetric IV
    val df = (Seq.fill(3)(("X", 1L)) ++ Seq(("X", 0L)) ++
      Seq(("Y", 1L)) ++ Seq.fill(3)(("Y", 0L))).toDF("cat", "pos")
    val got = Relational.woeEncodeDf(df).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    val w = math.round(math.log(3.0) * 1000000) // 1098612
    assert(got == Seq(("X", w, 500000L * w / 1000000), ("Y", -w, 500000L * w / 1000000)))
  }

  test("mutual information: zero for independence, ln 2 for perfect dependence") {
    val spark2 = spark
    import spark2.implicits._
    val indep = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L)).toDF("x", "y")
    assert(Relational.mutualInfoDf(indep).collect()
      .forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))

    val dep = Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L)).toDF("x", "y")
    val rows = Relational.mutualInfoDf(dep).collect()
    val ln2 = math.round(math.log(2.0) * 1000000) // 693147
    assert(rows.forall(_.getLong(3) == ln2))
    assert(rows.map(_.getLong(4)).sum == 2 * (2 * ln2 / 4))
  }

  test("one-sided category yields null woe/iv, not infinity") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("Z", 1L), ("Z", 1L), ("W", 1L), ("W", 0L)).toDF("cat", "pos")
    val z = Relational.woeEncodeDf(df).collect().find(_.getString(0) == "Z").get
    assert(z.isNullAt(3) && z.isNullAt(4))
  }

  test("chi2: zero under independence, hand value for a 2x2, zero cells count") {
    val spark2 = spark
    import spark2.implicits._
    // indep: x ⊥ y, every cell obs == expected → chi2 exactly 0
    val indep = for (x <- Seq("a", "b"); y <- Seq(0, 1); _ <- 1 to 10)
      yield ("indep", x, y)
    // dep 2x2: [[30,10],[10,30]] → chi2 = n(ad-bc)^2/(r1 r2 c1 c2) = 80*640000/2560000 = 20
    val dep = Seq.fill(30)(("dep", "a", 0)) ++ Seq.fill(10)(("dep", "a", 1)) ++
      Seq.fill(10)(("dep", "b", 0)) ++ Seq.fill(30)(("dep", "b", 1))
    // zerocell: category c only ever sees y=0 — the absent (c,1) cell
    // must still contribute expected mass (full-grid requirement)
    val zc = Seq.fill(4)(("zc", "a", 0)) ++ Seq.fill(4)(("zc", "a", 1)) ++
      Seq.fill(4)(("zc", "c", 0))
    val st = (indep ++ dep ++ zc).toDF("feature", "x", "y")
    val got = DataQuality.chi2SelectDf(st).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(got("indep") == ((4L, 1L, 0L, "no")))
    // naive per-cell replay of (obs·n − row·col)²·1e6 // (n·row·col)
    val n = 80L
    val expChi = Seq((30L, 40L, 40L), (10L, 40L, 40L), (10L, 40L, 40L), (30L, 40L, 40L))
      .map { case (o, rx, cy) =>
        val num = BigInt(o) * n - BigInt(rx) * cy
        (num * num * 1000000 / (BigInt(n) * rx * cy)).toLong }.sum
    assert(got("dep") == ((4L, 1L, expChi, "yes")))
    assert(expChi == 20000000L, s"hand chi2 = 20.0 exactly, got $expChi")
    // zerocell: n=12, rows a=8 c=4, cols y0=8 y1=4; exp grid: a0 16/3,
    // a1 8/3, c0 8/3, c1 4/3; chi2 = Σ (obs-exp)²/exp = 3.0 exactly
    assert(got("zc")._1 == 4L, "absent (c,1) cell still gridded")
    assert(got("zc")._3 == 2999998L, s"floor-div cells of exact 3.0: ${got("zc")}")
  }

  test("chi2 verdict resolves at df=10 against the extended table and NULLs at df=31") {
    val spark2 = spark
    import spark2.implicits._
    // 11 categories × 2 labels, perfect association → df = 10, chi2 = n
    // (the r8-advice hole: the old df ≤ 8 table silently NULLed df=10 —
    // exactly disc_pct's shape)
    val df10 = for (x <- 0 until 11; _ <- 1 to 20) yield ("f10", x.toString, x % 2)
    // 32 categories → df = 31 > 30: out-of-table must be a VISIBLE NULL
    val df31 = for (x <- 0 until 32; _ <- 1 to 10) yield ("f31", x.toString, x % 2)
    val got = DataQuality.chi2SelectDf((df10 ++ df31).toDF("feature", "x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), Option(r.getString(4))))).toMap
    assert(got("f10") == ((10L, Some("yes"))),
      s"df=10 must resolve to a real verdict: ${got("f10")}")
    assert(got("f31") == ((31L, None)),
      s"df=31 is outside the pinned table and must be NULL: ${got("f31")}")
  }

  test("benfordGof: zero-observation digits still contribute expected mass") {
    val spark2 = spark
    import spark2.implicits._
    // only digits 1 and 2 ever observed — digits 3..9 exist ONLY through
    // the left-join from the expected table (the r8-advice fix); an
    // inner join would emit 2 cells and a wildly understated chi2
    val tmp = java.nio.file.Files.createTempDirectory("benford_skew").toString
    (Seq.fill(100)(1.23) ++ Seq.fill(50)(2.50)).toDF("o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = DataQuality.benfordGof(spark, tmp).head()
    val n = 150L
    val obs = Map(1 -> 100L, 2 -> 50L).withDefaultValue(0L)
    val expChi = DataQuality.BenfordBp.map { case (d, bp) =>
      val dev = BigInt(obs(d)) * 10000 - BigInt(n) * bp
      (dev * dev * 100 / (BigInt(n) * bp)).toLong
    }.sum
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == 9L, s"all 9 digit cells must be present: $r")
    assert(r.getLong(3) == expChi, s"chi2 replay mismatch: $r vs $expChi")
    assert(r.getString(4) == "yes", s"extreme skew must reject: $r")
  }

  test("mannWhitney: U and tied ranks replay by hand; separation is significant") {
    val spark2 = spark
    import spark2.implicits._
    // g1 = {1,2,3}, g0 = {2,4,5}: sorted 1,2,2,3,4,5 → doubled ranks
    // 2,5,5,8,10,12 (the tied 2s average rank 2.5). R1·2 = 2+5+8 = 15,
    // 2U = 15 − 3·4 = 3 → U = 1 (naive: pairs won by g1 = 1 full + ...)
    val xs = Seq((1L, 1L), (1L, 2L), (1L, 3L), (0L, 2L), (0L, 4L), (0L, 5L))
      .toDF("g1", "v")
    val r = Relational.mannWhitneyDf(xs).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 3L, 3L, 1L)), r.toString)
    assert(!r.getBoolean(5), "n=6 cannot reach significance")
    // full separation at n=200/side must be significant
    val sep = ((1L to 200L).map(v => (1L, v)) ++
      (1L to 200L).map(v => (0L, 1000L + v))).toDF("g1", "v")
    val r2 = Relational.mannWhitneyDf(sep).head()
    assert(r2.getLong(3) == 0L, "U = 0 under full separation")
    assert(r2.getBoolean(5), s"z2=${r2.getLong(4)}")
  }

  test("abc classification: boundary shares land in the right class") {
    val spark2 = spark
    import spark2.implicits._
    // revenues 50/30/15/5 → cum bp 5000, 8000, 9500, 10000:
    // both boundaries INCLUSIVE (<=8000 → A, <=9500 → B)
    val parts = Seq((1L, 50L), (2L, 30L), (3L, 15L), (4L, 5L))
      .toDF("pk", "cents")
    val got = Relational.abcOf(parts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("A", 2L, 8000L, 40L), ("B", 1L, 1500L, 15L),
      ("C", 1L, 500L, 5L)), s"$got")
  }

  test("kruskalWallis: pinned integer replay; separated groups significant") {
    val spark2 = spark
    import spark2.implicits._
    // no-tie hand case {1,2} {3,4} {5,6}: rank2 = 2,4,...,12; R2 = 6,14,22;
    // rr = R2²/(4n_g) DIV-truncated = 4,24,60 → t1 = 88;
    // H = 12e6·88/42 − 21e6 = 4142857 (pinned truncation), df 2 → 'no'
    val small = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("grp", "v")
    val r = Relational.kruskalWallisDf(small).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4)) == ((3L, 6L, 4142857L, 2L, "no")), r.toString)
    // three fully separated groups of 30 → H near its max, df 2 → 'yes'
    val sep = (1L to 90L).map(v =>
      (if (v <= 30) "a" else if (v <= 60) "b" else "c", v)).toDF("grp", "v")
    val r2 = Relational.kruskalWallisDf(sep).head()
    assert(r2.getString(4) == "yes", s"H=${r2.getLong(2)}")
    assert(r2.getLong(2) > 5991465L)
  }

  test("isotonic PAV: violators pool, monotone output, conforming buckets kept") {
    val spark2 = spark
    import spark2.implicits._
    // rates per bucket: 10%, 30%, 10% (equal n) → PAV pools the last two
    // into 20%: iso = [1000, 2000, 2000] bp; bucket 1 untouched
    def bucket(s: Long, pos: Int, n: Int) =
      (0 until n).map(i => (s, if (i < pos) 1L else 0L))
    val scored = (bucket(1, 1, 10) ++ bucket(2, 3, 10) ++ bucket(3, 1, 10))
      .toDF("s", "pos")
    val got = Relational.isotonicOfScores(scored).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 1000L, 1000L), (2L, 3000L, 2000L),
      (3L, 1000L, 2000L)), s"$got")
    // already-monotone input is a fixpoint
    val mono = (bucket(1, 1, 10) ++ bucket(2, 2, 10) ++ bucket(3, 5, 10))
      .toDF("s", "pos")
    val got2 = Relational.isotonicOfScores(mono).collect()
      .map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(got2.forall { case (r, i) => r == i }, s"$got2")
  }

  test("sprt: uplift / no-uplift / continue / degenerate-p0 verdicts") {
    val spark2 = spark
    import spark2.implicits._
    def arm(u: Long): Int = (Sketches.hash56Jvm(u.toString) % 2).toInt
    val users = (1L to 2000L).toSeq
    val (a, b) = users.partition(arm(_) == 0)
    def frame(convA: Seq[Long], convB: Seq[Long]) = {
      val conv = (convA ++ convB).toSet
      users.flatMap { u =>
        if (conv(u)) Seq.fill(15)((u, "purchase")) else Seq((u, "view"))
      }.toDF("user_id", "event_type")
    }
    def run(df: org.apache.spark.sql.DataFrame) = {
      val r = Events.sprtDf(df).head()
      (if (r.isNullAt(6)) null else r.getString(6), r)
    }
    // arm A 10% converts, arm B 30% → LLR far above ln 19
    val (v1, _) = run(frame(a.take(a.size / 10), b.take(3 * b.size / 10)))
    assert(v1 == "uplift", s"got $v1")
    // arm B converts nothing → LLR strongly negative
    val (v2, _) = run(frame(a.take(a.size / 10), Nil))
    assert(v2 == "no_uplift", s"got $v2")
    // B converting at ~baseline (LLR ≈ 0, inside the ±ln19 band) → continue
    val (v3, _) = run(frame(a.take(a.size / 10), b.take(105 * b.size / 1000)))
    assert(v3 == "continue", s"got $v3")
    // degenerate p0 = 0 → NULL verdict, not a crash or a fake verdict
    val (v4, r4) = run(frame(Nil, b.take(5)))
    assert(v4 == null && r4.isNullAt(5), s"got $v4 / $r4")
  }

  test("columnEntropy shape: uniform ≈ ln k, constant = 0 (via gate frame)") {
    // exercised through the real gate frame: entropy non-negative,
    // bounded by ln(n_distinct)+rounding, and the disc_pct column (most
    // categories) carries the most entropy on the testdata
    val df = DataQuality.columnEntropy(spark, "/root/testdata/sf0.001").collect()
    assert(df.nonEmpty)
    for (r <- df) {
      val (k, h) = (r.getLong(1), r.getLong(2))
      assert(h >= 0L, s"${r.getString(0)}: negative entropy")
      assert(h <= math.round(math.log(k.toDouble) * 1000000) + k,
        s"${r.getString(0)}: entropy above ln(k)")
    }
  }

  test("gini: 0 for equal values, 3/4 for one-holder-takes-all of 4") {
    val spark2 = spark
    import spark2.implicits._
    val x = (Seq.tabulate(5)(i => ("eq", 100L, i.toLong)) ++
      Seq(("one", 0L, 0L), ("one", 0L, 1L), ("one", 0L, 2L), ("one", 400L, 3L)))
      .toDF("seg", "cents", "o_orderkey")
    val got = Relational.giniDf(x).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("eq") == ((5L, 500L, 0L)), s"equal → gini 0: ${got("eq")}")
    // G = (2·(4·400) − 5·400) / (4·400) = 1200/1600 = 0.75
    assert(got("one") == ((4L, 400L, 750000L)), s"${got("one")}")
  }

  test("ksStat: max CDF gap in bp with smallest-bucket tie-break") {
    val spark2 = spark
    import spark2.implicits._
    // pos at s=1,1,2; neg at s=1,3,3,3 → devs: s1 |6666-2500|=4166,
    // s2 |10000-2500|=7500, s3 |10000-10000|=0 → KS 7500 at s=2
    val scored = Seq((1L, 1L), (1L, 1L), (2L, 1L), (1L, 0L), (3L, 0L),
      (3L, 0L), (3L, 0L)).toDF("s", "pos")
    val r = Relational.ksOfScores(scored).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 4L, 7500L, 2L)), r.toString)
    // tie case: two buckets at the same max dev → smallest bucket wins
    val tied = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L)).toDF("s", "pos")
    // devs: s1 |5000-0|=5000, s2 |5000-5000|=0, s3 |10000-5000|=5000, s4 0
    val r2 = Relational.ksOfScores(tied).head()
    assert((r2.getLong(2), r2.getLong(3)) == ((5000L, 1L)), r2.toString)
  }

  test("fellegiSunter: weights replay ln(m/u) micro; degenerate u is NULL") {
    val spark2 = spark
    import spark2.implicits._
    // one block, 4 records → 6 pairs. seg: A,A,B,B → 2/6 agree.
    // balk: all 7 → u=1 (degenerate, disagree weight NULL but never used,
    // agree weight ln(m/1)). sfx: w,x,y,z → 0/6 agree (u=0 degenerate:
    // agree weight NULL but never used; disagree ln((1-m)/1)).
    val c = Seq(
      (1L, 0L, "A", 7L, "w"), (2L, 0L, "A", 7L, "x"),
      (3L, 0L, "B", 7L, "y"), (4L, 0L, "B", 7L, "z"))
      .toDF("id", "blk", "seg", "balk", "sfx")
    val rows = Relational.fellegiSunterDf(c).collect()
    def micro(x: Double): Long = math.round(math.log(x) * 1000000)
    // patterns present: (1,1,0) ×2 and (0,1,0) ×4
    val byPat = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
      r).toMap
    val agreePat = byPat((1L, 1L, 0L))
    assert(agreePat.getLong(3) == 2L)
    assert(agreePat.getLong(4) == micro(0.95 * 6 / 2), "seg agree ln(m/u)")
    assert(agreePat.getLong(5) == micro(0.90 * 6 / 6), "bal agree, u=1")
    assert(agreePat.getLong(6) == micro((1 - 0.85) * 6 / 6), "sfx disagree, u=0")
    val disPat = byPat((0L, 1L, 0L))
    assert(disPat.getLong(3) == 4L)
    assert(disPat.getLong(4) == micro((1 - 0.95) * 6 / 4), "seg disagree")
    // score = exact integer sum of the micro weights
    assert(agreePat.getLong(7) ==
      agreePat.getLong(4) + agreePat.getLong(5) + agreePat.getLong(6))
  }
}
