package graft.operators

import graft.SparkSpec

/** Hand-computed fixtures for the round-8 curation operators:
  * substring-level dedup, temperature mixing, OOV rate, lagged
  * cross-correlation, and the PII-injection positive path. */
class CurationOpsSpec extends SparkSpec {

  test("substringDedup finds shared character windows across docs") {
    val spark2 = spark
    import spark2.implicits._
    // k=5, stride=2: doc0/doc1 share the "abcde" and "cdefg" windows;
    // doc2 is all-unique. Window count per len-10 doc = (10-5) DIV 2 + 1 = 3.
    val docs = Seq(
      ("srcA", 0L, "abcdefghij"),
      ("srcA", 1L, "zzabcdefgh"),
      ("srcB", 2L, "qrstuvwxyz")
    ).toDF("source", "doc_id", "text")
    val r = Dedup.substringDedupDf(docs, k = 5, stride = 2, minDocs = 2)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("srcA") == ((2L, 6L, 4L, 2L)),
      "srcA: 2 docs, 6 windows, 4 duplicated (abcde+cdefg in both), both hit")
    assert(r("srcB") == ((1L, 3L, 0L, 0L)))
  }

  test("substringDedup catches duplication that token segments miss") {
    val spark2 = spark
    import spark2.implicits._
    // The same 25-char run embedded at different word offsets: disjoint
    // token blocks disagree, overlapping char windows still collide.
    val run = "the quick brown fox jumps"
    val docs = Seq(
      ("s", 0L, s"AA BB $run CC"),
      ("s", 1L, s"XX $run YY ZZ")
    ).toDF("source", "doc_id", "text")
    val r = Dedup.substringDedupDf(docs, k = 25, stride = 1, minDocs = 2)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r("s") >= 2L, "stride-1 char windows must hit the shared run")
  }

  test("temperatureMix upweights small sources vs natural share") {
    val spark2 = spark
    import spark2.implicits._
    val caps = Seq(("srcA", 100L), ("srcB", 400L)).toDF("source", "n_tokens")
    val r = TextAnalysis.temperatureMixOf(caps).collect()
      .map(x => x.getString(0) -> ((x.getDouble(2), x.getDouble(3)))).toMap
    assert(r("srcA") == ((0.2, 0.333333)), "sqrt(100)/(10+20) = 1/3")
    assert(r("srcB") == ((0.8, 0.666667)))
    assert(r("srcA")._2 > r("srcA")._1, "small source upweighted")
    assert(r("srcB")._2 < r("srcB")._1, "large source downweighted")
  }

  test("oovRate against the corpus top-K vocabulary, ties on word") {
    val spark2 = spark
    import spark2.implicits._
    // counts: a=3 b=3 c=1 d=1 e=1; top-2 = {a, b} (c desc, word asc)
    val docs = Seq(
      ("srcA", "a a b c"),
      ("srcB", "a b b d e")
    ).toDF("source", "text")
    val r = TextAnalysis.oovRateDf(docs, vocabK = 2).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("srcA") == ((4L, 1L, 2500L)), "c is OOV: 1/4 = 2500bp")
    assert(r("srcB") == ((5L, 2L, 4000L)), "d,e are OOV: 2/5 = 4000bp")
  }

  test("crossCorr peaks at the constructed lead/lag offset") {
    val spark2 = spark
    import spark2.implicits._
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = java.sql.Date.valueOf(d0.toLocalDate.plusDays(i))
    val lead = (0 until 5).map(i => (day(i), (i + 1).toLong)).toDF("d", "c")
    // lag series = 2*lead shifted +2 days: perfect corr at lag_d = 2
    val lagS = (0 until 5).map(i => (day(i + 2), 2L * (i + 1))).toDF("d", "c")
    val r = Temporal.crossCorrOf(lead, lagS).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1),
        if (x.isNullAt(2)) Double.NaN else x.getDouble(2)))).toMap
    assert(r(2) == ((5L, 1.0)), "all 5 pairs align at lag 2, corr exactly 1")
    // lags with no aligned days contribute no row (the acfOf convention)
    assert(r.keys.min == -2 && r.keys.max == 6,
      "fixture alignment spans lag -2..6 only")
    assert(r.keys.forall(l => l >= -Temporal.XcorrMaxLag && l <= Temporal.XcorrMaxLag))
  }

  test("dedupRewrite drops repeated tiles, keeps order, zeroes empty docs") {
    val spark2 = spark
    import spark2.implicits._
    // segSize=2 tiles: doc0 = [shared]["u1 u2"], doc1 = [shared],
    // doc2 = ["v1 v2"]["v3"] (odd tail tile), all in one source
    val docs = Seq(
      ("s", 0L, "dup dup u1 u2"),
      ("s", 1L, "dup dup"),
      ("s", 2L, "v1 v2 v3")
    ).toDF("source", "doc_id", "text")
    val r = TextAnalysis.dedupRewriteDf(docs, segSize = 2, minDocs = 2)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).head
    // 3 docs, 2 modified (doc0+doc1 lose the shared tile),
    // words 4+2+3=9 before; after: doc0="u1 u2"(2), doc1=""(0), doc2=3
    assert(r == ((3L, 2L, 9L, 5L)), s"got $r")
  }

  test("phraseSearch counts overlapping occurrences and respects boundaries") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      ("s1", 0L, "a a a b"),        // "a a" overlaps: starts at 0 and 1
      ("s1", 1L, "b a a"),          // phrase at doc end
      ("s2", 2L, "a b a"),          // non-adjacent: no match
      ("s2", 3L, "x y z a a q")     // mid-doc
    ).toDF("source", "doc_id", "text")
    val r = Similarity.phraseSearchDf(docs, Seq("a", "a")).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("s1") == ((2L, 3L)), "doc0 has 2 overlapping starts, doc1 has 1")
    assert(r("s2") == ((1L, 1L)), "only doc3 matches; 'a b a' must not")
    val tri = Similarity.phraseSearchDf(docs, Seq("a", "a", "b")).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(tri == Map("s1" -> 1L), "3-gram only in doc0 at position 1")
  }

  test("rrfFusion fuses hand-computed BM25 and tf rankings exactly") {
    val spark2 = spark
    import spark2.implicits._
    // tf ranks (a+b counts): doc0=1 (8), doc1=2 (4), doc2=3 (2);
    // BM25 ranks: doc1=1 (has BOTH terms), doc0=2, doc2=3; doc3 matches
    // neither ranker and must be absent entirely
    val docs = Seq(
      (0L, "a a a a a a a a"),
      (1L, "a b b b"),
      (2L, "b b c c c"),
      (3L, "c c c c")
    ).toDF("doc_id", "text")
    val r = Similarity.rrfDf(docs, Seq("a", "b")).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // 10^6 DIV 61 = 16393, DIV 62 = 16129, DIV 63 = 15873
    assert(r(1) == ((0L, 32522L)), "doc0: tf#1 + bm25#2 = 16393+16129")
    assert(r(2) == ((1L, 32522L)), "doc1 ties doc0, doc_id breaks the tie")
    assert(r(3) == ((2L, 31746L)), "doc2: #3 in both = 2*15873")
    // depth N exceeds the matched set here, so BM25's zero-score tail
    // pads the candidate list: doc3 ranks 4th in BM25 only (score 0),
    // fusing to exactly one reciprocal term — and lands last
    assert(r(4) == ((3L, 15625L)), "doc3: bm25#4 only = 10^6 DIV 64")
  }

  test("holtLinear replays the coupled recurrence incl. negative trend") {
    val spark2 = spark
    import spark2.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // x = [100, 50, 50]: hand-replay of l/b at alpha=1/5, beta=1/10
    val daily = Seq(("p", day(0), 100L), ("p", day(1), 50L), ("p", day(2), 50L))
      .toDF("pri", "d", "cents")
    val r = Temporal.holtOf(daily).collect()
      .map(x => (x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r(0) == ((100000L, 0L, 100000L)), "init: level=x1, trend=0")
    assert(r(1) == ((90000L, -1000L, 89000L)),
      "l2=(50000+4*100000)/5, b2=(90000-100000)/10 — trend goes NEGATIVE")
    assert(r(2) == ((81200L, -1780L, 79420L)),
      "l3=(50000+4*89000)/5=81200, b3=(81200-90000-9000)/10=-1780")
  }

  test("holtWinters replays the seasonal ring across a full period") {
    val spark2 = spark
    import spark2.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // 10 days of a period-7 sawtooth — long enough that the ring wraps
    // and the t-7 seasonal re-enters the level recurrence at t=8,9,10
    val xs = Seq(100L, 50L, 80L, 120L, 60L, 90L, 110L, 100L, 50L, 80L)
    val daily = xs.zipWithIndex.map { case (x, i) => ("p", day(i), x) }
      .toDF("pri", "d", "cents")
    // naive scala replay of the pinned integer recurrences
    def idiv(a: Long, d: Long): Long = a / d // JVM / truncates toward zero
    var (l, b) = (0L, 0L)
    var ring = Vector.fill(7)(0L)
    val expect = xs.zipWithIndex.map { case (x, i) =>
      val xm = x * 1000
      if (i == 0) { l = xm; b = 0L }
      else {
        val sm = ring.head
        val l2 = idiv(xm - sm + 4 * (l + b), 5)
        val b2 = idiv(l2 - l + 9 * b, 10)
        val s2 = idiv(xm - l - b + 4 * sm, 5)
        l = l2; b = b2; ring = ring.tail :+ s2
      }
      (l, b, if (i == 0) 0L else ring.last, l + b + ring.head)
    }
    val got = Temporal.holtWintersOf(daily).collect()
      .map(x => (x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toSeq
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    // sanity: the ring actually wrapped (t=8's level saw s_1 ≠ 0)
    assert(expect(7)._3 != 0L || expect(1)._3 != 0L)
  }

  test("walkForward: exact linear series refits exactly; piecewise breaks it") {
    val spark2 = spark
    import spark2.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // y = 100 + 7x for 50 days → every fold: slope 7e6 micro, MAE 0
    val lin = (0 until 50).map(i => ("lin", day(i), 100L + 7L * i))
    // first fifth flat at 100, then jumps to 1000: fold-1 trains on the
    // flat part only (NO future leakage) → slope 0, MAE = 900 on test
    val brk = (0 until 50).map(i => ("brk", day(i), if (i < 10) 100L else 1000L))
    val got = Temporal.walkForwardOf((lin ++ brk).toDF("pri", "d", "cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (k <- 1L to 3L) {
      val (nTr, nTe, slope, mae) = got(("lin", k))
      assert(nTr == 10 * k && nTe == 10, s"fold $k sizes: $nTr/$nTe")
      assert(slope == 7000000L && mae == 0L, s"fold $k: slope=$slope mae=$mae")
    }
    val (_, _, s1, mae1) = got(("brk", 1L))
    assert(s1 == 0L && mae1 == 900L, s"leak check: slope=$s1 mae=$mae1")
  }

  test("mannKendall: increasing / tied / alternating hand-replays") {
    val spark2 = spark
    import spark2.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val daily = ((0 until 10).map(i => ("up", day(i), (i + 1).toLong)) ++
      (0 until 5).map(i => ("flat", day(i), 7L)) ++
      Seq(1L, 2L, 1L, 2L, 1L).zipWithIndex.map { case (x, i) => ("zig", day(i), x) })
      .toDF("et", "d", "x")
    val r = Temporal.mannKendallOf(daily).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        if (x.isNullAt(4)) -1L else x.getLong(4), x.getString(5)))).toMap
    assert(r("up") == ((10L, 45L, 2250L, 40500L, "increasing")),
      "all 45 pairs concordant; S^2*45000/var18 = 40500 >> 9604")
    assert(r("flat") == ((5L, 0L, 0L, -1L, "none")),
      "all-tied: var18 = 300-300 = 0, NULL score")
    assert(r("zig") == ((5L, 0L, 216L, 0L, "none")),
      "S=0; ties 3,2 give tie18 = 66+18, var18 = 300-84")
  }

  test("olsTrend recovers exact lines, positive and negative slope") {
    val spark2 = spark
    import spark2.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val daily = ((0 until 5).map(i => ("up", day(i), 100L + 7L * i)) ++
      (0 until 5).map(i => ("dn", day(i), 1000L - 3L * i)))
      .toDF("pri", "d", "cents")
    val r = Temporal.olsTrendOf(daily).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("up") == ((5L, 7000000L, 100L)), s"exact +7/day line: ${r("up")}")
    assert(r("dn") == ((5L, -3000000L, 1000L)), s"exact -3/day line: ${r("dn")}")
  }

  test("theilSen median slope shrugs off an outlier endpoint") {
    val spark2 = spark
    import spark2.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // x = [0,10,20,100]: 6 pairwise slopes sorted are
    // [10M,10M,10M,33333333,45M,80M]; lower median (rn 3 of 6) = 10M —
    // the day-3 outlier cannot move it (OLS slope would be ~31M)
    val daily = Seq(0L, 10L, 20L, 100L).zipWithIndex
      .map { case (x, i) => ("e", day(i), x) }.toDF("et", "d", "x")
    val r = Temporal.theilSenOf(daily).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((6L, 10000000L)), r.toString)
  }

  test("classBalance oversamples every class exactly to the majority") {
    val spark2 = spark
    import spark2.implicits._
    // classes: a=5 rows, b=2, c=1 → everyone balances to T=5
    val df = ((1L to 5L).map(i => (i, "a")) ++ Seq((10L, "b"), (11L, "b"), (20L, "c")))
      .toDF("vec_id", "label")
    val r = graft.ml.ModelSelection.classBalance(df, "label", "vec_id")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("a") == ((5L, 5L, 1L)), "majority class untouched")
    assert(r("b") == ((2L, 5L, 3L)), "2 rows -> copies 3+2")
    assert(r("c") == ((1L, 5L, 5L)), "1 row replicated 5x")
  }

  test("chunkOverlap: stride c-o windows, shortened tail, exact hash sum") {
    val spark2 = spark
    import spark2.implicits._
    // c=8, o=2 (stride 6): 20 tokens -> chunks [1..8][7..14][13..20];
    // 9 tokens -> [1..8][7..9] (tail shortened to 3); 5 tokens -> itself.
    val w20 = (1 to 20).map(i => s"w$i")
    val t9 = (1 to 9).map(i => s"t$i")
    val docs = Seq(
      ("s", 0L, w20.mkString(" ")),
      ("s", 1L, t9.mkString(" ")),
      ("s", 2L, "a b c d e")
    ).toDF("source", "doc_id", "text")
    val r = TextAnalysis.chunkOverlapDf(docs, c = 8, o = 2).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 3L, "n_docs")
    assert(row.getLong(2) == 6L, "n_chunks: 3 + 2 + 1")
    assert(row.getLong(3) == 34L, "total_tokens")
    assert(row.getLong(4) == 40L, "tok_emitted: 24 + 11 + 5")
    assert(row.getDouble(5) == math.rint(40.0 / 34.0 * 1e4) / 1e4)
    val expChunks = Seq(
      w20.slice(0, 8), w20.slice(6, 14), w20.slice(12, 20),
      t9.slice(0, 8), t9.slice(6, 9), Seq("a", "b", "c", "d", "e"))
    // the gate emits the decimal sum as exact STRING digits
    val expHash = expChunks
      .map(ts => BigInt(Sketches.hash56Jvm(ts.mkString(" ")))).sum
    assert(row.getString(6) == expHash.toString,
      "per-chunk content hash sum must match the hand-joined windows")
  }

  test("chunkOverlap plan: no join, single rollup exchange before the output sort") {
    val spark2 = spark
    import spark2.implicits._
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (0 until 100)
        .map(i => ("s" + (i % 3), i.toLong, Seq.fill(50)("tok").mkString(" ")))
        .toDF("source", "doc_id", "text")
      val plan = TextAnalysis.chunkOverlapDf(docs, c = 8, o = 2)
        .queryExecution.executedPlan
      val s = plan.toString
      assert(!s.contains("Join"), s"chunking is per-row generation, got:\n$s")
      // scan → explode → map-side partial agg → ONE hash exchange to the
      // source grain → final agg, plus only the few-row output sort
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size <= 2,
        s"expected the rollup exchange (+ output sort) only, got ${exchanges.size}:\n$s")
    } finally conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("piiRedact's injected synthetics match the recognizers exactly") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (0L, "end of doc reach user123@example.com or +1 555 867 0042"))
      .toDF("doc_id", "text")
    val red = Pii.redact(docs, "text").select("redacted")
      .as[String].head()
    assert(red == "end of doc reach [EMAIL] or [PHONE]",
      "the q_pii_redact injection must be fully scrubbed")
  }
}
