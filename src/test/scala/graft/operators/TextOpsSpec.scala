package graft.operators

import graft.SparkSpec

/** Hand-computed cases for the LLM-pipeline text operators added in
  * round 4: benchmark decontamination and sequence packing. */
class TextOpsSpec extends SparkSpec {

  test("qualityClassifier recovers the heuristic rule it distills") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val model = TextAnalysis.qualityClassifier(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val bias = model(-1)
    val w = model - (-1)
    assert(w.nonEmpty && w.values.exists(_ != 0.0))
    // naive dense replay: rebuild tf features + label + standardization
    // in local code, score every doc with the learned model, and demand
    // it beats always-predict-majority by a wide margin (the distilled
    // Gopher rule is linearly recoverable; probe showed ~94%)
    val B = TextAnalysis.FeatureHashBuckets
    val rows = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .select(col("doc_id"), col("word"),
        graft.functions.TextFns.hash56(col("word")).as("h"))
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val n = byDoc.size
    val x = byDoc.map { case (id, rs) =>
      val m = rs.length.toDouble
      val sw = rs.count(r => TextAnalysis.QcStopwords.contains(r.getString(1)))
      val y = if (sw * 10000L / rs.length >= TextAnalysis.QcDensityBp) 1.0 else 0.0
      val tf = rs.groupBy(r => (r.getLong(2) % B).toInt).map { case (b, g) =>
        b -> g.map(r => if ((r.getLong(2) / B) % 2 == 0) 1.0 else -1.0).sum / m }
      (id, tf, y)
    }.toSeq
    val mu = (0 until B).map(b => b -> x.map(_._2.getOrElse(b, 0.0)).sum / n).toMap
    val sg = (0 until B).map { b =>
      val s2 = x.map(d => math.pow(d._2.getOrElse(b, 0.0), 2)).sum / n
      b -> math.sqrt(s2 - mu(b) * mu(b)) }.toMap
    var correct = 0
    var pos = 0
    x.foreach { case (_, tf, y) =>
      val z = w.map { case (b, wb) =>
        (tf.getOrElse(b, 0.0) - mu(b)) / sg(b) * wb }.sum + bias
      if ((1.0 / (1.0 + math.exp(-z)) >= 0.5) == (y == 1.0)) correct += 1
      if (y == 1.0) pos += 1
    }
    val majority = math.max(pos, n - pos)
    assert(correct * 10 >= n * 9, s"accuracy $correct/$n must be >= 90%")
    assert(correct > majority, s"$correct/$n must beat majority $majority/$n")
  }

  test("decontaminate flags exactly the corpus docs sharing a 3-gram with the bench set") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      // benchmark doc holds the 3-gram "alpha beta gamma"
      (0L, "srcA", "alpha beta gamma", true),
      // shares that 3-gram inside a longer text → contaminated
      (1L, "srcA", "xx alpha beta gamma yy", false),
      // shares only a 2-gram ("alpha beta"), never a full 3-gram → clean
      (2L, "srcA", "alpha beta delta", false),
      // disjoint vocabulary → clean
      (3L, "srcB", "p q r s t", false)
    ).toDF("doc_id", "source", "text", "is_bench")
    val got = Dedup.decontaminateDf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("srcA", 2L, 1L, 0.5),
      ("srcB", 1L, 0L, 0.0)))
  }

  test("sequencePack assigns packs by global start offset and counts straddlers") {
    val spark2 = spark
    import spark2.implicits._
    // token counts by doc_id order: 3, 4, 2, 5 → starts 0, 3, 7, 9
    val docs = Seq(
      (10L, "a b c"),       // start 0, end 2  → pack 0
      (11L, "d e f g"),     // start 3, end 6  → starts pack 0, ends pack 1 (budget 5)
      (12L, "h i"),         // start 7, end 8  → pack 1
      (13L, "j k l m n")    // start 9, end 13 → starts pack 1, ends pack 2
    ).toDF("doc_id", "text")
    val r = TextAnalysis.sequencePackDf(docs, budget = 5L).collect()(0)
    assert(r.getLong(0) == 4L, "n_docs")
    assert(r.getLong(1) == 14L, "total_tokens")
    assert(r.getLong(2) == 3L, "n_packs = max end pack + 1")
    assert(r.getLong(3) == 2L, "docs 11 and 13 straddle boundaries")
    assert(math.abs(r.getDouble(4) - 4.0 / 3.0) < 1e-3, "avg docs per pack")
  }

  test("gopherRepetition computes dup-word, top-bigram, dup-trigram fractions") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      // 6 words, 3 distinct → dup_word 1-3/6 = 0.5
      // bigrams: "a b","b a","a b","b c","c a" → top "a b" = 2/5 = 0.4
      // trigrams: "a b a","b a b","a b c","b c a" all distinct → 0.0
      (0L, "a b a b c a"),
      // fully repeated: "x x x x" → dup_word 0.75, top bigram "x x" 3/3 = 1,
      // trigrams "x x x" ×2 → dup 1 - 1/2 = 0.5
      (1L, "x x x x"),
      // single word: no bigrams/trigrams → 0.0 sentinels
      (2L, "solo"),
      // two words: one bigram (frac 1.0), no trigrams
      (3L, "p q")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetitionDf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(0L) == ((6, 0.5, 0.4, 0.0)))
    assert(got(1L) == ((4, 0.75, 1.0, 0.5)))
    assert(got(2L) == ((1, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((2, 0.0, 1.0, 0.0)))
  }

  test("stratifiedSample takes exactly min(k, stratum size) docs, stable across partitioning") {
    val spark2 = spark
    import spark2.implicits._
    val base = Seq.tabulate(90)(i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
        Seq.fill(i % 4 + 1)("w").mkString(" ")))
    val a = TextAnalysis.stratifiedSampleDf(base.toDF("doc_id", "lang", "text"), 7)
      .collect().map(_.toSeq)
    val b = TextAnalysis.stratifiedSampleDf(
        base.reverse.toDF("doc_id", "lang", "text").repartition(11), 7)
      .collect().map(_.toSeq)
    assert(a.length == 21) // 3 strata × 7
    assert(a.toSeq == b.toSeq, "sample must be partitioning/order independent")
    // tiny stratum: fewer docs than k → take all of them
    val tiny = Seq((1L, "zh", "w"), (2L, "zh", "w w")).toDF("doc_id", "lang", "text")
    assert(TextAnalysis.stratifiedSampleDf(tiny, 7).count() == 2)
  }

  test("tokenBudgetSelect keeps highest-uniqueness docs whose start offset is under budget") {
    val spark2 = spark
    import spark2.implicits._
    // uniq ratios: doc0 = 1.0 (4/4), doc1 = 0.5 (2/4), doc2 = 0.25 (1/4)
    // quality order: doc0 (start 0), doc1 (start 4), doc2 (start 8)
    val docs = Seq(
      (0L, "srcA", "a b c d"),
      (1L, "srcB", "e e f f"),
      (2L, "srcA", "g g g g")
    ).toDF("doc_id", "source", "text")
    // budget 5: doc0 kept (start 0), doc1 kept (start 4 < 5), doc2 dropped
    val got = TextAnalysis.tokenBudgetSelectDf(docs, 5L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("srcA", 1L, 4L), ("srcB", 1L, 4L)))
    // budget 1: only the first doc starts under it
    val one = TextAnalysis.tokenBudgetSelectDf(docs.repartition(4), 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(one == Seq(("srcA", 1L, 4L)))
  }

  test("weightedSample replays inverse-CDF draws exactly, any partitioning") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (0L, "srcA", "a b c d e f g h"),      // 8 tokens
      (1L, "srcB", "x y"),                  // 2
      (2L, "srcA", "p q r s"),              // 4
      (3L, "srcC", "z")                     // 1 → total 15
    ).toDF("doc_id", "source", "text")
    // naive replay: md5-based hash56 of "draw<j>" mod 15 → owning interval
    def hash56(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString, 16)
    }
    val nts = Seq(("srcA", 8L), ("srcB", 2L), ("srcA", 4L), ("srcC", 1L))
    val starts = nts.map(_._2).scanLeft(0L)(_ + _)
    val expect = (0 until TextAnalysis.NumDraws)
      .map(j => hash56(s"draw$j") % 15L)
      .map(t => nts(starts.indexWhere(_ > t) - 1)._1)
      .groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    for (parts <- Seq(1, 5)) {
      val got = TextAnalysis.weightedSampleDf(
          docs.repartition(parts), TextAnalysis.NumDraws)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        .filter(_._2 > 0)
      assert(got == expect, s"parts=$parts: $got vs $expect")
    }
  }

  test("segmentDedup flags cross-doc repeated segments, not in-doc repeats") {
    val spark2 = spark
    import spark2.implicits._
    // segSize 2 → doc 0 tiles to ["a b","c d"], doc 1 to ["a b","e f"],
    // doc 2 to ["x y","x y"] (in-doc repeat only — one distinct doc),
    // doc 3 to ["c d"] (tail shorter than a full tile still counts)
    val docs = Seq(
      (0L, "srcA", "a b c d"),
      (1L, "srcA", "a b e f"),
      (2L, "srcB", "x y x y"),
      (3L, "srcB", "c d")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.segmentDedupDf(docs, segSize = 2, minDocs = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // dup segments: "a b" (docs 0,1) and "c d" (docs 0,3); "x y" appears
    // twice but only inside doc 2 → NOT dup
    assert(got == Seq(
      ("srcA", 2L, 4L, 3L, 0L),   // segs: a b|c d|a b|e f → 3 dup, no clean doc
      ("srcB", 2L, 3L, 1L, 1L)))  // x y|x y clean, c d dup
  }

  test("collocations ranks by exact integer lift with bigram tiebreak") {
    val spark2 = spark
    import spark2.implicits._
    // tokens: a×4 b×4 c×2 → N=10
    // bigrams: "a b"×4 (3 in doc 0 + 1 in doc 1), "c a"×2, "b a", "b c" ×1
    val docs = Seq((0L, "a b a b c a b"), (1L, "c a b")).toDF("doc_id", "text")
    val got = TextAnalysis.collocationsDf(docs, minCount = 2, topK = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      // lift("a b") = 4·10·1e6/(4·4) = 2500000; lift("c a") = 2·10·1e6/(2·4)
      // = 2500000 — equal, so the (w1, w2) tiebreak orders "a b" first
      ("a", "b", 4L, 2500000L),
      ("c", "a", 2L, 2500000L)))
  }

  test("tfidfTerms scores tf*1e6 DIV df and breaks ties on term") {
    val spark2 = spark
    import spark2.implicits._
    // df: common=2, rare=1, solo=1
    val docs = Seq(
      (0L, "common common rare"),
      (1L, "common solo")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTermsDf(docs, topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      // doc 0: common tf=2 df=2 → 1000000; rare tf=1 df=1 → 1000000; tie → term asc
      (0L, 1, "common", 2L, 1000000L),
      (0L, 2, "rare", 1L, 1000000L),
      // doc 1: solo 1000000 beats common 500000
      (1L, 1, "solo", 1L, 1000000L),
      (1L, 2, "common", 1L, 500000L)))
  }

  test("heavyHitters is exact under Misra-Gries eviction, any k and partitioning") {
    val spark2 = spark
    import spark2.implicits._
    // Zipf-ish corpus: word i appears ~1000/i times; vocabulary (60) far
    // exceeds the counter budget (k=8) so eviction churns constantly
    val rng = new scala.util.Random(11)
    val ws = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val docs = rng.shuffle(ws).grouped(37).map(_.mkString(" ")).toSeq
      .toDF("text")
    for (k <- Seq(8, 16); parts <- Seq(1, 7)) {
      val got = TextAnalysis.heavyHittersDf(docs.repartition(parts), k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // oracle: exact counts, threshold n*(k+1) > N
      val counts = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val total = ws.size.toLong
      val expect = counts.filter { case (_, n) => n * (k + 1) > total }
      assert(got == expect, s"k=$k parts=$parts")
    }
  }

  test("featureHash replays the portable-hash bucket/sign arithmetic") {
    val rows = TextAnalysis.featureHash(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def h56(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(14)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map { w =>
        val h = h56(w)
        ((id, (h % TextAnalysis.FeatureHashBuckets).toInt),
          if ((h / TextAnalysis.FeatureHashBuckets) % 2 == 0) 1L else -1L)
      }
    }.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.map(_._2).sum, xs.length.toLong)
    }
    assert(rows == expect, s"${rows.size} cells vs ${expect.size}")
    // |signed sum| can never exceed the token count in the cell
    rows.values.foreach { case (v, n) => assert(math.abs(v) <= n) }
  }

  test("shardBalanceOf: sorted round-robin deal bounds shard imbalance") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(3)
    // heavy-tailed sizes: a few giants + many small docs
    val sized = (1L to 400L).map(id =>
      (id, if (id <= 5) 5000L + rnd.nextInt(2000) else 10L + rnd.nextInt(200)))
    for (parts <- Seq(1, 7)) {
      val rows = TextAnalysis.shardBalanceOf(
        sized.toDF("doc_id", "toks").repartition(parts)).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.map(_._1).toSeq == (0 until TextAnalysis.ShardCount))
      assert(rows.map(_._3).sum == sized.map(_._2).sum, "tokens conserved")
      assert(rows.map(_._2).sum == 400L, "docs conserved")
      // the sorted deal bounds any shard by ideal + one max item:
      // with S shards, |shard - ideal| * S <= S * max_item
      val ideal = sized.map(_._2).sum / TextAnalysis.ShardCount
      val maxItem = sized.map(_._2).max
      rows.foreach { case (sid, _, toks, bp) =>
        assert(math.abs(toks - ideal) <= maxItem, s"shard $sid: $toks vs $ideal")
        assert(math.abs(bp) <= 10000L * maxItem / ideal + 1, s"bp $bp")
      }
    }
  }

  test("textrank: the co-occurrence hub outranks the leaves, any partitioning") {
    val spark2 = spark
    import spark2.implicits._
    // 'hub' neighbors every leaf; leaves only see 'hub' (star graph) →
    // hub concentrates rank; leaf ordering ties break on the word
    val docs = Seq("hub alpha", "hub beta", "hub gamma", "hub delta",
      "hub epsilon hub zeta").toDF("text")
    for (parts <- Seq(1, 3)) {
      val got = TextAnalysis.textrankDf(docs.repartition(parts)).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(got.head._1 == "hub", s"parts=$parts: ${got.toSeq}")
      assert(got.head._2 > got(1)._2, "hub strictly dominates")
      assert(got.length == 7, s"all 7 vocabulary words ranked: ${got.length}")
      val leaves = got.tail
      assert(leaves.map(_._1).toSeq == leaves.map(_._1).sorted.toSeq,
        "equal-rank leaves order by word")
    }
  }

  test("readability: FK grade replays the integer micro formula") {
    val spark2 = spark
    import spark2.implicits._
    // "the cat sat. it is fat." → words 6, sentences 2, vowel runs 6
    // g = 390000·6/2 + 11800000·6/6 − 15590000 = −2620000 (easy text)
    // hard: one 40-word 1-sentence run of multi-vowel-group words
    val hardText = (1 to 40).map(_ => "cooperation").mkString(" ") + "."
    // cooperation: oo, e, a, io → 4 runs ×40 = 160; words 40, sents 1
    val hardG = 390000L * 40 / 1 + 11800000L * 160 / 40 - 15590000L
    val d = Seq(("easy", "the cat sat. it is fat."), ("hard", hardText))
      .toDF("source", "t")
    val got = TextAnalysis.readabilityDf(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("easy") == ((1L, -2620000L, 0L)), s"${got("easy")}")
    assert(got("hard") == ((1L, hardG, 10000L)), s"expected $hardG: ${got("hard")}")
    assert(hardG > 12000000L, "the hard doc must clear the grade-12 bar")
  }
}
