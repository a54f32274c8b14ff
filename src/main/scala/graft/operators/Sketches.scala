package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable probabilistic sketches — Count-Min frequency
  * estimation and HyperLogLog distinct counting — built entirely from
  * the md5-derived `hash56`, so every counter, bucket, and final
  * estimate is bit-replayable in the DuckDB oracle (unlike Spark's
  * built-in `approx_count_distinct`, whose sketch is engine-private and
  * gate-checkable only as a tolerance bound — that check lives in
  * `q_sketches`).
  *
  * Scale posture (the whole point of sketches at 100 TB):
  *  - Count-Min: aggregation state is a FIXED depth×width grid (4×16
  *    here) regardless of corpus size — partial sketches combine
  *    map-side, the final merge moves ≤64 rows per task. The corpus
  *    is read once; no vocabulary-sized shuffle exists anywhere in the
  *    sketch path (the gate's exact top-10 comparison side does one
  *    vocab-bounded groupBy, which is the thing the sketch replaces).
  *  - HyperLogLog: per-group state is ≤64 (bucket, max-rho) pairs; the
  *    register max combines map-side, so a 10¹²-row group still ships
  *    64 rows. The harmonic sum is kept in EXACT integer arithmetic
  *    (Σ 2^(51−rho) over a 2^51 scale — max 64·2^51 < 2^57), so
  *    cross-engine equality is bit-level until the single final
  *    divide.
  *
  * Reference: dislib has no sketch surface (SURVEY.md §2.5 covers only
  * exact partial+final aggregation); these follow Cormode–Muthukrishnan
  * (CM sketch, J.Algorithms 2005) and Flajolet et al. (HLL, AofA 2007).
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  /** Count-Min geometry: depth 4 independent rows × width 16 — width is
    * deliberately small relative to the gate vocabulary so hash collisions
    * actually occur and the one-sided `est ≥ true` guarantee is exercised
    * (over_c > 0 on most heavy words), not vacuously true. */
  val CmsDepth = 4
  val CmsWidth = 16
  val CmsTopK = 10

  /** HLL geometry: 64 buckets (6 index bits), rho over the remaining 50
    * hash bits, harmonic sum scaled by 2^51 (= 2^(maxRho)). */
  val HllBuckets = 64
  val HllIndexBits = 6
  val HllRhoMax = 51 // 50 payload bits -> rho in [1, 51]
  /** alpha_64 · m² · 2^51, folded to one double so both engines parse the
    * identical constant (DuckDB would otherwise read 0.709 as DECIMAL and
    * overflow the product). */
  val HllNumerator: Double = 0.709 * 4096.0 * 2251799813685248.0

  private def words = tokens(col("text"))

  /** Corpus token stream (source, w) — shared with the streaming parity
    * gates so stream and batch provably read the same rows. */
  def tokenStream(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(words).as("w"))
      .filter(length(col("w")) > 0)

  /** The q_hll_distinct input frame (scope, v) — shared with the
    * streaming parity gate. */
  def hllInput(spark: SparkSession, dir: String): DataFrame =
    tokenStream(spark, dir)
      .select(concat(lit("words:"), col("source")).as("scope"), col("w").as("v"))
      .unionAll(Tables.lineitem(spark, dir)
        .select(concat(lit("partkey:"), col("l_returnflag")).as("scope"),
          col("l_partkey").cast("string").as("v")))

  /** Count-Min sketch over the corpus token stream, validated against the
    * exact top-10: build the 4×16 counter grid in one pass, then estimate
    * each heavy word as min over the 4 rows — the sketch guarantee is
    * est ≥ true (one-sided error), surfaced as `over_c`.
    *
    * Row hashes are `hash56(j || '#' || w) mod width` — independent-ish
    * rows from the j prefix, portable to the oracle. */
  def countMin(spark: SparkSession, dir: String): DataFrame =
    countMinDf(tokenStream(spark, dir))

  /** Core over any single-column token stream `w` (tests feed synthetic
    * streams; the gate feeds the documents token stream). */
  def countMinDf(tw: DataFrame): DataFrame = {
    def cellOf(j: Int) =
      pmod(hash56(concat(lit(j.toString), lit("#"), col("w"))), lit(CmsWidth))

    val sketch = tw
      .select(posexplode(array((0 until CmsDepth).map(cellOf): _*)).as(Seq("d", "cell")))
      .groupBy("d", "cell").agg(count(lit(1)).as("c"))

    val top = tw.groupBy("w").agg(count(lit(1)).as("true_c"))
      .orderBy(desc("true_c"), asc("w")).limit(CmsTopK)

    // 10 candidates × 4 rows probe the ≤64-cell sketch — broadcast join.
    top.select(col("w"), col("true_c"),
        posexplode(array((0 until CmsDepth).map(cellOf): _*)).as(Seq("d", "cell")))
      .join(broadcast(sketch), Seq("d", "cell"))
      .groupBy("w", "true_c").agg(min("c").as("est_c"))
      .select(col("w").as("word"), col("true_c"), col("est_c"),
        (col("est_c") - col("true_c")).as("over_c"))
      .orderBy(desc("true_c"), asc("word"))
  }

  /** HLL distinct estimates vs exact counts over two keyed streams —
    * per-source document vocabulary (cardinality ~30: the linear-counting
    * small-range branch fires) and per-returnflag lineitem part keys
    * (cardinality ~2000 ≫ 64 buckets: the raw harmonic-mean branch
    * fires) — so BOTH estimator regimes are pinned. The register table,
    * harmonic sum (exact integer), and rounded estimate are reproduced
    * bit-identically by the oracle; `err_bp` pins the accuracy actually
    * achieved (expected ~1.04/√64 ≈ 13%). */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame =
    hllDistinctDf(hllInput(spark, dir))

  /** Core over any keyed value stream (`scope`, `v`). */
  def hllDistinctDf(tw: DataFrame): DataFrame = {
    val h = tw.select(col("scope"), hash56(col("v")).as("h"))
    val regs = h.select(col("scope"),
        pmod(col("h"), lit(HllBuckets.toLong)).as("bucket"),
        when(shiftright(col("h"), HllIndexBits) === 0, lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(shiftright(col("h"), HllIndexBits))))
          .as("rho"))
      .groupBy("scope", "bucket").agg(max("rho").as("mrho"))
    val summed = regs.groupBy("scope").agg(
      count(lit(1)).as("used"),
      // SQL shiftleft: the Scala functions.shiftleft only takes literal bits
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - CAST(mrho AS INT))"))
        .as("ss"))
    val est = summed.select(col("scope"),
      col("used").cast("long").as("buckets_used"),
      (col("ss") + (lit(HllBuckets.toLong) - col("used")) * lit(1L << HllRhoMax))
        .as("s_scaled"))
      .withColumn("raw", lit(HllNumerator) / col("s_scaled").cast("double"))
      .withColumn("zeros", lit(HllBuckets.toLong) - col("buckets_used"))
      .withColumn("est_distinct",
        round(when(col("raw") <= lit(2.5 * HllBuckets) && col("zeros") > 0,
            lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw"))).cast("long"))
    val exact = tw.groupBy("scope")
      .agg(countDistinct(col("v")).as("true_distinct"))
    est.join(exact, "scope")
      .select(col("scope"), col("true_distinct"), col("buckets_used"),
        col("s_scaled"), col("est_distinct"),
        expr("CAST((abs(est_distinct - true_distinct) * 10000) DIV true_distinct AS BIGINT)")
          .as("err_bp"))
      .orderBy("scope")
  }

  /** Shared register→estimate chain (the [[hllDistinctDf]] math, keyed
    * generically so pair-union sketches reuse it verbatim). Input must
    * have (keys..., mrho) one row per occupied register. */
  private def hllEstimate(regs: DataFrame, keys: Seq[String],
      out: String): DataFrame =
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - CAST(mrho AS INT))"))
          .as("ss"))
      .withColumn("s_scaled",
        col("ss") + (lit(HllBuckets.toLong) - col("used")) * lit(1L << HllRhoMax))
      .withColumn("raw", lit(HllNumerator) / col("s_scaled").cast("double"))
      .withColumn("zeros", lit(HllBuckets.toLong) - col("used"))
      .withColumn(out,
        round(when(col("raw") <= lit(2.5 * HllBuckets) && col("zeros") > 0,
            lit(HllBuckets.toDouble) *
              log(lit(HllBuckets.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw"))).cast("long"))
      .select((keys.map(col) :+ col(out)): _*)

  /** HLL SET-OPERATION overlap — the audience-overlap estimator that
    * makes sketches worth keeping around: registers are max-MERGEABLE,
    * so |A∪B| comes from merging the two 64-register sketches (no data
    * re-scan) and |A∩B| by inclusion–exclusion est_a+est_b−est_union.
    * Gate input: distinct users per event_type pair; the exact overlap
    * rides along as the accuracy diagnostic (inclusion–exclusion on
    * ±13% sketches can even go negative — the raw value is pinned, not
    * clamped, so the error behavior is visible).
    *
    * Scale: the corpus collapses to ≤64 register rows per scope in one
    * agg; every pair operation is on those tiny frames — overlap for
    * ANY pair of 10⁹-cardinality sets costs a 64-row merge. The exact
    * column is a gate-scale diagnostic a 100 TB run would drop. */
  def hllOverlap(spark: SparkSession, dir: String): DataFrame =
    hllOverlapDf(Tables.events(spark, dir)
      .select(col("event_type").as("scope"), col("user_id").cast("string").as("v")))

  /** Core over any keyed value stream (`scope`, `v`). */
  private[graft] def hllOverlapDf(tw: DataFrame): DataFrame = {
    val h = tw.select(col("scope"), hash56(col("v")).as("h"))
    val regs = h.select(col("scope"),
        pmod(col("h"), lit(HllBuckets.toLong)).as("bucket"),
        when(shiftright(col("h"), HllIndexBits) === 0, lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(shiftright(col("h"), HllIndexBits))))
          .as("rho"))
      .groupBy("scope", "bucket").agg(max("rho").as("mrho"))
    val single = hllEstimate(regs, Seq("scope"), "est")
    val scopes = regs.select("scope").distinct()
    val pairs = scopes.as("x").crossJoin(scopes.as("y"))
      .filter(col("x.scope") < col("y.scope"))
      .select(col("x.scope").as("et_a"), col("y.scope").as("et_b"))
    val unionRegs = pairs
      .select(col("et_a"), col("et_b"),
        explode(array(col("et_a"), col("et_b"))).as("scope"))
      .join(regs, "scope")
      .groupBy("et_a", "et_b", "bucket").agg(max("mrho").as("mrho"))
    val estU = hllEstimate(unionRegs, Seq("et_a", "et_b"), "est_union")
    val du = tw.select("scope", "v").distinct()
    val exact = du.as("a")
      .join(du.as("b"), col("a.v") === col("b.v") && col("a.scope") < col("b.scope"))
      .groupBy(col("a.scope").as("et_a"), col("b.scope").as("et_b"))
      .agg(count(lit(1)).as("true_overlap"))
    pairs
      .join(single.select(col("scope").as("et_a"), col("est").as("est_a")), "et_a")
      .join(single.select(col("scope").as("et_b"), col("est").as("est_b")), "et_b")
      .join(estU, Seq("et_a", "et_b"))
      .join(exact, Seq("et_a", "et_b"), "left")
      .selectExpr("et_a", "et_b", "est_a", "est_b", "est_union",
        "est_a + est_b - est_union AS est_overlap",
        "coalesce(true_overlap, 0) AS true_overlap",
        """(abs(est_a + est_b - est_union - coalesce(true_overlap, 0)) * 10000)
          |  DIV nullif(coalesce(true_overlap, 0), 0) AS err_bp""".stripMargin)
      .orderBy("et_a", "et_b")
  }

  // ---- JVM replicas of the HLL column math, shared by the streaming
  // state operator (graft.streaming) so incremental register state
  // converges to EXACTLY the batch estimate ----

  /** Per-thread MD5 instance — the streaming Count-Min/HLL state
    * operators hash several times per event, so digest setup must not
    * be a per-call allocation. */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** JVM twin of the md5-derived hash56 column: the first 14 hex chars
    * of md5 = the first 7 digest bytes big-endian. Derived directly
    * from the bytes (no hex formatting/parsing) on a thread-local
    * digest — bit-identical to the former parseLong(hex) form. */
  def hash56Jvm(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** rho over the 50 payload bits — twin of the length(bin(h>>6)) column. */
  def rho56(h: Long): Long = {
    val rest = h >>> HllIndexBits
    if (rest == 0) HllRhoMax.toLong
    else HllRhoMax.toLong - (64 - java.lang.Long.numberOfLeadingZeros(rest))
  }

  /** (buckets_used, s_scaled, est_distinct) from a 64-register array —
    * twin of the [[hllDistinctDf]] estimate columns (same Math.log /
    * half-up rounding the Catalyst expressions evaluate to). */
  def estimateRegs(regs: Array[Long]): (Long, Long, Long) = {
    val used = regs.count(_ > 0).toLong
    val ss = regs.iterator.filter(_ > 0).map(m => 1L << (HllRhoMax - m)).sum
    val sScaled = ss + (HllBuckets - used) * (1L << HllRhoMax)
    val raw = HllNumerator / sScaled.toDouble
    val zeros = HllBuckets - used
    val est =
      if (raw <= 2.5 * HllBuckets && zeros > 0)
        Math.round(HllBuckets.toDouble * Math.log(HllBuckets.toDouble / zeros))
      else Math.round(raw)
    (used, sScaled, est)
  }

  val QsketchBp: Seq[Long] = Seq(5000L, 9000L, 9900L, 9990L)

  /** Mergeable log-histogram quantile sketch — the quantile member of
    * the sketch family (HLL counts distinct, CMS counts frequency,
    * Misra–Gries finds heavy keys; THIS answers "what's p99?" in one
    * pass with bounded state): each value lands in the dyadic bucket
    * keeping its top 7 bits (bucket = value >> (bitlen−7) re-shifted —
    * pure integer, exact in both engines via length(bin(x))), so
    * relative bucket width ≤ 1/64 (~1.6% guaranteed error) and total
    * state is ≤ 128 buckets per OCTAVE of value range regardless of
    * row count. Counts are additive — the sketch merges across
    * partitions, days, or streams for free. Quantile q reads the first
    * bucket whose cumulative count reaches ⌈q·n⌉; the answer is the
    * bucket's EXACT integer bounds, so the gate is hash-stable.
    *
    * Scale: one map-side bucket assignment + a partial+final census
    * onto the bounded bucket table; the prefix sum and the 4-quantile
    * probe join run over ≤ thousands of bucket rows at any corpus
    * size. */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame =
    quantileSketchDf(spark, graft.Tables.orders(spark, dir)
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .filter(col("cents") >= 1L))

  /** Core over any positive (cents LONG) frame. */
  private[graft] def quantileSketchDf(spark: SparkSession, vals: DataFrame): DataFrame = {
    import spark.implicits._
    val buckets = vals
      .selectExpr("cents", "CAST(greatest(length(bin(cents)) - 7, 0) AS INT) AS sh")
      .selectExpr("shiftleft(shiftright(cents, sh), sh) AS lo",
        "shiftleft(shiftright(cents, sh) + 1, sh) - 1 AS hi")
      .groupBy("lo", "hi").agg(count(lit(1)).as("cnt"))
    // bounded bucket table from here on (≤128 buckets per value octave)
    val w = Window.orderBy("lo")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = buckets.withColumn("cum", sum("cnt").over(w))
    val tot = buckets.agg(sum("cnt").as("n"), count(lit(1)).as("n_buckets"))
    val ranks = QsketchBp.toDF("q_bp").crossJoin(broadcast(tot))
      .selectExpr("q_bp", "n", "n_buckets", "(q_bp * n + 9999) DIV 10000 AS rnk")
    ranks.join(cum, col("cum") >= col("rnk"))
      .groupBy("q_bp", "n", "n_buckets", "rnk")
      .agg(min("lo").as("est_lo_cents"))
      .join(buckets.select(col("lo").as("est_lo_cents"), col("hi").as("est_hi_cents")),
        "est_lo_cents")
      .select(col("q_bp"), col("n"), col("n_buckets"), col("rnk"),
        col("est_lo_cents"), col("est_hi_cents"))
      .orderBy("q_bp")
  }

  val queries: Map[String, Q] = Map(
    "q_countmin" -> (countMin _),
    "q_hll_distinct" -> (hllDistinct _),
    "q_hll_overlap" -> (hllOverlap _),
    "q_quantile_sketch" -> (quantileSketch _))

  /** DuckDB tokenizer mirroring [[graft.functions.TextFns.tokens]] —
    * shared with the streaming parity-gate oracles. */
  val wordsSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** DuckDB fragment: register table keyed by `keys` → `$out(keys, est)`
    * — the exact SQL twin of [[hllEstimate]]. */
  private def hllEstSql(regsCte: String, keys: String, out: String): String =
    s"""${out}_s AS (SELECT $keys, count(*)::BIGINT AS used,
       |    sum((1::BIGINT << ($HllRhoMax - mrho)))::BIGINT AS ss
       |  FROM $regsCte GROUP BY $keys),
       |${out}_e AS (SELECT $keys,
       |    (ss + ($HllBuckets - used) * (1::BIGINT << $HllRhoMax))::BIGINT
       |      AS s_scaled, ($HllBuckets - used) AS zeros
       |  FROM ${out}_s),
       |$out AS (SELECT $keys,
       |    round(CASE WHEN $HllNumerator / s_scaled::DOUBLE
       |        <= ${2.5 * HllBuckets} AND zeros > 0
       |      THEN ${HllBuckets.toDouble} * ln(${HllBuckets.toDouble} / zeros::DOUBLE)
       |      ELSE $HllNumerator / s_scaled::DOUBLE END)::BIGINT AS est
       |  FROM ${out}_e)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_quantile_sketch" ->
      s"""WITH v AS (SELECT round(o_totalprice * 100)::BIGINT AS cents
         |  FROM orders WHERE round(o_totalprice * 100) >= 1),
         |b0 AS (SELECT cents,
         |    greatest(length(bin(cents)) - 7, 0)::INT AS sh FROM v),
         |buckets AS (SELECT (cents >> sh) << sh AS lo,
         |    (((cents >> sh) + 1) << sh) - 1 AS hi, count(*)::BIGINT AS cnt
         |  FROM b0 GROUP BY 1, 2),
         |cum AS (SELECT lo, hi, cnt, sum(cnt) OVER (ORDER BY lo
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         |  FROM buckets),
         |tot AS (SELECT sum(cnt)::BIGINT AS n, count(*)::BIGINT AS n_buckets
         |  FROM buckets),
         |ranks AS (SELECT q_bp, n, n_buckets,
         |    (q_bp * n + 9999) // 10000 AS rnk
         |  FROM (SELECT unnest([${QsketchBp.mkString(", ")}]) AS q_bp)
         |  CROSS JOIN tot),
         |pick AS (SELECT q_bp, n, n_buckets, rnk,
         |    min(lo)::BIGINT AS est_lo_cents
         |  FROM ranks JOIN cum ON cum >= rnk
         |  GROUP BY q_bp, n, n_buckets, rnk)
         |SELECT q_bp, n, n_buckets, rnk, est_lo_cents,
         |  b.hi::BIGINT AS est_hi_cents
         |FROM pick JOIN buckets b ON b.lo = est_lo_cents
         |ORDER BY q_bp""".stripMargin,
    "q_hll_overlap" ->
      s"""WITH tw AS (SELECT event_type AS scope, user_id::VARCHAR AS v
         |  FROM events),
         |h AS (SELECT scope, ${hash56Sql("v")} AS h FROM tw),
         |regs AS (SELECT scope, h % $HllBuckets AS bucket,
         |    max(CASE WHEN h >> $HllIndexBits = 0 THEN $HllRhoMax
         |      ELSE $HllRhoMax - length(bin(h >> $HllIndexBits)) END) AS mrho
         |  FROM h GROUP BY 1, 2),
         |${hllEstSql("regs", "scope", "e1")},
         |sc AS (SELECT DISTINCT scope FROM regs),
         |pairs AS (SELECT a.scope AS et_a, b.scope AS et_b
         |  FROM sc a JOIN sc b ON a.scope < b.scope),
         |uregs AS (SELECT et_a, et_b, bucket, max(mrho) AS mrho
         |  FROM pairs JOIN regs ON regs.scope = et_a OR regs.scope = et_b
         |  GROUP BY 1, 2, 3),
         |${hllEstSql("uregs", "et_a, et_b", "eu")},
         |du AS (SELECT DISTINCT scope, v FROM tw),
         |ex AS (SELECT a.scope AS et_a, b.scope AS et_b,
         |    count(*)::BIGINT AS true_overlap
         |  FROM du a JOIN du b ON a.v = b.v AND a.scope < b.scope
         |  GROUP BY 1, 2)
         |SELECT p.et_a, p.et_b, ea.est AS est_a, eb.est AS est_b,
         |  eu.est AS est_union,
         |  ea.est + eb.est - eu.est AS est_overlap,
         |  coalesce(true_overlap, 0) AS true_overlap,
         |  (abs(ea.est + eb.est - eu.est - coalesce(true_overlap, 0)) * 10000
         |    // nullif(coalesce(true_overlap, 0), 0))::BIGINT AS err_bp
         |FROM pairs p
         |JOIN e1 ea ON ea.scope = p.et_a
         |JOIN e1 eb ON eb.scope = p.et_b
         |JOIN eu ON eu.et_a = p.et_a AND eu.et_b = p.et_b
         |LEFT JOIN ex ON ex.et_a = p.et_a AND ex.et_b = p.et_b
         |ORDER BY p.et_a, p.et_b""".stripMargin,
    "q_countmin" -> {
      val cellSql = (wExpr: String, jExpr: String) =>
        s"${hash56Sql(s"$jExpr || '#' || $wExpr")} % $CmsWidth"
      s"""WITH t AS (SELECT source, unnest($wordsSql) AS w FROM documents),
         |tw AS (SELECT w FROM t WHERE len(w) > 0),
         |grid AS (SELECT w, unnest(range($CmsDepth)) AS d FROM tw),
         |sketch AS (SELECT d, ${cellSql("w", "d::VARCHAR")} AS cell,
         |    count(*)::BIGINT AS c
         |  FROM grid GROUP BY 1, 2),
         |top AS (SELECT w, count(*)::BIGINT AS true_c FROM tw
         |  GROUP BY w ORDER BY true_c DESC, w LIMIT $CmsTopK),
         |probe AS (SELECT w, true_c, unnest(range($CmsDepth)) AS d FROM top)
         |SELECT probe.w AS word, true_c, min(c)::BIGINT AS est_c,
         |  (min(c) - true_c)::BIGINT AS over_c
         |FROM probe JOIN sketch
         |  ON sketch.d = probe.d
         | AND sketch.cell = ${cellSql("probe.w", "probe.d::VARCHAR")}
         |GROUP BY probe.w, true_c ORDER BY true_c DESC, word""".stripMargin
    },
    "q_hll_distinct" ->
      s"""WITH t AS (SELECT source, unnest($wordsSql) AS w FROM documents),
         |tw AS (SELECT 'words:' || source AS scope, w AS v FROM t
         |    WHERE len(w) > 0
         |  UNION ALL
         |  SELECT 'partkey:' || l_returnflag, l_partkey::VARCHAR FROM lineitem),
         |h AS (SELECT scope, ${hash56Sql("v")} AS h FROM tw),
         |regs AS (SELECT scope, h % $HllBuckets AS bucket,
         |    max(CASE WHEN h >> $HllIndexBits = 0 THEN $HllRhoMax
         |      ELSE $HllRhoMax - length(bin(h >> $HllIndexBits)) END) AS mrho
         |  FROM h GROUP BY 1, 2),
         |s AS (SELECT scope, count(*)::BIGINT AS used,
         |    sum((1::BIGINT << ($HllRhoMax - mrho)))::BIGINT AS ss
         |  FROM regs GROUP BY scope),
         |est AS (SELECT scope, used AS buckets_used,
         |    (ss + ($HllBuckets - used) * (1::BIGINT << $HllRhoMax))::BIGINT
         |      AS s_scaled,
         |    ($HllBuckets - used) AS zeros
         |  FROM s),
         |est2 AS (SELECT scope, buckets_used, s_scaled,
         |    $HllNumerator / s_scaled::DOUBLE AS raw, zeros FROM est),
         |est3 AS (SELECT scope, buckets_used, s_scaled,
         |    round(CASE WHEN raw <= ${2.5 * HllBuckets} AND zeros > 0
         |      THEN ${HllBuckets.toDouble} * ln(${HllBuckets.toDouble} / zeros::DOUBLE)
         |      ELSE raw END)::BIGINT AS est_distinct
         |  FROM est2),
         |ex AS (SELECT scope, count(DISTINCT v)::BIGINT AS true_distinct
         |  FROM tw GROUP BY scope)
         |SELECT est3.scope, true_distinct, buckets_used, s_scaled,
         |  est_distinct,
         |  (abs(est_distinct - true_distinct) * 10000 // true_distinct)::BIGINT
         |    AS err_bp
         |FROM est3 JOIN ex ON est3.scope = ex.scope
         |ORDER BY est3.scope""".stripMargin)
}
