package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe EXACT quantiles — dislib's exact sort-based median
  * (reference `dislib/data/array.py:1100-1208`) re-expressed so that no
  * aggregation buffer ever holds more than a bounded number of values.
  *
  * Spark's built-in `percentile()` is exact but accumulates EVERY value of
  * the column into a single aggregation buffer — fine at sf0.1, OOM at
  * 100 TB. This operator keeps exactness with bounded memory via iterative
  * histogram bracketing (the classic distributed-selection pattern):
  *
  *  1. one narrow pass per group: `count / min / max` → each requested
  *     fraction becomes one or two integer ranks (the floor/ceil order
  *     statistics that linear interpolation needs);
  *  2. while a rank's value bracket `[lo, hi]` holds more than `budget`
  *     rows: one narrow pass histograms the in-bracket values into `bins`
  *     equi-width cells (shuffle payload = `targets × (bins+1)` counts,
  *     independent of n) and the bracket shrinks to the cell containing
  *     the rank, widened by ±1 cell so floating-point binning can never
  *     exclude the true order statistic;
  *  3. one final pass counts rows per DISTINCT in-bracket value
  *     (≤ budget rows by construction — and when a single duplicated value
  *     dominates, the bracket collapses to ulp width first, so the distinct
  *     count stays tiny either way) and the exact order statistic is read
  *     off the cumulative counts.
  *
  * Every pass is a scan + map-side partial aggregation; the full value
  * column is never shuffled, collected, or buffered. Pass count is
  * O(log_{bins/3}(n / budget)) — 4 passes total at 10^12 rows with the
  * defaults. Interpolation matches `percentile()` / DuckDB `quantile_cont`:
  * `v[floor(r)] + (r - floor(r)) * (v[ceil(r)] - v[floor(r)])`,
  * `r = p * (n-1)`.
  *
  * Group support targets the few-groups/huge-n regime (the shape where the
  * single-buffer percentile dies). For millions of tiny groups the built-in
  * per-group `percentile` is already bounded and preferable.
  */
object ExactQuantiles {

  private final case class Target(
      gid: Int,
      rank: Long,
      var lo: Double,
      var hi: Double,
      var inCount: Long,
      var ready: Boolean = false,
      var value: Double = Double.NaN,
      var resolved: Boolean = false)

  /** Distinct-bracket grouping: targets sharing (gid, lo, hi) map to one
    * scan expression. Keys use raw double BITS — an equal-but-different-
    * bits pair (-0.0 vs 0.0) must not split a group, and bitwise-equal
    * brackets always hash together. First occurrence is the
    * representative; the returned lookup gives each target its group
    * index. Shared by the narrowing and final passes. */
  private def bracketGroups(ts: Array[Target]): (Array[Target], Target => Int) = {
    def key(t: Target): (Int, Long, Long) =
      (t.gid, java.lang.Double.doubleToLongBits(t.lo),
        java.lang.Double.doubleToLongBits(t.hi))
    val firsts = scala.collection.mutable.LinkedHashMap.empty[(Int, Long, Long), Target]
    ts.foreach(t => if (!firsts.contains(key(t))) firsts(key(t)) = t)
    val lookup = firsts.keysIterator.zipWithIndex.toMap
    (firsts.valuesIterator.toArray, t => lookup(key(t)))
  }

  /** Exact quantiles of `valueCol` (optionally per group). Returns one row
    * per group: groupBy columns ++ one DoubleType column per
    * `(outName, fraction)`. NULL values are excluded and NaN values are
    * counted and ordered GREATEST — both exactly as Spark's built-in
    * `percentile()` does (SQL NaN semantics: NaN > +Inf) — so this is a
    * drop-in replacement even on NaN-bearing columns. A group whose values
    * are all NULL yields NO row (its rows never reach the pass-0 groupBy)
    * — callers joining the result back onto a full aggregate should
    * left-join. ±Infinity values are ordered normally; like NaN they
    * resolve from the pass-0 tail counts, so the histogram narrowing only
    * ever runs over the finite sub-range.
    */
  def quantiles(
      df: DataFrame,
      valueCol: String,
      fractions: Seq[(String, Double)],
      groupBy: Seq[String] = Nil,
      bins: Int = 128,
      budget: Long = 1L << 16): DataFrame = {
    require(fractions.nonEmpty, "need at least one fraction")
    require(fractions.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "fractions must be in [0, 1]")
    require(bins >= 4, "need at least 4 bins")
    val spark = df.sparkSession

    val v = col("__eq_v")
    val baseAll = df
      .select((groupBy.map(col) :+ col(valueCol).cast("double").as("__eq_v")): _*)
      .filter(v.isNotNull)
    // Histogram/selection passes run over finite+infinite values only; NaN
    // participates solely through its pass-0 tail count (it sorts greatest).
    val base = baseAll.filter(!isnan(v))

    // Pass 0: per-group count / finite min / finite max / ±Inf + NaN tail
    // counts (partial+final agg, tiny result). Infinities and NaN can't
    // enter the histogram domain — a bracket touching them has
    // infinite/undefined width and never narrows — so they resolve
    // directly from the tail counts.
    val negInf = lit(Double.NegativeInfinity)
    val posInf = lit(Double.PositiveInfinity)
    val finiteV = when(v =!= negInf && v =!= posInf && !isnan(v), v)
    val stats = baseAll.groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        min(finiteV).as("__lo"),
        max(finiteV).as("__hi"),
        count(when(v === negInf, 1)).as("__nneg"),
        count(when(v === posInf, 1)).as("__npos"),
        count(when(isnan(v), 1)).as("__nnan"))
      .collect()

    val groupKeys: Array[Seq[Any]] =
      stats.map(r => groupBy.indices.map(r.get)).toArray
    val groupN: Array[Long] = stats.map(_.getAs[Long]("__n"))
    val groupLo: Array[java.lang.Double] =
      stats.map(_.getAs[java.lang.Double]("__lo"))
    val groupHi: Array[java.lang.Double] =
      stats.map(_.getAs[java.lang.Double]("__hi"))
    val groupNeg: Array[Long] = stats.map(_.getAs[Long]("__nneg"))
    val groupPos: Array[Long] = stats.map(_.getAs[Long]("__npos"))
    val groupNan: Array[Long] = stats.map(_.getAs[Long]("__nnan"))

    // Each fraction → rank r = p*(n-1); we need order statistics floor(r)
    // and ceil(r). De-dup ranks shared across fractions.
    val targets: Array[Target] = groupKeys.indices.flatMap { gid =>
      val n = groupN(gid)
      val ranks = fractions.flatMap { case (_, p) =>
        val r = p * (n - 1).toDouble
        Seq(math.floor(r).toLong, math.ceil(r).toLong)
      }.distinct
      ranks.map { rk =>
        if (rk < groupNeg(gid)) { // rank inside the -Inf tail
          val t = Target(gid, rk, 0, 0, 0)
          t.value = Double.NegativeInfinity; t.ready = true; t.resolved = true; t
        } else if (rk >= n - groupNan(gid)) { // rank inside the NaN tail (sorts greatest)
          val t = Target(gid, rk, 0, 0, 0)
          t.value = Double.NaN; t.ready = true; t.resolved = true; t
        } else if (rk >= n - groupNan(gid) - groupPos(gid)) { // +Inf tail
          val t = Target(gid, rk, 0, 0, 0)
          t.value = Double.PositiveInfinity; t.ready = true; t.resolved = true; t
        } else {
          val nFinite = n - groupNeg(gid) - groupPos(gid) - groupNan(gid)
          val t = Target(gid, rk, groupLo(gid), groupHi(gid), nFinite)
          if (t.lo == t.hi) { t.value = t.lo; t.ready = true; t.resolved = true }
          // Bracket already at fp resolution (its equi-width cell width
          // underflows: lo + (hi-lo)/bins == lo, e.g. subnormal-scale
          // spacing): a histogram pass would divide by a zero/denormal
          // width — skip straight to the value-level final pass, which
          // stays tiny (≤ ~bins/2 distinct doubles fit such a bracket).
          else if (t.lo + (t.hi - t.lo) / bins == t.lo) t.ready = true
          else if (nFinite <= budget) t.ready = true
          t
        }
      }
    }.toArray

    def groupMatch(gid: Int): Column =
      groupBy.zip(groupKeys(gid)).map { case (c, gv) => col(c) <=> lit(gv) }
        .reduceOption(_ && _).getOrElse(lit(true))

    // Histogram-narrowing passes. Each pass recomputes count-below and the
    // in-bracket histogram EXACTLY (no cross-pass accumulation), so
    // floating-point bin assignment can only cost the ±1-cell widening.
    // Pass cap: width shrinks ≥ bins/3 per pass, and the widest possible
    // journey — a bracket spanning the full double range narrowing onto a
    // denormal-scale cluster — is ~631 decimal orders, i.e. ~390 passes at
    // the default 128 bins. 512 covers any representable data; real data
    // converges in ≤ 4. Passes are narrow scans, so a pathological spread
    // costs seconds, never memory.
    var pass = 0
    val passCap = math.max(64, math.ceil(
      632 * math.log(10) / math.log(bins / 3.0)).toInt)
    while (targets.exists(t => !t.ready) && pass < passCap) {
      pass += 1
      val active = targets.filter(!_.ready)
      // bin: -1 = below bracket, 0..bins-1 = in-bracket cell, null = other.
      // A bracket wider than Double.MaxValue (finite data straddling
      // ±~9e307) would overflow (v - lo): those targets take one exact-
      // comparison halving pass (2 bins split at the overflow-free
      // midpoint) until the width is representable.
      def tooWide(t: Target): Boolean = (t.hi - t.lo).isInfinity
      // Targets sharing a bracket (ubiquitous: every rank of a group
      // starts from the same [min,max], and nearby fractions keep
      // colliding while the brackets are wide) share ONE histogram —
      // the scan payload is per distinct bracket, not per rank.
      val (repr, bidOf) = bracketGroups(active)
      val binExprs: Seq[Column] = repr.toSeq.map { t =>
        if (tooWide(t)) {
          val mid = t.lo / 2 + t.hi / 2
          when(!groupMatch(t.gid), lit(null))
            .when(v < t.lo, lit(-1))
            .when(v > t.hi, lit(null))
            .when(v < mid, lit(0)).otherwise(lit(1))
        } else {
          val w = (t.hi - t.lo) / bins
          when(!groupMatch(t.gid), lit(null))
            .when(v < t.lo, lit(-1))
            .when(v > t.hi, lit(null))
            .otherwise(least(lit(bins - 1), floor((v - lit(t.lo)) / lit(w))).cast("int"))
        }
      }
      val counts = base
        .select(posexplode(array(binExprs: _*)).as(Seq("__tid", "__bin")))
        .filter(col("__bin").isNotNull)
        .groupBy("__tid", "__bin").agg(count(lit(1)).as("__c"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap

      active.foreach { t =>
        val tid = bidOf(t)
        val below = counts.getOrElse((tid, -1), 0L)
        val hist = Array.tabulate(bins)(b => counts.getOrElse((tid, b), 0L))
        val idx = t.rank - below // index of the target among in-bracket rows
        require(idx >= 0 && idx < hist.sum,
          s"exact-quantile invariant broken: rank ${t.rank} below $below hist ${hist.sum}")
        var cum = 0L; var b = 0
        while (cum + hist(b) <= idx) { cum += hist(b); b += 1 }
        val (nlo, nhi, nin) = if (tooWide(t)) {
          // the `v < mid` comparison is exact — no fp widening needed
          val mid = t.lo / 2 + t.hi / 2
          if (b == 0) (t.lo, math.nextDown(mid), hist(0))
          else (mid, t.hi, hist(1))
        } else {
          val w = (t.hi - t.lo) / bins
          // ±1-cell widening: fp binning is exact to one cell, so the true
          // order statistic always lies inside the widened bracket.
          (math.max(t.lo, t.lo + (b - 1) * w),
            math.min(t.hi, t.lo + (b + 2) * w),
            hist.slice(math.max(0, b - 1), math.min(bins, b + 2)).sum)
        }
        if (nhi <= nlo || nlo + (nhi - nlo) / bins == nlo) {
          // Bracket at fp resolution: a handful of distinct doubles remain
          // (possibly each duplicated billions of times) — the value-level
          // final pass stays tiny regardless of inCount.
          t.lo = nlo; t.hi = nhi; t.inCount = nin; t.ready = true
        } else {
          t.lo = nlo; t.hi = nhi; t.inCount = nin
          if (nin <= budget) t.ready = true
        }
      }
    }
    require(targets.forall(_.ready),
      s"exact-quantile did not converge in $pass passes (cap $passCap)")

    // Final pass: per-distinct-value counts inside each bracket (≤ budget
    // rows per target) + exact below-bracket count, one scan for all targets.
    val unresolved = targets.filter(!_.resolved)
    if (unresolved.nonEmpty) {
      // Same bracket-dedup as the narrowing passes: ranks that finished
      // in the same bracket (common when a bracket holds several nearby
      // order statistics) share one per-distinct-value census.
      val (fRepr, fBidOf) = bracketGroups(unresolved)
      val cellExprs: Seq[Column] = fRepr.toSeq.map { t =>
        when(!groupMatch(t.gid), lit(null))
          .when(v < t.lo, struct(lit(0).as("k"), lit(0.0).as("x")))
          .when(v <= t.hi, struct(lit(1).as("k"), v.as("x")))
          .otherwise(lit(null))
      }
      val rows = base
        .select(posexplode(array(cellExprs: _*)).as(Seq("__tid", "__cell")))
        .filter(col("__cell").isNotNull)
        .groupBy(col("__tid"), col("__cell.k").as("__k"), col("__cell.x").as("__x"))
        .agg(count(lit(1)).as("__c"))
        .collect()

      val byTid = rows.groupBy(_.getInt(0))
      unresolved.foreach { t =>
        val tid = fBidOf(t)
        val rs = byTid.getOrElse(tid, Array.empty[Row])
        val below = rs.filter(_.getInt(1) == 0).map(_.getLong(3)).sum
        val inVals = rs.filter(_.getInt(1) == 1)
          .map(r => (r.getDouble(2), r.getLong(3))).sortBy(_._1)
        val idx = t.rank - below
        require(idx >= 0 && idx < inVals.map(_._2).sum,
          s"exact-quantile final invariant broken: rank ${t.rank} below $below")
        var cum = 0L; var i = 0
        while (cum + inVals(i)._2 <= idx) { cum += inVals(i)._2; i += 1 }
        t.value = inVals(i)._1
        t.resolved = true
      }
    }

    // Assemble: one row per group, percentile()-parity interpolation.
    val valueAt: Map[(Int, Long), Double] =
      targets.map(t => (t.gid, t.rank) -> t.value).toMap
    val outRows: Seq[Row] = groupKeys.indices.map { gid =>
      val n = groupN(gid)
      val qs: Seq[Any] = fractions.map { case (_, p) =>
        if (n == 0) null
        else {
          val r = p * (n - 1).toDouble
          val lo = valueAt((gid, math.floor(r).toLong))
          val hi = valueAt((gid, math.ceil(r).toLong))
          val frac = r - math.floor(r)
          if (frac == 0.0 || lo == hi) lo // avoids Inf - Inf = NaN at integral ranks
          else if (java.lang.Double.isFinite(lo) && java.lang.Double.isFinite(hi))
            lo + frac * (hi - lo) // quantile_cont form, oracle-stable
          else hi * frac + lo * (1 - frac) // two-sided form: ±Inf endpoints behave like percentile()
        }
      }
      Row.fromSeq(groupKeys(gid) ++ qs)
    }
    val gFields = groupBy.map(c => df.schema(c))
    val qFields = fractions.map { case (name, _) => StructField(name, DoubleType) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1),
      StructType(gFields ++ qFields))
  }
}
