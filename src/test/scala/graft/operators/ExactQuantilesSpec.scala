package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExactQuantiles must reproduce Spark's exact `percentile()` (itself
  * hash-matched against DuckDB quantile_cont by the gates) while never
  * holding more than `budget` values in any aggregation buffer — the specs
  * force multi-pass narrowing with tiny budgets to exercise the loop. */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val fracs = Seq("p10" -> 0.10, "p50" -> 0.50, "p90" -> 0.90, "p99" -> 0.99)

  private def reference(values: Seq[Double], p: Double): Double = {
    val s = values.sorted
    val r = p * (s.length - 1).toDouble
    val lo = s(math.floor(r).toInt); val hi = s(math.ceil(r).toInt)
    lo + (r - math.floor(r)) * (hi - lo)
  }

  test("matches percentile() on continuous data, multi-pass via tiny budget") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(20000)(rng.nextGaussian() * 100 + 50)
    val df = vals.toDF("x").repartition(4)
    // budget 500 << 20000 forces at least two histogram passes
    val got = ExactQuantiles.quantiles(df, "x", fracs, bins = 16, budget = 500)
      .collect().head
    fracs.map(_._2).zipWithIndex.foreach { case (p, i) =>
      assert(math.abs(got.getDouble(i) - reference(vals, p)) < 1e-9, s"p=$p")
    }
  }

  test("heavy duplicates: bracket collapses to fp resolution, still exact") {
    // one value duplicated far beyond the budget — the mega-duplicate case
    val vals = Seq.fill(50000)(42.0) ++ (1 to 500).map(_.toDouble) ++
      Seq.fill(30000)(99.5)
    val df = vals.toDF("x").repartition(4)
    val got = ExactQuantiles.quantiles(df, "x", fracs, bins = 16, budget = 200)
      .collect().head
    fracs.map(_._2).zipWithIndex.foreach { case (p, i) =>
      assert(got.getDouble(i) === reference(vals, p), s"p=$p")
    }
  }

  test("grouped medians match per-group percentile()") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 30000).map { i =>
      val g = s"g${i % 3}"
      (g, rng.nextDouble() * (i % 3 + 1) * 1000)
    }
    val df = rows.toDF("g", "x").repartition(4)
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("med" -> 0.5, "p75" -> 0.75),
        groupBy = Seq("g"), bins = 16, budget = 1000)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val vs = grp.map(_._2)
      assert(math.abs(got(g)._1 - reference(vs, 0.5)) < 1e-9, s"median $g")
      assert(math.abs(got(g)._2 - reference(vs, 0.75)) < 1e-9, s"p75 $g")
    }
  }

  test("extreme magnitude spread: dense cluster behind far outliers") {
    // the bracket must narrow across ~35 decimal orders before the
    // cluster around the median resolves — exercises many passes
    val rng = new scala.util.Random(13)
    val vals = Seq(-1e30, 1e30, 1e25, -1e25) ++
      Seq.fill(5000)(rng.nextDouble() * 1e-6)
    val df = vals.toDF("x").repartition(4)
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("med" -> 0.5), bins = 16, budget = 100)
      .collect().head
    assert(math.abs(got.getDouble(0) - reference(vals, 0.5)) < 1e-20)
  }

  test("±Infinity values order normally via tail counts; no histogram stall") {
    // percentile() sorts ±Inf like any double; the bracketing must not
    // try to histogram an infinite-width bracket (it would never narrow)
    val vals = Seq(Double.NegativeInfinity, Double.NegativeInfinity) ++
      (1 to 2000).map(_.toDouble) ++ Seq(Double.PositiveInfinity)
    val df = vals.toDF("x").repartition(3)
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("lo" -> 0.0, "med" -> 0.5, "hi" -> 1.0, "p99" -> 0.99),
        bins = 16, budget = 200)
      .collect().head
    assert(got.getDouble(0) == Double.NegativeInfinity)
    assert(math.abs(got.getDouble(1) - reference(vals, 0.5)) < 1e-9)
    assert(got.getDouble(2) == Double.PositiveInfinity)
    assert(math.abs(got.getDouble(3) - reference(vals, 0.99)) < 1e-9)
  }

  test("finite span wider than Double.MaxValue: halving passes, still exact") {
    val vals = Seq(-1.5e308, 1.5e308, 1.2e308) ++ (1 to 500).map(_.toDouble)
    val df = vals.toDF("x").repartition(2)
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("med" -> 0.5, "lo" -> 0.0, "hi" -> 1.0),
        bins = 16, budget = 50)
      .collect().head
    assert(got.getDouble(0) === reference(vals, 0.5))
    assert(got.getDouble(1) == -1.5e308 && got.getDouble(2) == 1.5e308)
  }

  test("nulls excluded; NaN counted and ordered greatest (percentile parity)") {
    // percentile() excludes NULL but includes NaN, sorting it above +Inf —
    // sorted domain here is [1,2,3,4,5,NaN], n=6
    val df = Seq[java.lang.Double](5.0, null, 1.0, Double.NaN, 3.0, 2.0, 4.0)
      .toDF("x")
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("lo" -> 0.0, "med" -> 0.5, "hi" -> 1.0))
      .collect().head
    assert(got.getDouble(0) === 1.0)
    assert(got.getDouble(1) === 3.5) // r = 0.5*5 = 2.5 → 3 + 0.5*(4-3)
    assert(got.getDouble(2).isNaN)   // max rank lands in the NaN tail
    // cross-check the whole row against Spark's own percentile()
    val exp = df.agg(expr("percentile(x, array(0.0, 0.5, 1.0))"))
      .head.getSeq[Double](0)
    assert(got.getDouble(0) === exp(0) && got.getDouble(1) === exp(1))
    assert(exp(2).isNaN === got.getDouble(2).isNaN)
  }

  test("all-NaN group yields NaN quantiles, like percentile()") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", Double.NaN), ("b", Double.NaN))
      .toDF("g", "x")
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("med" -> 0.5), groupBy = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 2.0)
    assert(got("b").isNaN)
  }

  test("subnormal-scale spacing: cell width underflows to 0, no NaN bins") {
    // bracket [0, minPositiveDouble] has (hi-lo)/bins == 0.0 — before the
    // fp-resolved guard this divided by zero and aborted; now it skips
    // straight to the value-level final pass
    val minPos = java.lang.Double.MIN_VALUE // 4.9e-324
    val vals = Seq.fill(300)(0.0) ++ Seq.fill(300)(minPos)
    val df = vals.toDF("x").repartition(3)
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("lo" -> 0.0, "med" -> 0.5, "hi" -> 1.0),
        bins = 128, budget = 100) // budget << 600 forces the narrowing path
      .collect().head
    assert(got.getDouble(0) === 0.0)
    assert(got.getDouble(1) === reference(vals, 0.5))
    assert(got.getDouble(2) === minPos)
  }

  test("property: matches Spark's exact percentile() across distributions") {
    import org.apache.spark.sql.functions._
    val fr = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p999" -> 0.999)
    def check(name: String, vals: Seq[Double]): Unit = {
      val df = vals.toDF("x").repartition(5).cache()
      val exp = df.agg(expr(
        s"percentile(x, array(${fr.map(_._2).mkString(",")}))")).head.getSeq[Double](0)
      val got = ExactQuantiles.quantiles(df, "x", fr, bins = 32, budget = 300)
        .collect().head
      df.unpersist(false)
      fr.indices.foreach { i =>
        assert(math.abs(got.getDouble(i) - exp(i)) <= math.abs(exp(i)) * 1e-14 + 1e-300,
          s"$name ${fr(i)._1}: got ${got.getDouble(i)} want ${exp(i)}")
      }
    }
    val rng = new scala.util.Random(99)
    check("gaussian", Seq.fill(15000)(rng.nextGaussian() * 37 - 11))
    check("lognormal", Seq.fill(15000)(math.exp(rng.nextGaussian() * 3)))
    check("integer-heavy", Seq.fill(15000)((rng.nextInt(50) + 1).toDouble))
    check("bimodal+dups", Seq.fill(7000)(5.0) ++
      Seq.fill(8000)(rng.nextDouble() * 1e6 + 1e9))
  }

  test("single row and tiny groups") {
    val df = Seq(("a", 7.0), ("b", 1.0), ("b", 2.0)).toDF("g", "x")
    val got = ExactQuantiles.quantiles(
        df, "x", Seq("med" -> 0.5), groupBy = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 7.0)
    assert(got("b") === 1.5)
  }
}
