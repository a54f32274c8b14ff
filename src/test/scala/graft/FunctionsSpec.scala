package graft

import org.apache.spark.sql.functions._

/** SQL registration of the native expressions + IVF ANN recall. */
class FunctionsSpec extends SparkSpec {

  test("vec_* functions usable from plain SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1D,2D,3D), array(4D,5D,6D)) AS d,
        |  vec_sqdist(array(0D,0D), array(3D,4D)) AS sq,
        |  vec_normsq(array(3D,4D)) AS n""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 25.0)
    // null propagation
    val n = spark.sql("SELECT vec_dot(NULL, array(1D))").head()
    assert(n.isNullAt(0))
    // the round-8 additions ride the same registry
    val g = spark.sql(
      "SELECT gammaln(5D) AS g, deflate_len('abcabcabcabc') AS dl").head()
    assert(math.abs(g.getDouble(0) - math.log(24.0)) < 1e-12)
    assert(g.getInt(1) > 0 && g.getInt(1) < 20, "repetition deflates")
  }

  test("gammaln matches closed-form log-gamma values in codegen and interpreted eval") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(0.5, 1.0, 2.0, 5.0, 50.0).toDF("x")
      .select(col("x"), graft.functions.VecExprs.gammaln(col("x")).as("g"))
    val got = df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(0.5) - math.log(math.sqrt(math.Pi))) < 1e-12) // Γ(½)=√π
    assert(math.abs(got(1.0)) < 1e-12 && math.abs(got(2.0)) < 1e-12) // Γ(1)=Γ(2)=1
    assert(math.abs(got(5.0) - math.log(24.0)) < 1e-12) // Γ(5)=4!
    // interpreted (nullSafeEval) path agrees bitwise with codegen
    val expr = graft.functions.Gammaln(
      org.apache.spark.sql.catalyst.expressions.Literal(5.0))
    assert(expr.eval(null) == got(5.0))
  }

  test("IVF ANN achieves high recall vs brute force at nProbe=8/16") {
    val dir = "/root/testdata/sf0.001"
    val brute = graft.operators.Similarity.bruteTopK(spark, dir)
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = graft.operators.Similarity.ivfTopK(spark, dir, nlist = 16, nProbe = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall")
    // sanity: IVF probes a subset, so it can't return MORE than brute top-3 per query
    assert(ivf.size <= brute.size)
  }

  test("jaro / jaro-winkler textbook values, conventions, SQL registration") {
    import graft.functions.StringSim._
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(jaro("martha", "marhta"), 0.9444444444444445))
    assert(close(jaroWinkler("martha", "marhta"), 0.9611111111111111))
    assert(close(jaroWinkler("dixon", "dicksonx"), 0.8133333333333332))
    // boost threshold: jaro <= 0.7 stays unboosted despite the prefix
    assert(close(jaroWinkler("aaxxxx", "aayyyy"), 0.5555555555555555))
    assert(jaro("", "") == 0.0 && jaroWinkler("", "x") == 0.0)
    assert(jaro("same", "same") == 1.0 && jaroWinkler("same", "same") == 1.0)
    // SQL surface + codegen path: evaluate through a projected column
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT round(jaro_winkler('martha', 'marhta'), 6) AS jw").head().getDouble(0)
    assert(got == 0.961111, s"$got")
  }
}
