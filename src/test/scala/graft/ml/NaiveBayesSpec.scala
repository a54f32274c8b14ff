package graft.ml

import graft.SparkSpec

/** Hand-computed multinomial NB cases: separable classes classify
  * correctly, OOV-only docs fall back to the prior with the pinned
  * class-name tie-break, and multiplicity matters (multinomial, not
  * Bernoulli). */
class NaiveBayesSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, String, Boolean)]) = {
    val spark2 = spark
    import spark2.implicits._
    NaiveBayesGraft.confusion(
      rows.toDF("doc_id", "lang", "text", "is_train"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("separable vocabularies classify correctly") {
    val got = run(Seq(
      (0L, "a", "aa aa bb", true),
      (2L, "b", "cc cc dd", true),
      (1L, "a", "aa aa", false),
      (3L, "b", "cc dd", false)))
    assert(got == Seq(("a", "a", 1L), ("b", "b", 1L)))
  }

  test("OOV-only doc falls back to prior; exact tie breaks on class name asc") {
    // equal priors (1 train doc each), test text fully out-of-vocabulary
    val got = run(Seq(
      (0L, "a", "aa", true),
      (2L, "b", "bb", true),
      (1L, "b", "zz zz", false)))
    assert(got == Seq(("b", "a", 1L)), "tie must resolve to class 'a'")
  }

  test("token multiplicity outweighs a single shared token (multinomial)") {
    // 'xx' appears in both classes; class b saw it 3x vs a 1x, so a test
    // doc of repeated 'xx' must go to b even though a has more train docs
    val got = run(Seq(
      (0L, "a", "xx yy", true),
      (4L, "a", "yy yy", true),
      (2L, "b", "xx xx xx", true),
      (1L, "b", "xx xx xx xx", false)))
    assert(got == Seq(("b", "b", 1L)))
  }
}
