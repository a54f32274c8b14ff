package graft.operators

import graft.SparkSpec
import graft.functions.CompressFns
import org.apache.spark.sql.functions._

/** Pins the deflate-length expression and the compression-ratio signal
  * (no DuckDB oracle exists for zlib — this suite is the verification). */
class CompressSpec extends SparkSpec {

  test("deflate_len: repetitive text compresses far below diverse text") {
    val spark2 = spark
    import spark2.implicits._
    val rep = ("spam " * 200).trim                        // one 5-gram, 200×
    val div = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val docs = Seq(("rep", 0L, rep), ("div", 1L, div)).toDF("source", "doc_id", "text")
    val r = TextAnalysis.compressRatioDf(docs).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(r("rep") < 500, s"repeated 5-gram must compress <5%: ${r("rep")}bp")
    assert(r("div") > 3000, s"distinct tokens must stay >30%: ${r("div")}bp")
    assert(r("rep") * 4 < r("div"), "the signal must separate the two regimes")
  }

  test("deflate_len is deterministic, null-safe, and exact on knowns") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(Some("hello hello hello hello"), Some(""), None)
      .toDF("text")
    val a = docs.select(CompressFns.deflateLen(col("text")).as("n")).collect()
    val b = docs.select(CompressFns.deflateLen(col("text")).as("n")).collect()
    assert(a.toSeq.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)) ==
      b.toSeq.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)))
    assert(a(2).isNullAt(0), "null in, null out")
    assert(a(1).getInt(0) > 0 && a(1).getInt(0) <= 16,
      "empty string still has a deflate header")
    // interpreted eval must agree with codegen (same JVM kernel)
    import org.apache.spark.unsafe.types.UTF8String
    assert(CompressFns.deflateLenJvm(UTF8String.fromString("hello hello hello hello"))
      == a(0).getInt(0))
  }

  test("compressRatio runs on the gate corpus shape inside one scan") {
    val df = TextAnalysis.compressRatio(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) > 0))
    // word-salad synthetic docs from a tiny vocab: mid-range ratios
    assert(rows.forall(r => r.getLong(2) > 1000 && r.getLong(2) < 9000),
      rows.map(_.mkString(",")).mkString(" | "))
  }
}
