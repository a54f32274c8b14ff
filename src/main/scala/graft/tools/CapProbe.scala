package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-shingle df-cap fan-out probe (judge r13 ask #6): the √N cap
  * (Dedup.autoDfCap) is documented as the 100 TB skew knob, but only the
  * UNCAPPED path had a committed fan-out measurement (PREFIX_FANOUT.json).
  * This probe builds a deliberately skewed corpus — one literal trigram
  * appended to ~30% of documents, so one shingle's df is 0.3·N — at 1×
  * (sf0.1 documents) and 10× (disjoint caesar-shifted copies, the bench's
  * sf1-derivation recipe), then records candidate-generation censuses:
  *
  *   - uncapped: join-row fan-out carries the hot shingle's df²/2 term →
  *     grows ~100× across the 10× step (quadratic in the hot df);
  *   - capped (√N auto): the hot shingle is excluded from candidate
  *     generation → join rows track the corpus ~linearly.
  *
  * Writes one JSON line per (scale, cap) to PREFIX_FANOUT_CAPPED.json in
  * the launch cwd (kept by tools/snapshot_round.sh).
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // disjoint 10× derivation (same recipe as Bench's sf1 corpus): copy i
    // caesar-shifts letters by i so no shingle matches across copies —
    // overlapping copies would measure self-join blow-up, not skew
    val letters = ('a' to 'z').mkString + ('A' to 'Z').mkString
    def shifted(i: Int): String = {
      val lo = ('a' to 'z').map(c => (((c - 'a') + i) % 26 + 'a').toChar).mkString
      val hi = ('A' to 'Z').map(c => (((c - 'A') + i) % 26 + 'A').toChar).mkString
      lo + hi
    }
    def copies(docs: DataFrame, n: Int): DataFrame = {
      val m = docs.count()
      (0 until n).map { i =>
        docs.select((col("doc_id") + lit(i * m)).as("doc_id"),
          translate(col("text"), letters, shifted(i)).as("text"))
      }.reduce(_ unionAll _)
    }
    // the skew: one literal trigram appended to ~30% of docs — its
    // word-3-gram shingle lands in 0.3·N documents at EVERY scale (the
    // appended tokens contain no letters, so the caesar shift leaves
    // them identical across copies = genuinely hot, not copy-local)
    def skew(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 3,
          concat(col("text"), lit(" 0xh0t 0xh0t 0xh0t")))
          .otherwise(col("text")).as("text"))

    val base = graft.Tables.documents(spark, srcDir).select("doc_id", "text")
    val one = skew(base).cache()
    val ten = skew(copies(base, 10)).cache()
    one.count(); ten.count() // materialize before timing

    val sb = new StringBuilder
    def census(tag: String, docs: DataFrame, cap: Int): Unit = {
      val t0 = System.nanoTime()
      val r = graft.operators.Dedup.ngramJaccardCandidateCensus(docs, cap).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val line = s"""{"corpus":"$tag","df_cap_mode":"${if (cap < 0) "auto_sqrt_n" else if (cap == 0) "off" else cap.toString}",""" +
        s""""n_docs":${r.getLong(0)},"df_cap":${r.getLong(1)},"n_kept_rows":${r.getLong(2)},""" +
        s""""n_join_rows":${r.getLong(3)},"n_cand_pairs":${r.getLong(4)},"sec":${math.round(sec * 100) / 100.0}}"""
      println(s"[capprobe] $line")
      sb.append(line).append("\n")
    }
    census("skewed_1x", one, 0)   // uncapped baseline: hot df²/2 visible
    census("skewed_1x", one, -1)  // capped: hot shingle excluded
    census("skewed_10x", ten, 0)  // uncapped at 10×: ~100× join rows
    census("skewed_10x", ten, -1) // capped at 10×: ~10× join rows (linear)

    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", "."), "PREFIX_FANOUT_CAPPED.json")
    java.nio.file.Files.writeString(out, sb.toString)
    System.err.println(s"[capprobe] wrote $out")
    spark.stop()
  }
}
