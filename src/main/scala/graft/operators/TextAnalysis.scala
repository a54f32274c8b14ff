package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — language ID
  * (marker-lexicon heuristic), quality scoring, token counting, and
  * document fingerprinting (BASELINE.json training-data-pipeline
  * extensions; the reference has no text surface, SURVEY.md §2.11).
  *
  * Scale: every query is scan + per-row codegen'd expressions, then a
  * small aggregate — a single map-side pass at 100 TB, no row explosion.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private def words: Column = tokens(col("text"))

  /** Token counting: whitespace tokens + a BPE-ish chars/4 estimate. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(words).as("n_tokens"),
        ceil(col("n_chars") / 4.0).cast("long").as("n_bpe_est"))
      .orderBy("doc_id")

  /** Quality scoring: length/stopword/uniqueness ratios per document. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("w"), col("n_chars"))
      .select(col("doc_id"),
        size(col("w")).as("n_words"),
        round(aggregate(transform(col("w"), w => length(w)), lit(0L), (a, x) => a + x)
          .cast("double") / size(col("w")), 4).as("avg_word_len"),
        round(markerCount(col("w"), stopwords).cast("double") / size(col("w")), 4)
          .as("stop_ratio"),
        round(size(array_distinct(col("w"))).cast("double") / size(col("w")), 4)
          .as("uniq_ratio"))
      .orderBy("doc_id")

  /** Language ID: argmax of per-language marker-lexicon scores with a fixed
    * precedence order; aggregated as a (true lang × predicted) confusion
    * matrix so the output stays tiny at any scale. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("lang"), words.as("w"))
      .select(col("lang") +:
        langMarkers.map { case (l, m) => markerCount(col("w"), m).as(s"s_$l") }: _*)
    val mx = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
    // fixed precedence = first lang in langMarkers order hitting the max
    val predOrdered = langMarkers.foldRight(lit("und")) { case ((l, _), acc) =>
      when(mx > lit(0) && col(s"s_$l") === mx, lit(l)).otherwise(acc)
    }
    scored.select(col("lang"), predOrdered.as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")
  }

  /** Document fingerprints: exact (md5), order-insensitive bag-of-words
    * (md5 of sorted distinct tokens), and a 56-bit numeric fingerprint. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(col("text")).as("fp_exact"),
        md5(concat_ws(" ", array_sort(array_distinct(words)))).as("fp_bag"),
        hash56(col("text")).as("fp64"))
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "q_token_count" -> (tokenCount _),
    "q_text_quality" -> (textQuality _),
    "q_lang_id" -> (langId _),
    "q_fingerprint" -> (fingerprint _))

  private val wordsSql = "regexp_split_to_array(trim(text), '\\s+')"

  val oracles: Map[String, String] = Map(
    "q_token_count" ->
      s"""SELECT doc_id, len($wordsSql) AS n_tokens,
         |  ceil(n_chars / 4.0)::BIGINT AS n_bpe_est
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id, len(w) AS n_words,
         |  round(list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w), 4) AS avg_word_len,
         |  round(${markerCountSql("w", stopwords)}::DOUBLE / len(w), 4) AS stop_ratio,
         |  round(len(list_distinct(w))::DOUBLE / len(w), 4) AS uniq_ratio
         |FROM (SELECT doc_id, $wordsSql AS w FROM documents) ORDER BY doc_id""".stripMargin,
    "q_lang_id" -> {
      val scores = langMarkers
        .map { case (l, m) => s"${markerCountSql("w", m)} AS s_$l" }.mkString(",\n  ")
      val mx = langMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      val pred = langMarkers
        .map { case (l, _) => s"WHEN s_$l = mx THEN '$l'" }.mkString(" ")
      s"""SELECT lang, pred_lang, count(*) AS n_docs FROM (
         |  SELECT lang, CASE WHEN mx = 0 THEN 'und' $pred ELSE 'und' END AS pred_lang
         |  FROM (SELECT lang, $mx AS mx, * FROM (
         |    SELECT lang, $scores FROM (SELECT lang, $wordsSql AS w FROM documents))))
         |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
    },
    "q_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp_exact,
         |  md5(array_to_string(list_sort(list_distinct($wordsSql)), ' ')) AS fp_bag,
         |  ${hash56Sql("text")} AS fp64
         |FROM documents ORDER BY doc_id""".stripMargin)
}
