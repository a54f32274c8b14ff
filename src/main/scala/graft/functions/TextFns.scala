package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for text analysis / dedup (SURVEY.md §4 extensions;
  * BASELINE.json north-star: dedup, text analysis, fingerprinting).
  *
  * Everything here is a pure Catalyst column expression (codegen'd — no
  * UDFs), and every hash is *engine-portable*: derived from md5 hex so the
  * DuckDB oracle can reproduce bit-identical values. At 100 TB these all
  * run embarrassingly parallel inside the scan stage (no shuffle).
  */
object TextFns {

  /** Whitespace tokenizer (dislib has none; reference text ops are absent —
    * this is the extension surface). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Engine-portable 56-bit hash: first 14 hex chars of md5 as a BIGINT.
    * Same value in DuckDB via ('0x'||substr(md5(x),1,14))::UBIGINT. */
  def hash56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** SQL fragment mirroring [[hash56]] for DuckDB oracles. */
  def hash56Sql(expr: String): String =
    s"(('0x'||substr(md5($expr),1,14))::UBIGINT::BIGINT)"

  /** Word n-gram shingles (distinct); empty when the document has fewer
    * than n words.
    *
    * Built from slice + zip_with rather than `transform(sequence, i ->
    * element_at(words, i+k))`: inside a lambda, `element_at`'s child is
    * re-evaluated per array element (interpreted higher-order exprs do no
    * subexpression elimination), which re-runs the upstream regexp split
    * O(words) times per row. Slices evaluate the words array once. */
  def wordShingles(words: Column, n: Int): Column = {
    val len = greatest(size(words) - lit(n - 1), lit(0))
    val gram = (2 to n).foldLeft(slice(words, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(words, lit(k), len), (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(when(size(words) >= n, gram).otherwise(array()))
  }

  /** DuckDB mirror of [[wordShingles]] (1-based list indexing). */
  def wordShinglesSql(wordsExpr: String, n: Int): String = {
    val gram = (0 until n).map(k => s"$wordsExpr[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(case when len($wordsExpr) >= $n then [$gram for i in range(1, len($wordsExpr)-${n - 2})] else [] end)"
  }

  /** MinHash parameters — fixed linear permutations (a*h+b) mod P over the
    * 56-bit shingle hash reduced mod P. Shared by the Spark plan and the
    * DuckDB oracle, so signatures are bit-identical across engines. */
  val MinhashP: Long = 2147483647L
  val NumPerms: Int = 16
  val BandRows: Int = 4
  def permA(i: Int): Long = ((i + 1).toLong * 1103515245L + 12345L) % MinhashP
  def permB(i: Int): Long = ((i + 1).toLong * 2654435761L) % MinhashP

  /** Small per-language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Deterministic, engine-portable. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("的", "是", "了"))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "in", "to", "it", "on", "for")

  /** Count of tokens contained in a fixed word set (frequency-weighted). */
  def markerCount(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(markers)))

  def markerCountSql(wordsExpr: String, markers: Seq[String]): String = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($wordsExpr, x -> x in ($set)))"
  }
}
