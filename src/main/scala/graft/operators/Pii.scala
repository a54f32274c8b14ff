package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the corpus-scrubbing pass a training
  * pipeline runs before anything else sees the text (the recognizer
  * approach of presidio-style scrubbers, pattern subset chosen to parse
  * identically under Java regex (Spark) and RE2 (DuckDB): no
  * backreferences, no lookaround).
  *
  * Everything is per-row codegen'd regexp inside the scan stage — one
  * map-side pass, no shuffle at any corpus size; the per-source rollup
  * is a tiny partial+final aggregate.
  *
  * Redaction order matters where patterns overlap (a 16-digit card
  * number contains phone-shaped runs): cards are replaced before
  * phones, emails before bare IPv4s (a domain can embed digits).
  */
object Pii {
  type Q = (SparkSession, String) => DataFrame

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val CardRe = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{1,4}\\b"
  val PhoneRe = "\\+?\\d{1,3}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}"

  /** (kind, pattern, replacement tag) in redaction order. */
  val Recognizers: Seq[(String, String, String)] = Seq(
    ("emails", EmailRe, "[EMAIL]"),
    ("ips", Ipv4Re, "[IP]"),
    ("cards", CardRe, "[CARD]"),
    ("phones", PhoneRe, "[PHONE]"))

  /** Adds one `n_<kind>` count column per recognizer plus `redacted`
    * (tags substituted in redaction order) to any frame with `textCol`. */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    val counted = Recognizers.foldLeft(df) { case (acc, (kind, re, _)) =>
      acc.withColumn(s"n_$kind", regexp_count(col(textCol), lit(re)))
    }
    val red = Recognizers.foldLeft(col(textCol)) { case (c, (_, re, tag)) =>
      regexp_replace(c, re, tag)
    }
    counted.withColumn("redacted", red)
  }

  /** Per-source PII scan over `documents`. The synthetic corpus is
    * clean, so this gate pins the zero-signal path cross-engine (both
    * engines must find nothing); the positive path — counts and actual
    * redaction on PII-bearing fixtures — is pinned by PiiSpec. */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    redact(Tables.documents(spark, dir), "text")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_emails").as("n_emails"),
        sum("n_ips").as("n_ips"),
        sum("n_cards").as("n_cards"),
        sum("n_phones").as("n_phones"))
      .orderBy("source")

  val queries: Map[String, Q] = Map("q_pii_scan" -> (piiScan _))

  val oracles: Map[String, String] = Map(
    "q_pii_scan" -> {
      val sums = Recognizers.map { case (kind, re, _) =>
        s"sum(len(regexp_extract_all(text, '$re')))::BIGINT AS n_$kind"
      }.mkString(",\n  ")
      s"""SELECT source, count(*)::BIGINT AS n_docs,
         |  $sums
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    })
}
