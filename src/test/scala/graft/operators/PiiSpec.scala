package graft.operators

import graft.SparkSpec

/** Positive-path fixtures for the PII scrubber (the gate's corpus is
  * clean, so counts and redaction are pinned here). */
class PiiSpec extends SparkSpec {

  test("redact counts and replaces emails, IPs, cards, phones") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (0L, "contact alice@example.com or bob.smith+tag@sub.domain.org today"),
      (1L, "server at 192.168.0.1 and 10.0.0.255 responded"),
      (2L, "card 4111-1111-1111-1111 expires soon"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val r = Pii.redact(docs, "text").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Int]("n_emails"), x.getAs[Int]("n_ips"),
          x.getAs[Int]("n_cards"), x.getAs[Int]("n_phones")),
          x.getAs[String]("redacted"))).toMap
    assert(r(0L)._1 == ((2, 0, 0, 0)))
    assert(r(0L)._2 == "contact [EMAIL] or [EMAIL] today")
    assert(r(1L)._1._2 == 2)
    assert(r(1L)._2 == "server at [IP] and [IP] responded")
    assert(r(2L)._1._3 == 1)
    assert(r(2L)._2 == "card [CARD] expires soon",
      "card must be redacted as ONE card, not phone fragments")
    assert(r(3L)._1._4 == 1)
    assert(r(3L)._2 == "call [PHONE] now")
    assert(r(4L)._1 == ((0, 0, 0, 0)))
    assert(r(4L)._2 == "clean text with no identifiers at all")
  }

  test("redaction output is idempotent — tags never re-match a recognizer") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((0L,
      "alice@example.com 192.168.0.1 4111111111111111 +1 555 123 4567"))
      .toDF("doc_id", "text")
    val once = Pii.redact(docs, "text").select("redacted")
      .as[String].head()
    val twice = Pii.redact(Seq((0L, once)).toDF("doc_id", "text"), "text")
      .select("redacted").as[String].head()
    assert(once == twice)
  }
}
