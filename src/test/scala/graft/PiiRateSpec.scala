package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** piiRate on planted PII: per-class doc/hit counts hand-computed, the
  * exact hits-per-Mchar rate, IPv4/longnum disjointness, and null-text
  * tolerance. (The synthetic corpus carries zero PII — the oracle row
  * pins the all-zero read-out; the semantics live here.)
  */
class PiiRateSpec extends SparkSpec {
  import spark.implicits._

  test("planted PII: per-class counts and exact per-Mchar rate") {
    val rows = Seq(
      (1L, "contact a@b.com or c.d+x@e-f.org today", "en", "s1"),
      (2L, "account 12345678 and card 999999999999", "en", "s1"),
      (3L, "server 10.0.0.1 and 192.168.1.255 up", "en", "s1"),
      (4L, "clean text with number 12345 only", "en", "s2"), // 5 digits: no hit
      (5L, null, "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Curation.piiRate(rows).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_docs") === 3L)
    assert((s1.getAs[Long]("n_email_docs"), s1.getAs[Long]("n_email_hits")) === ((1L, 2L)))
    assert((s1.getAs[Long]("n_num_docs"), s1.getAs[Long]("n_num_hits")) === ((1L, 2L)))
    assert((s1.getAs[Long]("n_ip_docs"), s1.getAs[Long]("n_ip_hits")) === ((1L, 2L)))
    val nChars = s1.getAs[Long]("n_chars")
    assert(s1.getAs[Double]("pii_per_mchar") === 6L.toDouble * 1000000.0 / nChars.toDouble)
    val s2 = out("s2")
    assert(s2.getAs[Long]("n_docs") === 2L, "null-text doc still counts as a doc")
    assert(s2.getAs[Long]("n_email_hits") === 0L)
    assert(s2.getAs[Long]("n_num_hits") === 0L, "a 5-digit run is not a long number")
  }

  test("a long digit run inside an email counts once, as an email") {
    // the classes are disjoint: digit runs are counted on text with
    // emails already replaced (redact's sequential order), so a numeric
    // local part is email-only — the summed rate must not double-count
    val rows = Seq(
      (1L, "mail 123456789@example.com and account 987654321", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Curation.piiRate(rows).collect().head
    assert(r.getAs[Long]("n_email_hits") === 1L)
    assert(r.getAs[Long]("n_num_hits") === 1L,
      "only the bare digit run counts — the email's local part is stripped first")
    val nChars = r.getAs[Long]("n_chars")
    assert(r.getAs[Double]("pii_per_mchar") === 2.0 * 1000000.0 / nChars.toDouble)
  }

  test("IPv4 octets never double-count as long digit runs") {
    val rows = Seq((1L, "ip 255.255.255.255 here", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Curation.piiRate(rows).collect().head
    assert(r.getAs[Long]("n_ip_hits") === 1L)
    assert(r.getAs[Long]("n_num_hits") === 0L,
      "dotted octets are ≤3 digits — LongNumRe must not fire")
  }

  test("plan: single-pass grouped aggregation, no join") {
    val plan = Curation.piiRate(graft.sources.Tables.documents(spark, Sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"piiRate must not join:\n$plan")
  }
}
