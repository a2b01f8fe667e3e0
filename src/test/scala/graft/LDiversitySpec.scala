package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** l-diversity audit: the homogeneity attack is flagged on a k-safe but
  * sensitive-homogeneous class, a diverse class passes, the sensitive
  * tagging follows redact's disjoint priority order, and the released
  * classes agree exactly with kAnonymize's manifest.
  */
class LDiversitySpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))

  test("a k-safe class where every member shares one PII class fails l-diversity") {
    // srcHom: 3 docs, all carry an email → l_distinct = 1, ok = false.
    // srcDiv: 3 docs with email / number / clean → l_distinct = 3, ok.
    val rows = Seq[(Long, String, String, String)](
      (1L, "contact me a@b.com now", "en", "srcHom"),
      (2L, "mail x.y@z.org please", "en", "srcHom"),
      (3L, "write q@d.net today", "en", "srcHom"),
      (4L, "reach me at a@b.com", "en", "srcDiv"),
      (5L, "my account 1234567 here", "en", "srcDiv"),
      (6L, "plain clean text here", "en", "srcDiv"))
    val got = Curation.lDiversity(docsDf(rows), k = 3L, l = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(got(("en", "srcHom")) == (3L, 1L, 3L, false),
      s"homogeneous class must fail: ${got(("en", "srcHom"))}")
    assert(got(("en", "srcDiv")) == (3L, 3L, 1L, true))
  }

  test("sensitive tagging follows the disjoint priority email > number > ip") {
    // one doc with an email whose local part is a long number: must tag
    // 'email' once, never 'number' (the redact sequential-replacement
    // rule); one with a bare long number; one with an ip; one clean.
    val rows = Seq[(Long, String, String, String)](
      (1L, "send to 12345678@x.com ok", "en", "s"),
      (2L, "card 99887766551 leaked", "en", "s"),
      (3L, "host 10.0.0.1 up", "en", "s"),
      (4L, "nothing here", "en", "s"))
    val got = Curation.lDiversity(docsDf(rows), k = 4L, l = 4L).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(4) == 4L, s"all four sensitive classes distinct: $r")
    assert(r.getLong(5) == 1L && r.getBoolean(6))
  }

  test("released classes agree exactly with the kAnonymize manifest") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val kan = Curation.kAnonymize(docs)
      .select("lang_out", "source_out", "level", "n_docs")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val ldv = Curation.lDiversity(docs)
      .select("lang_out", "source_out", "level", "n_docs")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(ldv == kan, s"manifests diverge: ${ldv.diff(kan)} / ${kan.diff(ldv)}")
  }
}
