package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** charClassAudit on planted multilingual / damaged fixtures: the
  * synthetic corpus is all-Latin (the oracle row pins that read-out);
  * the script/mojibake semantics live here.
  */
class CharClassSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(Long, String)]) =
    TextAnalysis.charClassAudit(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("planted scripts: counts, exact permille, dominant class") {
    val got = audit(Seq(
      (1L, "hello world"),                 // latin
      (2L, "中文文本处理系统测试"),            // cjk (10 chars, all CJK)
      (3L, "Привет мир"),                  // cyrillic
      (4L, "abc 中文 где 123")))            // mixed: 3 latin, 2 cjk, 3 cyr, 3 digit
    assert(got(1L).getAs[String]("dominant_class") === "latin")
    assert(got(1L).getAs[Long]("n_latin") === 10L)
    assert(got(1L).getAs[Long]("latin_permille") === 10L * 1000 / 11)
    assert(got(2L).getAs[String]("dominant_class") === "cjk")
    assert(got(2L).getAs[Long]("n_cjk") === 10L)
    assert(got(2L).getAs[Long]("cjk_permille") === 1000L)
    assert(got(3L).getAs[String]("dominant_class") === "cyrillic")
    assert(got(3L).getAs[Long]("n_cyrillic") === 9L, "space is not cyrillic")
    // mixed doc: latin(3) ties digit(3) → fixed precedence picks latin;
    // counts all verified
    val m = got(4L)
    assert((m.getAs[Long]("n_latin"), m.getAs[Long]("n_cjk"),
      m.getAs[Long]("n_cyrillic"), m.getAs[Long]("n_digit")) === ((3L, 2L, 3L, 3L)))
    assert(m.getAs[String]("dominant_class") === "latin",
      "ties resolve in declaration order")
  }

  test("mojibake and replacement-char detection") {
    val got = audit(Seq(
      (1L, "cafÃ© and rÃ©sumÃ©"), // "Ã©" ×3: UTF-8 é read as Latin-1
      (2L, "clean text"),
      (3L, "broken � decode � here")))
    assert(got(1L).getAs[Long]("n_mojibake") === 3L)
    assert(got(2L).getAs[Long]("n_mojibake") === 0L)
    assert(got(2L).getAs[Long]("n_replacement") === 0L)
    assert(got(3L).getAs[Long]("n_replacement") === 2L)
  }

  test("degenerate rows: empty/symbol-only/null text never classes as a script") {
    val rows = Seq[(Long, String)]((1L, ""), (2L, null), (3L, "!!! ??? ..."))
    val got = audit(rows)
    assert(got(1L).getAs[Long]("n_chars") === 0L)
    assert(got(1L).isNullAt(got(1L).fieldIndex("latin_permille")),
      "empty text must not divide by zero")
    assert(got(1L).isNullAt(got(1L).fieldIndex("dominant_class")),
      "empty text must not class as latin via the 0 >= 0 branch")
    assert(got(2L).isNullAt(got(2L).fieldIndex("dominant_class")),
      "null text must not class as anything")
    assert(got(3L).isNullAt(got(3L).fieldIndex("dominant_class")),
      "symbol-only text (all counts 0) must not inflate the latin share")
  }
}
