package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.NfcNormalize
import graft.operators.Curation

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composed and decomposed spellings normalize identically (both eval paths)") {
    val composed = "caf\u00e9 \u00fcber"
    val decomposed = "cafe\u0301 u\u0308ber" // e+combining acute, u+combining diaeresis
    // interpreted
    assert(NfcNormalize.nfc(UTF8String.fromString(decomposed)).toString === composed)
    assert(NfcNormalize.nfc(UTF8String.fromString(composed)).toString === composed)
    // codegen via DataFrame
    val out = Seq(composed, decomposed).toDF("s")
      .select(NfcNormalize.nfc_normalize($"s").as("n")).as[String].collect()
    assert(out(0) === out(1))
    // and therefore equal fingerprints through the full normalizeText chain
    val fps = Seq((1L, "x", composed), (2L, "x", decomposed))
      .toDF("doc_id", "lang", "text")
    val got = Curation.normalized(fps).select($"norm_fp").as[Long].collect()
    assert(got(0) === got(1))
  }

  test("normalizeText collapses whitespace, lowers, trims") {
    val df = Seq((1L, "x", "  Hello\t\tWORLD\n again ")).toDF("doc_id", "lang", "text")
    val n = df.select(Curation.normalizeText($"text")).as[String].head()
    assert(n === "hello world again")
  }

  test("null propagates; SQL registration works") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(NfcNormalize.nfc_normalize($"s")).collect()
    assert(r(0).isNullAt(0))
    NfcNormalize.register(spark)
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301') AS n").as[String].head() === "caf\u00e9")
  }
}
