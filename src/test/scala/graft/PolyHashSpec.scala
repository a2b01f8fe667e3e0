package graft

import org.apache.spark.sql.functions._
import graft.expressions.PolyHash
import graft.functions.TextFunctions
import graft.sources.Tables

/** The native PolyHash expression must agree with the HOF formulation
  * (and therefore with the DuckDB oracle) on every corpus string — and in
  * both interpreted and codegen evaluation paths.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("native == HOF on edge strings (incl. non-BMP codepoints)") {
    val df = Seq("", "a", "the fast key", "UPPER lower 123 !@#",
      "trailing space ", " ", "\ttab\nnl",
      "unicode é ü 中文", "emoji 😀 surrogate pair").toDF("s")
    val bad = df.filter(TextFunctions.stringHash($"s") =!= TextFunctions.stringHashHof($"s"))
    assert(bad.count() === 0)
  }

  test("tokens: vertical tab is NOT a separator (explicit class matches RE2 semantics)") {
    val toks = Seq("ab c").toDF("s")
      .select(TextFunctions.tokens($"s")).as[Seq[String]].head()
    assert(toks === Seq("ab", "c"))
  }

  test("tokens (array_remove) == tokens (filter HOF) on edge strings and the corpus") {
    val edges = Seq("", " ", "\t", "a", " a ", "\ta b\n", "a  b", "\n\n", "x\ty\fz\r",
      "  leading", "trailing  ", "\t\n\f\r mixed \t")
    val df = edges.toDF("s")
    val bad = df.filter(!(TextFunctions.tokens($"s") <=> TextFunctions.tokensHof($"s")))
    assert(bad.count() === 0)
    val corpusBad = Tables.documents(spark, Sf)
      .filter(!(TextFunctions.tokens($"text") <=> TextFunctions.tokensHof($"text")))
    assert(corpusBad.count() === 0)
  }

  test("native == HOF across the whole documents corpus") {
    val docs = Tables.documents(spark, Sf)
    val bad = docs.filter(
      TextFunctions.stringHash($"text") =!= TextFunctions.stringHashHof($"text"))
    assert(bad.count() === 0)
  }

  test("vocabCount and ShortTokenCount == HOF formulations across the corpus") {
    val docs = Tables.documents(spark, Sf)
    val toks = TextFunctions.tokens($"text")
    val stop = graft.operators.TextAnalysis.Stopwords
    val bad = docs.filter(
      !(TextFunctions.vocabCount(toks, stop) <=> TextFunctions.vocabCountHof(toks, stop)) ||
      !(graft.expressions.ShortTokenCount.short_token_count(toks, 3) <=>
        size(filter(toks, t => length(t) <= 3)).cast("long")))
    assert(bad.count() === 0)
  }

  test("SQL registration works") {
    PolyHash.register(spark)
    val r = spark.sql("SELECT poly_hash('abc') AS h").as[Long].head()
    // fold: ((7*31+97)%P ... deterministic spot value computed by the HOF
    val expected = Seq("abc").toDF("s")
      .select(TextFunctions.stringHashHof($"s")).as[Long].head()
    assert(r === expected)
  }

  test("null propagates") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(TextFunctions.stringHash($"s")).collect()
    assert(r(0).isNullAt(0))
  }
}
