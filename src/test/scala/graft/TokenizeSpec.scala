package graft

import org.apache.spark.sql.functions._
import graft.expressions.Tokenize
import graft.functions.TextFunctions
import graft.sources.Tables

/** The native single-pass Tokenize must agree with BOTH built-ins
  * formulations (array_remove spelling and filter-HOF spelling — the
  * shape the DuckDB oracles mirror) on edge strings and the corpus, on
  * both evaluation paths.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    "", " ", "\t", "\n\n", "a", " a ", "\ta b\n", "a  b", "x\ty\fz\r",
    "  leading", "trailing  ", "\t\n\f\r mixed \t",
    "UPPER Case MiXeD", "abc",          // vertical tab is NOT a separator
    "nbsp glued", "unicode é ü 中文 žluť", // multi-byte content intact
    "İstanbul DŽUNGLA",                        // expanding/titlecase lowercasings
    "emoji 😀 pair")

  test("native == built-ins == HOF on edge strings") {
    val df = edges.toDF("s")
    val bad = df.filter(
      !(TextFunctions.tokens($"s") <=> TextFunctions.tokensBuiltin($"s")) ||
      !(TextFunctions.tokens($"s") <=> TextFunctions.tokensHof($"s")))
    assert(bad.count() === 0)
  }

  test("native == built-ins across the whole documents corpus") {
    val bad = Tables.documents(spark, Sf)
      .filter(!(TextFunctions.tokens($"text") <=> TextFunctions.tokensBuiltin($"text")))
    assert(bad.count() === 0)
  }

  test("interpreted path matches codegen and nulls propagate") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- edges) {
      val viaEval = Tokenize(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[ArrayData]
      val viaDf = Seq(s).toDF("s")
        .select(TextFunctions.tokens($"s")).as[Seq[String]].head()
      assert(viaEval.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq === viaDf, s"mismatch on ${s.getBytes.toSeq}")
    }
    val r = Seq[Option[String]](None).toDF("s")
      .select(TextFunctions.tokens($"s")).collect()
    assert(r(0).isNullAt(0))
  }
}
