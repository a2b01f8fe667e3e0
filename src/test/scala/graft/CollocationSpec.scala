package graft

import graft.operators.TextAnalysis

/** PMI collocation mining: a planted always-adjacent pair must out-rank
  * frequent-but-independent tokens, with the hand-computed exact ratio,
  * and the minCount floor must suppress the hapax-pair degeneracy.
  */
class CollocationSpec extends SparkSpec {
  import spark.implicits._

  test("planted collocation tops the ranking with the exact hand-computed ratio") {
    // "new york" always adjacent (6 times); "the" is frequent everywhere
    // but free-floating; "rare pair" occurs once (hapax — would score
    // N/1 without the floor)
    val docs = Seq(
      (1L, "new york is where the people of the city walk the streets"),
      (2L, "new york has the towers and the harbor and the parks"),
      (3L, "people walk in new york and the city is big"),
      (4L, "the city streets of new york hold the people"),
      (5L, "new york new york the city so big they named it twice"),
      (6L, "rare pair")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, minCount = 5, k = 3).collect()
    assert(got.head.getString(0) === "new" && got.head.getString(1) === "york")
    val cab = got.head.getLong(2)
    assert(cab === 6L)
    // exact ratio: N·c(ab)/(c(new)·c(york)); compute the pieces directly
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      graft.functions.TextFunctions.tokens($"text")).as("w")).cache()
    val n = toks.count()
    val cNew = toks.filter($"w" === "new").count()
    val cYork = toks.filter($"w" === "york").count()
    assert(got.head.getDouble(3) === (n * cab).toDouble / (cNew * cYork).toDouble)
    // the hapax "rare pair" never appears despite its degenerate N/1 score
    assert(!got.exists(r => r.getString(0) == "rare"))
    toks.unpersist()
  }

  test("pmiRatio survives products past 2^63 (DECIMAL(38,0) enforcement)") {
    import org.apache.spark.sql.functions._
    // 100-TB-scale counts: both products overflow a BIGINT (5e9·5e9 =
    // 2.5e19 and 4e9·4e9 = 1.6e19, Long.MaxValue ≈ 9.22e18) — a long
    // product wraps NEGATIVE here; the decimal path must match the
    // BigDecimal reference bit-for-bit after the double conversion
    val nt = 5000000000L; val cab = 5000000000L
    val ca = 4000000000L; val cb = 4000000000L
    val got = Seq((nt, cab, ca, cb)).toDF("nt", "cab", "ca", "cb")
      .select(TextAnalysis.pmiRatio($"nt", $"cab", $"ca", $"cb").as("r"))
      .as[Double].head()
    val want = (BigDecimal(nt) * BigDecimal(cab)).toDouble /
      (BigDecimal(ca) * BigDecimal(cb)).toDouble
    assert(got === want, s"decimal PMI diverged: $got vs $want")
    assert(got > 0.0, "ratio must not wrap negative")
    // and the wrap really happens without the promotion (the guard is
    // real): both long products differ from the true integer products
    assert(BigDecimal(nt * cab) !== BigDecimal(nt) * BigDecimal(cab),
      "fixture lost its power: nt*cab no longer overflows a long")
    assert(BigDecimal(ca * cb) !== BigDecimal(ca) * BigDecimal(cb),
      "fixture lost its power: ca*cb no longer overflows a long")
  }
}
