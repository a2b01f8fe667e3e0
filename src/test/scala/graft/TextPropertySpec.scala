package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Property-based cross-checks for the native text expressions: on
  * adversarial random strings (mixed scripts, every whitespace variant
  * including the vertical tab that distinguishes Java `\s` from RE2,
  * combining marks, non-BMP codepoints), the codegen'd natives must agree
  * exactly with their built-ins/HOF formulations. The corpus-wide
  * equality specs (TokenizeSpec, PolyHashSpec, ShingleSpec) cover real
  * data; this covers the strings real data doesn't contain.
  */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genPiece: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\t", "\n", "\f", "\r", "", " ", "  "),
    2 -> Gen.oneOf(".", ",", "!", "-", "_", "@", "#", "$", "'", "\""),
    1 -> Gen.oneOf("ä", "ß", "é", "Ω", "中", "文", "х", "𝕏", "𐍈", "🙂", "́", "Å", "Å"),
    1 -> Gen.choose(0x20, 0x2fff).map(_.toChar.toString)
  )
  private val genText: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, genPiece).map(_.mkString))

  /** Deterministic sample: fixed seeds so a failure reproduces. */
  private def sample(n: Int): Seq[String] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => genText.apply(params, Seed(i.toLong)))
  }

  private lazy val strings = {
    val s = sample(500)
    assert(s.size > 450, "generator should rarely discard")
    s.toDF("text").cache()
  }

  test("tokenize: native == built-ins == HOF on random adversarial strings") {
    val bad = strings.select(
        TextFunctions.tokens($"text").as("nat"),
        TextFunctions.tokensBuiltin($"text").as("bi"),
        TextFunctions.tokensHof($"text").as("hof"))
      .filter(!($"nat" <=> $"bi") || !($"nat" <=> $"hof"))
    assert(bad.count() === 0)
  }

  test("poly hash: native == HOF on random adversarial strings") {
    val bad = strings.select(
        TextFunctions.stringHash($"text").as("nat"),
        TextFunctions.stringHashHof($"text").as("hof"))
      .filter(!($"nat" <=> $"hof"))
    assert(bad.count() === 0)
  }

  test("fused shingle hashes == tokenize-then-window formulation on random strings") {
    // the fused native must equal hashing the joined trigrams of the
    // (already cross-checked) token stream
    val toks = TextFunctions.tokens($"text")
    val viaToks = filter(
      transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))), i =>
        when(i + 2 < size(toks),
          TextFunctions.stringHash(concat_ws(" ",
            element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))),
      h => h.isNotNull)
    val bad = strings.select(
        graft.expressions.ShingleHashes.shingle_hashes($"text").as("nat"),
        viaToks.as("ref"))
      .filter(!($"nat" <=> $"ref"))
    assert(bad.count() === 0)
  }

  test("gram_hashes: fused native == composed slice/concat/stringHash on adversarial strings") {
    // include NULL text: both paths must propagate null (the composed
    // reference guards on isNotNull so it doesn't wrongly map null → [])
    val withNull = strings.unionAll(Seq(Option.empty[String]).toDF("text"))
    for (w <- Seq(1, 2, 5)) {
      val toks = TextFunctions.tokens($"text")
      // composed reference: per start position i (1-based), hash of the
      // space-joined w-token slice; empty below w tokens; null for null
      val ref = when($"text".isNotNull,
        when(size(toks) >= w,
          transform(sequence(lit(1), size(toks) - (w - 1)),
            i => TextFunctions.stringHash(concat_ws(" ", slice(toks, i, lit(w))))))
          .otherwise(array().cast("array<long>")))
      val bad = withNull.select(
          graft.expressions.GramHashes.gram_hashes($"text", w).as("nat"),
          ref.as("ref"))
        .filter(!($"nat" <=> $"ref"))
      assert(bad.count() === 0, s"gram_hashes width $w diverges from the composed form")
    }
  }

  test("trimmed_levenshtein: native == built-in 3-arg levenshtein on adversarial pairs") {
    // pair shapes that stress the trim: unrelated pairs, identical pairs,
    // appended tails, prepended heads — over strings carrying combining
    // marks, lone-surrogate-adjacent non-BMP chars, and every whitespace
    val ss = sample(200)
    val pairs = (ss.zip(ss.drop(1)) ++
      ss.map(s => (s, s)) ++
      ss.map(s => (s, s + " tail xyz")) ++
      ss.map(s => ("head 𝕏 " + s, s)) ++
      ss.zip(ss.drop(7)).map { case (a, b) => (a + b, b + a) })
      .toDF("a", "b").cache()
    for (k <- Seq(0, 1, 3, 64)) {
      val bad = pairs.select(
          graft.expressions.TrimmedLevenshtein.trimmed_levenshtein($"a", $"b", k).as("nat"),
          levenshtein($"a", $"b", k).as("bi"))
        .filter(!($"nat" <=> $"bi"))
      assert(bad.count() === 0, s"trimmed != builtin at threshold $k")
    }
    // unbounded mode (negative threshold) == the 2-arg builtin
    val badU = pairs.select(
        graft.expressions.TrimmedLevenshtein.trimmed_levenshtein($"a", $"b").as("nat"),
        levenshtein($"a", $"b").as("bi"))
      .filter(!($"nat" <=> $"bi"))
    assert(badU.count() === 0, "unbounded trimmed != 2-arg builtin")
  }

  test("stupid backoff: every quantized log score is <= 0 on random corpora") {
    // s = bitlen(num) − bitlen(den) with num ≤ den on BOTH paths (a bigram
    // count never exceeds its w1 unigram count; 2·c1(w2) ≤ 2N < 5N), and
    // bitlen is monotone — so no doc may ever score positive. Random docs
    // (including empty/whitespace/unicode) must uphold it.
    val docs = strings.withColumn("doc_id", monotonically_increasing_id())
      .select($"doc_id", $"text")
    val sb = graft.operators.TextAnalysis.stupidBackoff(docs)
    assert(sb.filter($"total_sb" > 0).count() === 0,
      "a count ratio > 1 slipped through the quantization")
    // and the backoff fraction is a true fraction
    assert(sb.filter($"n_backoff" > $"n_bigrams").count() === 0)
  }
}
