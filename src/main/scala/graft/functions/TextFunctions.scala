package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text primitives for the LLM-data-pipeline operators
  * (tokenization, hashing, fingerprinting, MinHash permutations).
  *
  * Everything here is built from codegen'd built-ins and higher-order
  * functions — no UDFs — and is arithmetic-stable across engines: the
  * DuckDB oracles reproduce each function with list_reduce/list_transform
  * using the same integer arithmetic mod [[P]].
  */
object TextFunctions {

  /** Modulus for all polynomial hashing (large prime < 2^30, so
    * acc*31 + char stays well inside Long).
    */
  val P = 1000000007L

  /** Lowercased whitespace tokens, empties dropped. The whitespace class
    * is EXPLICIT ([ \t\n\f\r]) because Java's `\s` includes vertical tab
    * (\x0B) while DuckDB's RE2 `\s` does not — `\s+` on both sides would
    * silently tokenize differently.
    *
    * Backed by the native codegen'd [[graft.expressions.Tokenize]]: one
    * lowercase + one byte scan per row, vs the built-ins spelling's four
    * passes (lower, trim, regex split, array_remove). [[tokensBuiltin]]
    * and [[tokensHof]] keep the built-ins formulations as semantic
    * cross-checks (TokenizeSpec pins all three equal).
    * DuckDB mirror: list_filter(regexp_split_to_array(trim(lower(t)),
    * '[ \t\n\f\r]+'), x -> length(x) > 0).
    */
  def tokens(text: Column): Column = graft.expressions.Tokenize.tokenize(text)

  /** Built-ins formulation of [[tokens]] — semantic cross-check only.
    * Empties are dropped with `array_remove(_, "")`: the `[…]+` split can
    * only produce empty strings at the array's edges (leading/trailing
    * separators survive `trim`, which strips spaces only), so removing
    * `""` is exactly the HOF's semantics.
    */
  def tokensBuiltin(text: Column): Column =
    array_remove(split(trim(lower(text)), "[ \\t\\n\\f\\r]+"), "")

  /** HOF formulation of [[tokens]] — semantic cross-check only. */
  def tokensHof(text: Column): Column =
    filter(split(trim(lower(text)), "[ \\t\\n\\f\\r]+"), t => length(t) > 0)

  /** Polynomial rolling hash over a string's characters:
    * h = fold(7, h*31 + codepoint) mod P. Used both as a per-word hash
    * and as a whole-document fingerprint.
    * DuckDB mirror: list_reduce(list_prepend(7, list_transform(
    * string_split(s, ''), c -> ascii(c))), (a, b) -> (a*31 + b) % P).
    *
    * Backed by the native codegen'd expression [[graft.expressions.PolyHash]]
    * (tight generated loop, zero allocation); [[stringHashHof]] is the
    * built-ins-only formulation kept as a semantic cross-check.
    */
  def stringHash(s: Column): Column = graft.expressions.PolyHash.poly_hash(s)

  /** Reference formulation via higher-order functions (interpreted lambda,
    * per-char array — ~20× slower; see PolyHashSpec for the equivalence
    * test).
    */
  def stringHashHof(s: Column): Column =
    aggregate(split(s, ""), lit(7L), (acc, ch) => (acc * lit(31L) + ascii(ch)) % lit(P))

  /** MinHash permutation family: h_i(x) = ((2i+1)·x + (7919i+13)) mod P.
    * Odd multipliers keep the map injective mod 2^k; constants are small
    * enough that (2i+1)·x < 2^63 for x < P.
    */
  def minhashPerm(i: Int, h: Column): Column =
    (lit(2L * i + 1) * h + lit(7919L * i + 13)) % lit(P)

  /** Count of tokens belonging to a small fixed vocabulary. Used for
    * stopword ratios and the language-ID heuristic.
    *
    * Occurrences of word w = size(toks) − size(array_remove(toks, w));
    * summed over the (distinct) vocabulary this equals the filter-HOF
    * count, but array_remove is codegen'd while the lambda filter is
    * CodegenFallback — and this runs several times per row in quality
    * scoring and language-ID. DuckDB mirror stays the list_filter
    * with equality ORs (same counts).
    */
  def vocabCount(toks: Column, words: Seq[String]): Column = {
    require(words.distinct == words, "vocabulary must be duplicate-free")
    words.map(w => size(toks) - size(array_remove(toks, w)))
      .reduce(_ + _).cast("long")
  }

  /** HOF formulation of [[vocabCount]] — semantic cross-check only. */
  def vocabCountHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === lit(w)).reduce(_ || _))).cast("long")
}
