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

  /** MinHash permutation multiplier for permutation `i`: an INDEPENDENT
    * pseudo-random constant per permutation, a_i = splitmix64(i) reduced
    * into [1, P) — inlined as plain literals into the DuckDB mirror, so
    * both engines share the exact family.
    *
    * Why independence matters (caught by DedupSpec's estimator-error
    * bound, twice): with the naive family a_i = 1, 3, 5, …, a shingle
    * whose hash is small has a_i·h small for EVERY permutation — it wins
    * every min, so two docs sharing ONE such shingle get identical
    * signatures (observed: est = 1.0 at true J = 0.008), collide in
    * every LSH band, and get glued into one duplicate cluster. The first
    * fix, a_i = (2i+1)·K mod P, is STILL a linear family: when K·h mod P
    * lands small, (2i+1)·(K·h mod P) is again minimal for all i
    * (observed: 12/16 agreement at J = 0.014). Only mutually independent
    * multipliers make each permutation rank shingles independently,
    * restoring E[match fraction] = J(A,B).
    */
  def minhashMult(i: Int): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    java.lang.Long.remainderUnsigned(z, P - 1) + 1
  }

  /** MinHash permutation family: h_i(x) = (a_i·x + (7919i+13)) mod P with
    * [[minhashMult]] multipliers; a_i < P < 2^30 keeps a_i·x < 2^60.
    */
  def minhashPerm(i: Int, h: Column): Column =
    (lit(minhashMult(i)) * h + lit(7919L * i + 13)) % lit(P)

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
