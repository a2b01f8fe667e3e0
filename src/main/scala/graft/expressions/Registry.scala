package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryMinus}
import org.apache.spark.sql.types.IntegerType

/** One-call SQL registration for every graft native function and
  * aggregate, so the SQL front end (Q1-style `spark.sql` queries) can
  * reach the same operators the Column API uses:
  *
  * {{{
  *   graft.expressions.Registry.registerAll(spark)
  *   spark.sql("SELECT top_k_by_value(o_totalprice, o_orderkey, 3) FROM orders GROUP BY o_custkey")
  * }}}
  *
  * Integer parameters (k, maxLen, planes) must be integer LITERALS — they
  * shape the aggregation buffer / generated code and cannot vary per row.
  *
  * PushdownBarrier is also exposed (`pushdown_barrier(expr)`) for SQL
  * users filtering a view on an expensive computed column — but note the
  * usage pattern: wrapping the PREDICATE (`WHERE pushdown_barrier(pred)`)
  * does NOT block pushdown, because `PushPredicateThroughNonJoin` guards
  * on the PROJECT LIST's determinism, not the condition's (see
  * [[PushdownBarrier]]'s scaladoc). The barrier must ride as a projection
  * FIELD that the filter references as a conjunct — the SQL spelling of
  * [[PushdownBarrier.barrieredFilter]]:
  *
  * {{{
  *   -- v computes an expensive column `quality`
  *   SELECT * FROM (SELECT *, pushdown_barrier(true) AS __b FROM v)
  *   WHERE __b AND quality > 0.5
  * }}}
  *
  * RegistrySpec pins both shapes against the optimized plan: the field
  * pattern keeps the Filter above the Project; the naive predicate wrap
  * demonstrably does not.
  */
object Registry {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    // the parser spells a negative literal as UnaryMinus(Literal): without
    // this case `trimmed_levenshtein(a, b, -1)` would be rejected here
    // BEFORE constant folding ever runs, making the documented unbounded
    // mode (negative maxDist) unreachable from SQL
    case UnaryMinus(Literal(v: Int, IntegerType), _) => -v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
  }

  /** Usable arity error instead of a bare IndexOutOfBoundsException. */
  private def arity(es: Seq[Expression], n: Int, fn: String, sig: String): Seq[Expression] = {
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$fn expects $n arguments ($sig), got ${es.length}")
    es
  }

  def registerAll(spark: SparkSession): Unit = {
    // scalar functions with their own register()
    PolyHash.register(spark)
    PyFloat.register(spark)
    NfcNormalize.register(spark)
    RandomHyperplaneBits.register(spark)
    SignProject.register(spark)
    HashedTf.register(spark)

    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("tokenize",
      es => Tokenize(es.head), "built-in")
    r.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashes(es.head), "built-in")
    r.createOrReplaceTempFunction("gram_hashes",
      es => { arity(es, 2, "gram_hashes", "text, width")
        GramHashes(es(0), intLit(es(1), "gram_hashes", "width")) }, "built-in")
    r.createOrReplaceTempFunction("cdc_chunks",
      es => CdcChunks(es.head), "built-in")
    r.createOrReplaceTempFunction("winnow_keys",
      es => { arity(es, 2, "winnow_keys", "text, window")
        WinnowKeys(es(0), intLit(es(1), "winnow_keys", "window")) }, "built-in")
    r.createOrReplaceTempFunction("seq_dot",
      es => { arity(es, 2, "seq_dot", "a, b"); SeqDot(es(0), es(1)) }, "built-in")
    r.createOrReplaceTempFunction("seq_l2sq",
      es => { arity(es, 2, "seq_l2sq", "a, b"); SeqL2Sq(es(0), es(1)) }, "built-in")
    r.createOrReplaceTempFunction("short_token_count",
      es => ShortTokenCount(es(0), intLit(es(1), "short_token_count", "maxLen")), "built-in")
    r.createOrReplaceTempFunction("pushdown_barrier",
      es => PushdownBarrier(es.head), "built-in")
    r.createOrReplaceTempFunction("trimmed_levenshtein",
      es => { arity(es, 3, "trimmed_levenshtein", "a, b, maxDist")
        TrimmedLevenshtein(es(0), es(1),
          intLit(es(2), "trimmed_levenshtein", "maxDist")) }, "built-in")
    // Spark ships BloomFilterAggregate/BloomFilterMightContain (the
    // runtime-filter sketch) but registers NEITHER for SQL in this build,
    // so the Bloom-decontamination pattern can't be written in pure SQL
    // out of the box. Expose both; the probe's filter side must be a
    // constant or scalar subquery:
    //   WHERE might_contain((SELECT bloom_filter_agg(h) FROM eval_sh), h)
    r.createOrReplaceTempFunction("bloom_filter_agg",
      es => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        es.length match {
          case 1 => new BloomFilterAggregate(es.head,
            Literal(1000000L, org.apache.spark.sql.types.LongType))
          case 2 => new BloomFilterAggregate(es(0), es(1))
          case _ => new BloomFilterAggregate(es(0), es(1), es(2))
        }
      }, "built-in")
    r.createOrReplaceTempFunction("might_contain",
      es => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("adc_lookup",
      es => { arity(es, 3, "adc_lookup", "qd, codes, m")
        AdcLookup(es(0), es(1), intLit(es(2), "adc_lookup", "m")) }, "built-in")
    // aggregates: the analyzer wraps AggregateFunctions in aggregate context
    r.createOrReplaceTempFunction("top_k_by_value",
      es => TopKByValue(es(0), es(1), intLit(es(2), "top_k_by_value", "k")), "built-in")
    r.createOrReplaceTempFunction("top_k_pairs",
      es => TopKPairsByValue(es(0), es(1), intLit(es(2), "top_k_pairs", "k")), "built-in")
    r.createOrReplaceTempFunction("simhash_agg",
      es => SimHashAgg(es.head), "built-in")
  }
}
