package graft

import graft.expressions.Registry
import graft.functions.TextFunctions
import graft.sources.Tables

/** Every registered SQL function must resolve and agree with its Column
  * API twin through the SQL front end.
  */
class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("all graft functions work through spark.sql") {
    Registry.registerAll(spark)
    Tables.documents(spark, Sf).createOrReplaceTempView("reg_docs")

    val row = spark.sql(
      """SELECT
        |  poly_hash('abc') AS ph,
        |  py_float(' 1_000.5 ') AS pf,
        |  nfc_normalize('é') AS nfc,
        |  size(tokenize('  A b\tC ')) AS ntok,
        |  size(shingle_hashes('a b c d')) AS nsh,
        |  seq_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  short_token_count(array('a', 'ab', 'abcd'), 3) AS stc,
        |  size(winnow_keys('a b c d e', 4)) AS nwk
        |""".stripMargin).head()
    assert(row.getAs[Long]("ph") ===
      Seq("abc").toDF("s").select(TextFunctions.stringHash($"s")).as[Long].head())
    assert(row.getAs[Double]("pf") === 1000.5)
    assert(row.getAs[String]("nfc") === "é")
    assert(row.getAs[Int]("ntok") === 3)
    assert(row.getAs[Int]("nsh") === 2)
    assert(row.getAs[Double]("dot") === 11.0)
    assert(row.getAs[Long]("stc") === 2L)
    // 3 shingles < window 4 → one truncated window → one winner key
    assert(row.getAs[Int]("nwk") === 1)

    // aggregates through SQL ≡ Column API
    val viaSql = spark.sql(
      """SELECT lang, top_k_by_value(CAST(doc_id AS DOUBLE), doc_id, 2) AS ids,
        |       simhash_agg(poly_hash(text)) AS sh,
        |       top_k_pairs(CAST(doc_id AS DOUBLE), doc_id, 2) AS ps
        |FROM reg_docs GROUP BY lang""".stripMargin)
      .as[(String, Seq[Long], Long, Seq[(Long, Double)])].collect()
    assert(viaSql.nonEmpty)
    for ((_, ids, _, ps) <- viaSql) {
      assert(ids.length === 2)
      // the pairs aggregate carries the same ids plus their values
      assert(ps.map(_._1) === ids)
      assert(ps.forall { case (id, v) => v === id.toDouble })
    }

    // adc_lookup: table [1,2 | 3,4], codes [1,0] → qd[0*2+1] + qd[1*2+0] = 2 + 3
    val adc = spark.sql(
      "SELECT adc_lookup(array(1.0d, 2.0d, 3.0d, 4.0d), array(1, 0), 2) AS v")
      .head().getDouble(0)
    assert(adc === 5.0)

    // pushdown_barrier: same rows as the plain predicate
    val plain = spark.sql("SELECT count(*) FROM reg_docs WHERE length(text) > 100").head().getLong(0)
    val barred = spark.sql(
      "SELECT count(*) FROM reg_docs WHERE pushdown_barrier(length(text) > 100)").head().getLong(0)
    assert(barred === plain)
  }

  test("trimmed_levenshtein SQL: negative maxDist literal reaches unbounded mode") {
    Registry.registerAll(spark)
    // the parser spells -1 as UnaryMinus(Literal(1)) — intLit must fold it
    // BEFORE rejecting, or the documented unbounded mode is Column-API-only
    val row = spark.sql(
      """SELECT trimmed_levenshtein('kitten', 'sitting', -1) AS unb,
        |       trimmed_levenshtein('kitten', 'sitting', 1) AS capped""".stripMargin).head()
    assert(row.getAs[Int]("unb") === 3)
    assert(row.getAs[Int]("capped") === -1) // distance 3 exceeds the cap
  }

  test("pure-SQL bloom decontamination: bloom_filter_agg + might_contain") {
    Registry.registerAll(spark)
    val docs = Tables.documents(spark, Sf)
    graft.operators.Dedup.shingles(docs.filter("doc_id % 50 <> 0"))
      .createOrReplaceTempView("train_sh")
    graft.operators.Dedup.shingles(docs.filter("doc_id % 50 = 0"))
      .createOrReplaceTempView("eval_sh")
    val bloomFlagged = spark.sql(
      """SELECT DISTINCT doc_id FROM train_sh
        |WHERE might_contain((SELECT bloom_filter_agg(h) FROM eval_sh), h)""".stripMargin)
      .as[Long].collect().toSet
    val exact = spark.sql(
      """SELECT DISTINCT doc_id FROM train_sh
        |WHERE h IN (SELECT h FROM eval_sh)""".stripMargin)
      .as[Long].collect().toSet
    assert(exact.subsetOf(bloomFlagged), "bloom missed contaminated docs")
  }

  test("SQL barrier pattern: projection FIELD blocks pushdown; predicate wrap does not") {
    Registry.registerAll(spark)
    Tables.documents(spark, Sf).createOrReplaceTempView("reg_docs2")
    // a view with a derived column the filter will reference
    spark.sql(
      "CREATE OR REPLACE TEMP VIEW reg_v AS SELECT doc_id, length(text) * 2 AS d FROM reg_docs2")

    def filterLine(sql: String): String = {
      val plan = spark.sql(sql).queryExecution.optimizedPlan.toString
      plan.linesIterator.find(_.contains("Filter")).getOrElse(
        fail(s"no Filter in plan:\n$plan"))
    }

    // the documented pattern: barrier FIELD + conjunct — the Filter keeps
    // referencing the derived attribute instead of a substituted
    // (length(text) * 2) tree pushed beneath the projection
    val good = filterLine(
      """SELECT doc_id, d FROM
        |  (SELECT *, pushdown_barrier(true) AS __b FROM reg_v)
        |WHERE __b AND d > 100""".stripMargin)
    assert(!good.contains("length("), s"field pattern failed to block pushdown: $good")

    // the trap (kept as a pinned negative so the scaladoc claim stays
    // honest): wrapping only the predicate still gets substituted below
    // the projection — PushPredicateThroughNonJoin checks the project
    // list's determinism, not the condition's
    val naive = filterLine(
      "SELECT doc_id, d FROM reg_v WHERE pushdown_barrier(d > 100)")
    assert(naive.contains("length("),
      s"optimizer behavior changed — revisit Registry scaladoc: $naive")

    // and the rows agree between the two spellings
    val a = spark.sql(
      """SELECT doc_id FROM (SELECT *, pushdown_barrier(true) AS __b FROM reg_v)
        |WHERE __b AND d > 100""".stripMargin).count()
    val b = spark.sql("SELECT doc_id FROM reg_v WHERE d > 100").count()
    assert(a === b)
  }
}
