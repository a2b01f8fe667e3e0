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
        |  short_token_count(array('a', 'ab', 'abcd'), 3) AS stc
        |""".stripMargin).head()
    assert(row.getAs[Long]("ph") ===
      Seq("abc").toDF("s").select(TextFunctions.stringHash($"s")).as[Long].head())
    assert(row.getAs[Double]("pf") === 1000.5)
    assert(row.getAs[String]("nfc") === "é")
    assert(row.getAs[Int]("ntok") === 3)
    assert(row.getAs[Int]("nsh") === 2)
    assert(row.getAs[Double]("dot") === 11.0)
    assert(row.getAs[Long]("stc") === 2L)

    // aggregates through SQL ≡ Column API
    val viaSql = spark.sql(
      """SELECT lang, top_k_by_value(CAST(doc_id AS DOUBLE), doc_id, 2) AS ids,
        |       simhash_agg(poly_hash(text)) AS sh
        |FROM reg_docs GROUP BY lang""".stripMargin)
      .as[(String, Seq[Long], Long)].collect()
    assert(viaSql.nonEmpty)
    for ((_, ids, _) <- viaSql) assert(ids.length === 2)

    // pushdown_barrier: same rows as the plain predicate
    val plain = spark.sql("SELECT count(*) FROM reg_docs WHERE length(text) > 100").head().getLong(0)
    val barred = spark.sql(
      "SELECT count(*) FROM reg_docs WHERE pushdown_barrier(length(text) > 100)").head().getLong(0)
    assert(barred === plain)
  }
}
