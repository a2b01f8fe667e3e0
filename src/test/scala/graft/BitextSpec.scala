package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** bitextMine on constructed geometry: the planted translation pair wins
  * with a high margin, a crowded neighborhood yields margin ≈ 1, pivot
  * docs are never queries, and single-candidate queries get null margin.
  */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(emb: Seq[(Long, Seq[Float], Int)], langs: Seq[(Long, String)]) = (
    emb.toDF("vec_id", "embedding", "label"),
    langs.map { case (id, l) => (id, s"text $id", l, "s", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("planted pair wins with high margin; crowded neighborhood margins ≈ 1") {
    // qid 0 (de) ≈ en doc 1 (planted pair), en docs 2/3 orthogonal-ish
    // qid 50 (fr) equidistant from en docs 2 and 3 → margin ≈ 1
    val (e, d) = fixture(
      Seq(
        (0L, Seq(1f, 0f, 0f), 0),
        (1L, Seq(0.99f, 0.1f, 0f), 0),
        (2L, Seq(0.1f, 1f, 0f), 0),
        (3L, Seq(0.1f, 0.98f, 0.2f), 0),
        (50L, Seq(0f, 0.7f, 0.1f), 0)),
      Seq((0L, "de"), (1L, "en"), (2L, "en"), (3L, "en"), (50L, "fr")))
    val out = Similarity.bitextMine(e, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(0L, 50L), "only non-en queries at vec_id % 50 == 0")
    assert(out(0L).getAs[Long]("best_id") === 1L)
    assert(out(0L).getAs[Double]("margin") > 2.0,
      s"planted pair must stand clear: ${out(0L)}")
    assert(out(50L).getAs[Double]("margin") < 1.2,
      s"crowded neighborhood must show margin near 1: ${out(50L)}")
  }

  test("a single pivot candidate yields a best pair but null margin") {
    val (e, d) = fixture(
      Seq((0L, Seq(1f, 0f), 0), (1L, Seq(0.9f, 0.1f), 0)),
      Seq((0L, "de"), (1L, "en")))
    val r = Similarity.bitextMine(e, d).collect().head
    assert(r.getAs[Long]("best_id") === 1L)
    assert(r.isNullAt(r.fieldIndex("margin")),
      "no second candidate → margin must be null, not a crash")
  }

  test("plan: corpus lang join is shuffle-hash, never a corpus broadcast") {
    val plan = SparkEntry.queries("q_emb_bitext")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"the id-lang equi-join must shuffle-hash:\n$plan")
  }
}
