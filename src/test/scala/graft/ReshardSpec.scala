package graft

import org.apache.spark.sql.functions._
import graft.operators.Maintenance

/** Rendezvous reshard audit: the defining only-moves-to-new-shards
  * property, conservation, the expected moved fraction, and shard
  * balance (the regression the affine-mix bug failed).
  */
class ReshardSpec extends SparkSpec {

  private lazy val rows = Maintenance
    .reshardAudit(graft.sources.Tables.documents(spark, Sf), nOld = 8, nNew = 9)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("growing the shard set only ever moves docs TO a new shard") {
    rows.filter(_._4).foreach { case (o, n, _, _) =>
      assert(n >= 8, s"moved doc must land on a NEW shard: $o -> $n")
      assert(o < 8)
    }
    rows.filterNot(_._4).foreach { case (o, n, _, _) =>
      assert(o == n)
    }
  }

  test("conservation and the expected moved fraction") {
    val total = rows.map(_._3).sum
    val docs = graft.sources.Tables.documents(spark, Sf).count()
    assert(total == docs)
    val moved = rows.filter(_._4).map(_._3).sum
    val frac = moved.toDouble / total
    // expectation 1/9 ≈ 0.111; binomial noise at n = 500 → generous band
    assert(frac > 0.03 && frac < 0.25,
      s"moved fraction $frac far from the 1/9 rendezvous rate")
  }

  test("new-layout shard loads are balanced (the affine-mix regression)") {
    val byNew = rows.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    assert(byNew.size == 9, s"every new shard must own docs: $byNew")
    val (mx, mn) = (byNew.values.max, byNew.values.min)
    // the affine mix measured 6x hoarding; the squared mix must stay sane
    assert(mx.toDouble / mn <= 4.0, s"shard skew too high: $byNew")
  }

  test("a mod-N layout reshuffles what rendezvous preserves") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, Sf)
    val modMoved = docs.select(
        (col("doc_id") % 8 =!= col("doc_id") % 9).as("m"))
      .filter(col("m")).count()
    val rendezvousMoved = rows.filter(_._4).map(_._3).sum
    assert(modMoved > 4 * rendezvousMoved,
      s"mod-N must move far more: $modMoved vs $rendezvousMoved")
  }
}
