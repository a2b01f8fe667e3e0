package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.DocStream

/** HyperLogLog registers and estimator: the merge/replay laws that make
  * the sketch the right 100-TB cardinality summary (cell-wise max folds
  * shards and tolerates at-least-once redelivery), the small-range
  * linear-counting branch against exact truth on the real corpus, the
  * raw branch's error bound on a synthetic large-cardinality stream,
  * and the streaming twin's batch parity.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def regSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.select($"source", $"bucket", $"rho").as[(String, Long, Long)]
      .collect().toSet

  test("registers merge cell-wise across any shard split, and replay is idempotent") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val whole = regSet(TextAnalysis.hllRegisters(docs))
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val merged = regSet(TextAnalysis.hllMerge(
      TextAnalysis.hllRegisters(a), TextAnalysis.hllRegisters(b)))
    assert(merged === whole, "shard merge must equal the whole-corpus registers")
    // duplicate the corpus: max is idempotent, registers unchanged
    val replayed = regSet(TextAnalysis.hllRegisters(docs.unionByName(docs)))
    assert(replayed === whole, "replayed updates must not move any register")
  }

  test("register table is bounded and ranks sit in [1, 31]") {
    val regs = TextAnalysis.hllRegisters(graft.sources.Tables.documents(spark, Sf))
    val perSource = regs.groupBy($"source").count().select(max($"count"))
      .as[Long].head()
    assert(perSource <= TextAnalysis.HllM)
    val (mn, mx) = regs.select(min($"rho"), max($"rho")).as[(Long, Long)].head()
    assert(mn >= 1L && mx <= 31L, s"rho out of range: [$mn, $mx]")
  }

  test("small-range sources ride linear counting and land within a few percent of exact") {
    val rows = TextAnalysis.hllCardinality(graft.sources.Tables.documents(spark, Sf))
      .select($"est_raw", $"est", $"n_exact", $"rel_err")
      .as[(Double, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (raw, est, n, err) =>
      // the real corpus's per-source vocab is tiny: the raw estimator
      // bottoms out near alpha*m (an order of magnitude high) and the
      // branch MUST have picked linear counting instead
      assert(est !== raw, s"linear counting not engaged (est=$est n=$n)")
      assert(math.abs(err) <= 0.05,
        s"linear counting off by ${err * 100}% at n=$n")
    }
  }

  test("raw branch: error bound holds on a synthetic large-cardinality stream") {
    // 60k distinct tokens in one source, far above 2.5*m: the raw
    // estimator must engage and land inside ~3 standard errors
    // (1.04/sqrt(256) = 6.5% per Flajolet'07)
    val docs = spark.range(0, 6000)
      .select(col("id").as("doc_id"),
        expr("""array_join(transform(sequence(0, 9),
                i -> concat('tok', id * 10 + i)), ' ')""").as("text"),
        lit("en").as("lang"), lit("big").as("source"),
        lit(1L).as("n_chars"))
    val r = TextAnalysis.hllCardinality(docs)
      .select($"est_raw", $"est", $"n_exact", $"rel_err")
      .as[(Double, Double, Long, Double)].head()
    val (raw, est, n, err) = r
    assert(n == 60000L)
    assert(est === raw, "large cardinality must ride the raw estimator")
    assert(math.abs(err) <= 0.2, s"raw estimate off by ${err * 100}%: $est vs $n")
  }

  test("generation growth: merged-register estimates track exact counts, base never re-scanned") {
    val d = graft.sources.Tables.documents(spark, Sf)
    val base = d.filter($"doc_id" % 3 =!= 0)
    val incr = d.filter($"doc_id" % 3 === 0)
    val rows = TextAnalysis.hllGenGrowth(base, incr)
      .select($"source", $"est_base", $"est_union", $"est_new",
        $"n_base_exact", $"n_union_exact", $"n_new_exact")
      .as[(String, Double, Double, Double, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, eb, eu, en, nb, nu, nn) =>
      assert(nn == nu - nb)
      assert(math.abs(eb - nb) / nb.toDouble <= 0.05, s"$s base est off: $eb vs $nb")
      assert(math.abs(eu - nu) / nu.toDouble <= 0.05, s"$s union est off: $eu vs $nu")
      assert(en == eu - eb)
    }
    // the union estimate comes from MERGED registers: identical to
    // sketching the union corpus directly (the no-re-scan law)
    val direct = regSet(TextAnalysis.hllRegisters(base.unionByName(incr)))
    val merged = regSet(TextAnalysis.hllMerge(
      TextAnalysis.hllRegisters(base), TextAnalysis.hllRegisters(incr)))
    assert(merged === direct)
  }

  test("streaming twin: emitted registers match the batch sketch after every prefix") {
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB state store (state-v2)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
    val ms = MemoryStream[(String, String)]
    val q = DocStream.hllUpdates(spark, ms.toDS())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("append").start()
    def emitted(): Set[(String, Long, Long)] = {
      // Append mode: keep each (source, bucket)'s LATEST emission (the
      // kmv read contract — later batches re-emit raised registers)
      val all = spark.table("hll_stream")
        .select($"source", $"bucket", $"rho").as[(String, Long, Long)]
        .collect()
      // registers are monotone, so the latest emission per cell IS the max
      all.groupBy { case (s, b, _) => (s, b) }
        .map { case (_, vs) => vs.maxBy(_._3) }.toSet
    }
    def batchOf(prefix: Seq[(String, String)]): Set[(String, Long, Long)] =
      regSet(TextAnalysis.hllRegistersOf(
        prefix.toDF("source", "text")
          .select($"source",
            explode(graft.functions.TextFunctions.tokens($"text")).as("w"))))
    ms.addData(docs.take(150))
    q.processAllAvailable()
    assert(emitted() === batchOf(docs.take(150)))
    ms.addData(docs.drop(150))
    q.processAllAvailable()
    assert(emitted() === batchOf(docs))
    q.stop()
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
