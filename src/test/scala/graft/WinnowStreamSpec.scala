package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.DocStream
import graft.streaming.DocStream.{StreamDoc, WinnowCand}

/** Streaming winnow/containment candidate stage (transformWithState):
  * batch parity against `Dedup.winnowPairs(minShared = 1)` on an
  * in-window in-order feed, the n_shared aggregation parity, the prefix
  * clique across micro-batches, and the occupant-cap truncation rule —
  * the same contract suite the LSH twins carry.
  */
class WinnowStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key)
    }
  }

  // tC quotes tA's 12-token run inside fresh text (the local-overlap
  // case winnowing guarantees recall on: any shared w+2 = 6 token run
  // leaves a shared fingerprint); tB shares nothing
  private val tA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
  private val tB = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar"
  private val tC = s"prefix words here $tA suffix tail tokens"

  test("streaming winnow candidates: cross-batch pairs + n_shared match batch winnowPairs") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.winnowCandidatesTws(spark, ms.toDS())
        .writeStream.format("memory").queryName("wcand").outputMode("append").start()
      ms.addData(Seq(
        StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA),
        StreamDoc(ts("2024-01-01 00:00:10"), 2L, tB)))
      q.processAllAvailable()
      ms.addData(Seq( // the quoting doc arrives a batch later
        StreamDoc(ts("2024-01-01 00:01:00"), 3L, tC)))
      q.processAllAvailable(); q.stop()
      val got = spark.table("wcand").as[WinnowCand].collect()
      val pairs = got.map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      // batch parity on the same docs (arrival order == id order):
      // distinct pairs AND the per-pair shared-fingerprint count
      val batch = Dedup.winnowPairs(
          Seq((1L, tA), (2L, tB), (3L, tC)).toDF("doc_id", "text"),
          minShared = 1)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(batch.map(p => (p._1, p._2)) === pairs, s"got $pairs want $batch")
      assert(pairs === Seq((1L, 3L)), "only the quoting doc may pair")
      val nShared = got.groupBy(c => (c.earlier_doc_id, c.doc_id))
        .view.mapValues(_.map(_.h).distinct.length).toMap
      assert(batch.map(p => ((p._1, p._2), p._3)).toMap ===
        nShared.map { case (k, v) => (k, v.toLong) },
        "per-pair candidate multiplicity must equal the batch n_shared")
    }
  }

  test("streaming winnow clique: three copies pair fully across micro-batches") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.winnowCandidatesTws(spark, ms.toDS())
        .writeStream.format("memory").queryName("wclique").outputMode("append").start()
      (1 to 3).foreach { i =>
        ms.addData(Seq(StreamDoc(ts(f"2024-01-01 00:0$i%d:00"), i.toLong, tA)))
        q.processAllAvailable()
      }
      q.stop()
      val pairs = spark.table("wclique").as[WinnowCand].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      assert(pairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
    }
  }

  test("streaming winnow occupant cap: overflow docs pair with the stored prefix only") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.winnowCandidatesTws(spark, ms.toDS(), maxOccupants = 2)
        .writeStream.format("memory").queryName("wcap").outputMode("append").start()
      (1 to 4).foreach { i =>
        ms.addData(Seq(StreamDoc(ts(f"2024-01-01 00:0$i%d:00"), i.toLong, tA)))
        q.processAllAvailable()
      }
      q.stop()
      val pairs = spark.table("wcap").as[WinnowCand].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      // docs 1,2 stored; 3,4 pair with both but never with each other —
      // the documented truncation (the batch maxDf analogue)
      assert(pairs === Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)),
        s"got $pairs")
    }
  }

  test("streaming winnow TTL: an idle fingerprint bucket forgets its occupants") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.winnowCandidatesTws(spark, ms.toDS(),
          watermarkDelay = "1 minute", ttlMs = 3600000L)
        .writeStream.format("memory").queryName("wttl").outputMode("append").start()
      ms.addData(Seq(StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA)))
      q.processAllAvailable()
      // advance the watermark far past the TTL, on unrelated buckets…
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:00:00"), 2L, tB)))
      q.processAllAvailable()
      // …then a data-less batch for doc 1's buckets: timers fire
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:01:00"), 3L, tB)))
      q.processAllAvailable()
      // a copy of doc 1 after the purge: no pair with the forgotten doc
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:02:00"), 4L, tA)))
      q.processAllAvailable()
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:03:00"), 5L, tA)))
      q.processAllAvailable(); q.stop()
      val got = spark.table("wttl").as[WinnowCand].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      assert(!got.contains((1L, 4L)), "TTL-purged occupants must not pair")
      assert(got.contains((4L, 5L)), "the post-purge copy claims the buckets anew")
    }
  }
}
