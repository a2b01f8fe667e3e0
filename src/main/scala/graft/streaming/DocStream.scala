package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate detection — the stream twin of the batch
  * MinHash-LSH candidate join, completing the dedup family's streaming
  * story (exact dedup streams via dropDuplicatesWithinWatermark; this
  * streams the NEAR-dup candidate stage).
  *
  * Each incoming doc's 8 LSH band keys are computed in one narrow
  * projection ([[Dedup.bandKeysNarrow]] — per-row signature, no
  * aggregation, so it runs on an unbounded stream exactly as the batch
  * math). Per (band, bh) bucket, keyed state holds ONLY the first
  * occupant (doc_id, ts) — O(1) per ACTIVE bucket, purged by event-time
  * TTL — and every later doc hitting the bucket emits a collision
  * pointing at that occupant. A doc colliding on ≥1 band is exactly a
  * batch LSH candidate against the already-seen prefix of the stream
  * (candidates are verified downstream, same as batch).
  *
  * Semantics vs batch: the stream sees a PREFIX window — a doc pairs
  * with earlier docs only (the batch self-join's `doc_a < doc_b`
  * canonicalization, with arrival order standing in for id order), and a
  * bucket idle past `ttlMs` forgets its occupant (the standard
  * streaming-dedup window trade; batch parity on an in-window in-order
  * feed is pinned in StreamingSpec).
  */
object DocStream {

  case class StreamDoc(ts: Timestamp, doc_id: Long, text: String)
  case class BandHit(ts: Timestamp, doc_id: Long, band: Long, bh: Long)
  case class Occupant(docId: Long, tsMs: Long, maxTsMs: Long)
  case class Collision(doc_id: Long, band: Long, bh: Long, first_doc_id: Long)

  def lshCollisions(spark: SparkSession, docs: Dataset[StreamDoc],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 24L * 3600000L): Dataset[Collision] = {
    import spark.implicits._
    val hits = docs.toDF()
      .select(col("ts"), col("doc_id"),
        explode(Dedup.bandKeysNarrow(col("text"))).as("k"))
      .filter(col("k.bh").isNotNull) // too short to shingle → no bands
      .select(col("ts"), col("doc_id"), col("k.band").as("band"),
        col("k.bh").as("bh"))
      .as[BandHit]
    hits
      .withWatermark("ts", watermarkDelay)
      .groupByKey(h => (h.band, h.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), batch: Iterator[BandHit], state: GroupState[Occupant]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // within a batch the earliest (ts, doc_id) claims the bucket —
            // the batch join's canonical ordering
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
            var occ = state.getOption
            val out = Seq.newBuilder[Collision]
            for (e <- evs) {
              occ match {
                case Some(o) if o.docId != e.doc_id =>
                  out += Collision(e.doc_id, key._1, key._2, o.docId)
                  occ = Some(o.copy(maxTsMs = math.max(o.maxTsMs, e.ts.getTime)))
                case Some(o) => // occupant re-seen (multi-band same doc dedups upstream)
                  occ = Some(o.copy(maxTsMs = math.max(o.maxTsMs, e.ts.getTime)))
                case None =>
                  occ = Some(Occupant(e.doc_id, e.ts.getTime, e.ts.getTime))
              }
            }
            occ.foreach { o =>
              state.update(o)
              // TTL anchored to the bucket's own latest activity, clamped
              // above the watermark (Spark throws on a below-watermark
              // timeout; same discipline as StatefulOps)
              state.setTimeoutTimestamp(
                math.max(o.maxTsMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
