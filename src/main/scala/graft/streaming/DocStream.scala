package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.operators.Dedup

/** Streaming near-duplicate detection — the stream twin of the batch
  * MinHash-LSH candidate join, completing the dedup family's streaming
  * story (exact dedup streams via dropDuplicatesWithinWatermark; this
  * streams the NEAR-dup candidate stage).
  *
  * Each incoming doc's 8 LSH band keys are computed in one narrow
  * projection ([[Dedup.bandKeysNarrow]] — per-row signature, no
  * aggregation, so it runs on an unbounded stream exactly as the batch
  * math). Per (band, bh) bucket, keyed state holds the first
  * `maxOccupants` distinct occupants (doc_id, arrival ts) — O(cap) per
  * ACTIVE bucket, purged by event-time TTL — and every doc hitting the
  * bucket emits one collision per stored EARLIER occupant. Up to the
  * cap, the bucket's candidate set is the full prefix CLIQUE: identical
  * to the batch self-join restricted to the already-seen window, so a
  * true near-dup pair is produced even when the bucket's first occupant
  * was a false positive. Past the cap the bucket is a degenerate hot
  * bucket (a boilerplate shingle row, the same pathology the batch side
  * caps with `maxDf`): an overflow doc still emits collisions against
  * all `maxOccupants` stored docs — so it joins the bucket's duplicate
  * COMPONENT — but is not retained, so pairs between two overflow docs
  * are not produced. That truncation is the price of bounded state.
  *
  * Semantics vs batch: the stream sees a PREFIX window — a doc pairs
  * with earlier docs only (the batch self-join's `doc_a < doc_b`
  * canonicalization, with arrival order standing in for id order), and a
  * bucket idle past `ttlMs` forgets its occupants (the standard
  * streaming-dedup window trade; batch parity on an in-window in-order
  * feed is pinned in StatefulOpsSpec, including the three-copy clique).
  */
object DocStream {

  case class StreamDoc(ts: Timestamp, doc_id: Long, text: String)
  case class BandHit(ts: Timestamp, doc_id: Long, band: Long, bh: Long)
  case class OccEntry(docId: Long, tsMs: Long)
  case class Occupants(docs: List[OccEntry], maxTsMs: Long)
  case class Collision(doc_id: Long, band: Long, bh: Long, earlier_doc_id: Long)

  /** Streaming twin of the incremental-merge CANDIDATE stage
    * ([[graft.operators.Dedup.incrementCandidates]]' cross half): new
    * docs stream in, band keys compute per row (the narrow
    * [[graft.operators.Dedup.bandKeysNarrow]] formulation), and a
    * STREAM-STATIC equi-join on (band, bh) against the PERSISTED base
    * band store ([[graft.operators.Dedup.dedupIndexFor]]) emits
    * (doc_new, doc_ref) candidates as they arrive — the arrival-time
    * spelling of the daily-crawl merge, with the exact verify staying a
    * batch job over the day's accumulated candidates (as in the batch
    * op). Zero streaming state: the static side needs no watermark, and
    * the store is re-planned per micro-batch, so a compaction
    * generation roll is picked up on the next batch without restarting
    * the query. The base side joins SHUFFLE_HASH on the bucket key
    * (corpus-sized parquet store, never broadcast). Emissions may
    * repeat per colliding band — the downstream verify's distinct
    * absorbs them, mirroring the batch candidate `distinct()`.
    */
  def crossCandidates(docs: Dataset[StreamDoc],
      baseBands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.toDF()
      .select(col("doc_id").as("doc_new"),
        explode(Dedup.bandKeysNarrow(col("text"))).as("k"))
      .filter(col("k.bh").isNotNull)
      .select(col("doc_new"), col("k.band").as("band"), col("k.bh").as("bh"))
      .join(baseBands.select(col("doc_id").as("doc_ref"), col("band"), col("bh"))
        .hint("shuffle_hash"), Seq("band", "bh"))
      .select(col("doc_new"), col("doc_ref"))

  def lshCollisions(spark: SparkSession, docs: Dataset[StreamDoc],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 24L * 3600000L,
      maxOccupants: Int = 8): Dataset[Collision] = {
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
        (key: (Long, Long), batch: Iterator[BandHit], state: GroupState[Occupants]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // within a batch events process in (ts, doc_id) order — the
            // batch join's canonical ordering, so same-batch pairs emit
            // with the earlier-arriving doc as earlier_doc_id
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
            var occ = state.getOption.getOrElse(Occupants(Nil, Long.MinValue))
            val out = Seq.newBuilder[Collision]
            for (e <- evs) {
              if (!occ.docs.exists(_.docId == e.doc_id)) {
                // one collision per stored earlier occupant: the full
                // prefix clique up to the cap, not just the first occupant
                occ.docs.foreach(o =>
                  out += Collision(e.doc_id, key._1, key._2, o.docId))
                if (occ.docs.size < maxOccupants)
                  occ = occ.copy(docs = occ.docs :+ OccEntry(e.doc_id, e.ts.getTime))
              } // else: doc re-seen — no self-pairs, no duplicate entry
              occ = occ.copy(maxTsMs = math.max(occ.maxTsMs, e.ts.getTime))
            }
            if (occ.docs.nonEmpty) {
              state.update(occ)
              // TTL anchored to the bucket's own latest activity, clamped
              // above the watermark (Spark throws on a below-watermark
              // timeout; same discipline as StatefulOps)
              state.setTimeoutTimestamp(
                math.max(occ.maxTsMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** [[lshCollisions]] on the Spark 4 `transformWithState` API — the
    * migration the README verdict earmarked once `typeCountsTws` had
    * proven the MapState mechanics. The bucket's occupant list becomes a
    * MapState(docId → arrivalMs): admitting an occupant writes ONE map
    * entry (its own RocksDB store key) instead of re-serializing the
    * whole packed list — the very reason to migrate a high-fan-in bucket
    * state — and membership checks are point lookups. The TTL maps onto
    * an explicit event-time timer re-anchored to the bucket's latest
    * activity (delete-old + register-new, stale firings recognized via
    * the stored expiry instant — the house timer discipline), replacing
    * fMGWS's single implicit timeout slot. Requires the RocksDB state
    * store provider (state-v2 format); semantics are batch-for-batch
    * identical to [[lshCollisions]] — prefix-clique emission up to
    * `maxOccupants`, no self-pairs, idle buckets forgotten past `ttlMs`
    * — and the parity/cap/TTL suite runs both twins.
    *
    * fMGWS form retained: it runs on the default HDFS-backed store
    * (no provider opt-in), which keeps the operator usable on clusters
    * that have not enabled RocksDB; this twin is the forward path.
    */
  def lshCollisionsTws(spark: SparkSession, docs: Dataset[StreamDoc],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 24L * 3600000L,
      maxOccupants: Int = 8): Dataset[Collision] = {
    import spark.implicits._
    val hits = docs.toDF()
      .select(col("ts"), col("doc_id"),
        explode(Dedup.bandKeysNarrow(col("text"))).as("k"))
      .filter(col("k.bh").isNotNull)
      .select(col("ts"), col("doc_id"), col("k.band").as("band"),
        col("k.bh").as("bh"))
      .as[BandHit]
    hits
      .withWatermark("ts", watermarkDelay)
      .groupByKey(h => (h.band, h.bh))
      .transformWithState(new LshBucketProcessor(ttlMs, maxOccupants),
        TimeMode.EventTime, OutputMode.Append)
  }

  /** Shared bucket-clique mechanics for the transformWithState twins:
    * MapState(docId → arrivalMs) per bucket key, prefix-clique emission
    * up to `maxOccupants`, re-anchored event-time timer TTL. Subclasses
    * supply the input accessors and the output row — the state layout
    * and emission rule are ONE implementation, so the LSH-band and
    * winnow-fingerprint twins cannot drift.
    *
    * TOMBSTONES ([[isTombstone]], default never): a delete event for a
    * stored occupant is ONE `removeKey` point-delete on the bucket map
    * (the per-entry state layout is exactly why this is cheap — the
    * fMGWS packed-list form would re-serialize the whole bucket), frees
    * its cap slot for later admissions, and emits nothing. Append
    * streams cannot retract, so pairs emitted BEFORE the tombstone
    * stand — the batch-side takedown ops
    * ([[graft.operators.Dedup.deleteClusters]]) own retroactive
    * cleanup; the stream's contract is that no FUTURE pair involves a
    * tombstoned doc AS OF the delete's event time.
    *
    * The contract must hold across micro-batch REORDERING inside the
    * watermark, so tombstones leave MEMORY: a per-bucket
    * MapState(docId → deleteTsMs) retains each delete until the bucket's
    * TTL timer fires (expiry ≥ latest-activity + ttl > deleteTs, and the
    * operator's own watermark delay ≪ ttl, so the watermark has passed
    * every retained delete's event time by then — the exact retention
    * rule the contract needs). An add event whose event time is ≤ the
    * recorded deleteTs is REJECTED (no admission, no emission): it is
    * logically before the delete, arriving late — without the memory it
    * would re-admit the deleted doc and future pairs would name it. A
    * tombstone arriving BEFORE its add (same reordering, other
    * direction) is recorded, not dropped, and blocks that add when it
    * shows up. An add strictly AFTER the delete's event time is a
    * re-publication and admits normally. Tombstone state is O(deletes
    * within one TTL window) per bucket — same order as the occupant
    * map's bound in any real feed.
    */
  private abstract class CliqueProcessor[K, I, O](ttlMs: Long, maxOccupants: Int)
      extends StatefulProcessor[K, I, O] {
    protected def docIdOf(i: I): Long
    protected def tsMsOf(i: I): Long
    protected def isTombstone(i: I): Boolean = false
    protected def emit(key: K, doc: Long, earlier: Long): O

    @transient private var occupants: MapState[Long, Long] = _ // docId → tsMs
    @transient private var tombstones: MapState[Long, Long] = _ // docId → deleteTsMs
    @transient private var nOcc: ValueState[Int] = _    // occupant count (≤ cap)
    @transient private var maxTs: ValueState[Long] = _  // bucket's latest activity
    @transient private var expiry: ValueState[Long] = _ // registered timer instant

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // timers, not TTLConfig: the config clock is processing-time-relative,
      // the wrong clock for replayable feeds (same choice as EwmaProcessor)
      occupants = getHandle.getMapState[Long, Long](
        "occupants", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      tombstones = getHandle.getMapState[Long, Long](
        "tombstones", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      nOcc = getHandle.getValueState[Int]("nocc", Encoders.scalaInt, TTLConfig.NONE)
      maxTs = getHandle.getValueState[Long]("maxts", Encoders.scalaLong, TTLConfig.NONE)
      expiry = getHandle.getValueState[Long]("expiry", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[I],
        tv: TimerValues): Iterator[O] = {
      // same in-batch canonical order as the fMGWS twin: earlier (ts, id)
      // plays the batch join's earlier_doc_id role for same-batch pairs;
      // a same-instant add+delete of one doc resolves delete-last
      val evs = rows.toSeq.sortBy(e => (tsMsOf(e), docIdOf(e), isTombstone(e)))
      var n = if (nOcc.exists()) nOcc.get() else 0
      var mts = if (maxTs.exists()) maxTs.get() else Long.MinValue
      val out = Seq.newBuilder[O]
      for (e <- evs) {
        val id = docIdOf(e)
        val ts = tsMsOf(e)
        if (isTombstone(e)) {
          // record the delete's event time (keep the latest — a doc
          // deleted twice is blocked up to the later instant), then the
          // point-delete: one store entry removed, cap slot freed, no
          // emission (pairs already emitted stand — append semantics)
          val prev =
            if (tombstones.containsKey(id)) tombstones.getValue(id)
            else Long.MinValue
          if (ts > prev) tombstones.updateValue(id, ts)
          if (occupants.containsKey(id)) {
            occupants.removeKey(id)
            n -= 1
          }
        } else {
          val delTs =
            if (tombstones.containsKey(id)) tombstones.getValue(id)
            else Long.MinValue
          if (ts <= delTs) {
            // out-of-order add (event time at-or-before a recorded
            // delete, arriving later but inside the watermark): logically
            // deleted — reject outright, no admission AND no emission
          } else if (!occupants.containsKey(id)) {
            // full prefix clique up to the cap: one collision per STORED
            // occupant (map iteration order is irrelevant — pair SET parity)
            occupants.iterator().foreach { p =>
              out += emit(key, id, p._1)
            }
            if (n < maxOccupants) {
              occupants.updateValue(id, ts) // ONE entry written
              n += 1
            }
          } // else: doc re-seen — no self-pairs, no duplicate entry
        }
        mts = math.max(mts, ts)
      }
      val hasTombs = tombstones.iterator().hasNext
      if (n > 0 || hasTombs) {
        if (n > 0) nOcc.update(n)
        else {
          // no occupants, but pending tombstones must outlive them: keep
          // the bucket alive on the timer until their retention passes
          occupants.clear(); nOcc.clear()
        }
        maxTs.update(mts)
        val newExpiry = math.max(mts + ttlMs, tv.getCurrentWatermarkInMs + 1)
        if (expiry.exists() && expiry.get() != newExpiry)
          getHandle.deleteTimer(expiry.get())
        getHandle.registerTimer(newExpiry)
        expiry.update(newExpiry)
      } else {
        // bucket emptied and nothing pending: drop every state var and the
        // registered timer — an empty bucket must cost nothing
        occupants.clear(); nOcc.clear(); maxTs.clear(); tombstones.clear()
        if (expiry.exists()) {
          getHandle.deleteTimer(expiry.get())
          expiry.clear()
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[O] = {
      // expiry ≥ latest-activity + ttl > every retained deleteTs, and the
      // watermark has reached expiry for the timer to fire — so each
      // tombstone's keep-until-watermark-passes window is over
      if (expiry.exists() && expiry.get() == info.getExpiryTimeInMs) {
        occupants.clear(); nOcc.clear(); maxTs.clear(); expiry.clear()
        tombstones.clear()
      }
      Iterator.empty
    }
  }

  private class LshBucketProcessor(ttlMs: Long, maxOccupants: Int)
      extends CliqueProcessor[(Long, Long), BandHit, Collision](ttlMs, maxOccupants) {
    override protected def docIdOf(i: BandHit): Long = i.doc_id
    override protected def tsMsOf(i: BandHit): Long = i.ts.getTime
    override protected def emit(key: (Long, Long), doc: Long, earlier: Long): Collision =
      Collision(doc, key._1, key._2, earlier)
  }

  case class DocOp(ts: Timestamp, doc_id: Long, text: String, deleted: Boolean)
  case class BandOp(ts: Timestamp, doc_id: Long, band: Long, bh: Long,
    deleted: Boolean)

  /** [[lshCollisionsTws]] over a CDC feed carrying TOMBSTONES — the
    * streaming half of the takedown story ([[graft.operators.Dedup
    * .deleteClusters]] is the batch half): a delete op removes its doc
    * from every bucket it occupies via MapState point-deletes (the
    * tombstone carries the text, as a CDC before-image does — an LSH
    * entry can only be located by re-deriving its band keys, the same
    * reason FAISS `remove_ids` needs the stored vectors), frees the cap
    * slots, and guarantees no FUTURE pair involves the doc as of the
    * delete's event time — ACROSS micro-batch reordering inside the
    * watermark too: the shared [[CliqueProcessor]] retains each delete's
    * event time until the bucket TTL passes it, so a late-arriving add
    * that is logically before the delete is rejected rather than
    * re-admitted (and a tombstone arriving before its add blocks it).
    * Pairs emitted before the tombstone stand (append streams cannot
    * retract); retroactive cleanup is the batch delete ops' job. A
    * bucket emptied by tombstones keeps only the tombstone memory until
    * its timer fires, then drops all state.
    */
  def lshCollisionsCdc(spark: SparkSession, ops: Dataset[DocOp],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 24L * 3600000L,
      maxOccupants: Int = 8): Dataset[Collision] = {
    import spark.implicits._
    val hits = ops.toDF()
      .select(col("ts"), col("doc_id"), col("deleted"),
        explode(Dedup.bandKeysNarrow(col("text"))).as("k"))
      .filter(col("k.bh").isNotNull)
      .select(col("ts"), col("doc_id"), col("k.band").as("band"),
        col("k.bh").as("bh"), col("deleted"))
      .as[BandOp]
    hits
      .withWatermark("ts", watermarkDelay)
      .groupByKey(h => (h.band, h.bh))
      .transformWithState(new LshCdcProcessor(ttlMs, maxOccupants),
        TimeMode.EventTime, OutputMode.Append)
  }

  private class LshCdcProcessor(ttlMs: Long, maxOccupants: Int)
      extends CliqueProcessor[(Long, Long), BandOp, Collision](ttlMs, maxOccupants) {
    override protected def docIdOf(i: BandOp): Long = i.doc_id
    override protected def tsMsOf(i: BandOp): Long = i.ts.getTime
    override protected def isTombstone(i: BandOp): Boolean = i.deleted
    override protected def emit(key: (Long, Long), doc: Long, earlier: Long): Collision =
      Collision(doc, key._1, key._2, earlier)
  }

  case class FpHit(ts: Timestamp, doc_id: Long, h: Long)
  case class FpOp(ts: Timestamp, doc_id: Long, h: Long, deleted: Boolean)
  case class WinnowCand(doc_id: Long, h: Long, earlier_doc_id: Long)

  /** [[winnowCandidatesTws]] over a CDC feed carrying TOMBSTONES — the
    * winnow-side sibling of [[lshCollisionsCdc]], riding the SAME
    * [[CliqueProcessor]] tombstone hook (one factored implementation:
    * the two twins' delete semantics cannot drift). The tombstone
    * carries the text before-image so the doc's fingerprint buckets can
    * be re-derived; each is a MapState point-delete that frees a cap
    * slot, and an emptied bucket drops all state + its timer. Contract
    * as the LSH sibling: candidates emitted before the tombstone stand;
    * no FUTURE candidate names a tombstoned doc.
    */
  def winnowCandidatesCdc(spark: SparkSession, ops: Dataset[DocOp],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 24L * 3600000L,
      maxOccupants: Int = 8): Dataset[WinnowCand] = {
    import spark.implicits._
    val hits = ops.toDF()
      .select(col("ts"), col("doc_id"), col("deleted"),
        explode(graft.operators.TextAnalysis
          .winnowFingerprintsNarrow(col("text"))).as("h"))
      .as[FpOp]
    hits
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.h)
      .transformWithState(new WinnowCdcProcessor(ttlMs, maxOccupants),
        TimeMode.EventTime, OutputMode.Append)
  }

  private class WinnowCdcProcessor(ttlMs: Long, maxOccupants: Int)
      extends CliqueProcessor[Long, FpOp, WinnowCand](ttlMs, maxOccupants) {
    override protected def docIdOf(i: FpOp): Long = i.doc_id
    override protected def tsMsOf(i: FpOp): Long = i.ts.getTime
    override protected def isTombstone(i: FpOp): Boolean = i.deleted
    override protected def emit(key: Long, doc: Long, earlier: Long): WinnowCand =
      WinnowCand(doc, key, earlier)
  }

  /** Streaming winnow/containment CANDIDATE stage — the stream twin of
    * [[Dedup.winnowPairs]]' fingerprint equi-join, the last batch-only
    * dedup family member. Each doc's winnow fingerprints are computed in
    * one narrow projection ([[graft.operators.TextAnalysis
    * .winnowFingerprintsNarrow]] — per-row windowed-min over the fused
    * shingle array, no aggregation, so it runs on an unbounded stream);
    * per fingerprint-hash bucket, the shared [[CliqueProcessor]]
    * mechanics hold the first `maxOccupants` occupants with event-time
    * TTL and emit one candidate per stored earlier occupant.
    *
    * Semantics vs batch, same contract as [[lshCollisions]]: prefix
    * window (a doc pairs with EARLIER docs only), distinct (doc_a,
    * doc_b) pairs equal the batch `winnowPairs(minShared = 1)` pair set
    * on an in-window in-order feed whose fingerprint document
    * frequencies stay within both caps (batch `maxDf` drops hot
    * fingerprints ENTIRELY; the stream instead truncates a hot bucket at
    * `maxOccupants` — overflow docs still pair with the stored prefix,
    * joining the bucket's component, but are not retained, so
    * overflow×overflow pairs are not produced: bounded state's price,
    * identical to the LSH twin's cap rule). Downstream, a `minShared ≥
    * 2` consumer aggregates candidate counts per pair exactly as the
    * batch `groupBy(doc_a, doc_b)` does. Requires the RocksDB state
    * store (state-v2), like every tws twin.
    */
  def winnowCandidatesTws(spark: SparkSession, docs: Dataset[StreamDoc],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 24L * 3600000L,
      maxOccupants: Int = 8): Dataset[WinnowCand] = {
    import spark.implicits._
    val hits = docs.toDF()
      .select(col("ts"), col("doc_id"),
        explode(graft.operators.TextAnalysis
          .winnowFingerprintsNarrow(col("text"))).as("h"))
      .as[FpHit]
    hits
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.h)
      .transformWithState(new WinnowBucketProcessor(ttlMs, maxOccupants),
        TimeMode.EventTime, OutputMode.Append)
  }

  private class WinnowBucketProcessor(ttlMs: Long, maxOccupants: Int)
      extends CliqueProcessor[Long, FpHit, WinnowCand](ttlMs, maxOccupants) {
    override protected def docIdOf(i: FpHit): Long = i.doc_id
    override protected def tsMsOf(i: FpHit): Long = i.ts.getTime
    override protected def emit(key: Long, doc: Long, earlier: Long): WinnowCand =
      WinnowCand(doc, key, earlier)
  }

  /** Streaming twin of the count–min sketch
    * ([[graft.operators.TextAnalysis.cmsSketch]]): because CMS cells are
    * plain SUMS, the sketch streams through Spark's built-in incremental
    * aggregation with ZERO custom state — each micro-batch's tokens fan
    * out ×D to their cells (the shared
    * [[graft.operators.TextAnalysis.cmsCellsOf]] derivation, so batch
    * and stream run the same expression tree) and the grouped count
    * updates in place. Run in Update mode: each batch emits only the
    * cells it touched, and the LATEST emission per cell is the sketch —
    * exactly the cell-wise-merge law the batch spec pins
    * (sketch(A ∪ B) = sketch(A) + sketch(B)). Streaming state is the
    * ≤ D·W cell table itself: CONSTANT for any stream length, no
    * watermark, no TTL — the property that makes CMS the right
    * frequency summary for an unbounded 100-TB token feed.
    */
  def cmsCells(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.operators.TextAnalysis.cmsCellsOf(
      docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming twin of [[graft.operators.Classifier.score]]: apply a
    * FROZEN trained weight vector (from a batch fit — the standard
    * train-offline / score-online split) to a document stream. Because
    * featurization is the fused per-row [[graft.expressions.HashedTf]]
    * (no explode, no per-doc aggregation), scoring is a stateless
    * narrow projection: it runs on an unbounded append stream with ZERO
    * state, no watermark, and batch-identical arithmetic — the twin is
    * the same physical expression tree, not a reimplementation
    * (batch ≡ stream parity pinned in ClassifierStreamSpec).
    */
  def scoreDocs(docs: org.apache.spark.sql.DataFrame,
      wq: Array[Long]): org.apache.spark.sql.DataFrame = {
    import graft.operators.Classifier
    val w = array(wq.map(q => lit(q / Classifier.Q)): _*)
    docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("x", graft.expressions.HashedTf.hashed_tf(
        col("toks"), Classifier.NumBuckets, Classifier.FeatScale))
      .withColumn("z", graft.functions.VectorFunctions.dot(w, col("x")))
      .select(col("doc_id"),
        round(col("z") * Classifier.Q).cast("long").as("score_q"),
        when(col("z") > 0, 1L).otherwise(0L).as("pred"))
  }


  /** Streaming twin of [[graft.operators.Classifier.conformalGate]]'s
    * serving side: the batch calibration freezes (weights, t_q) — the
    * conformal threshold is a trained artifact exactly like the
    * classifier weights or the Bloom sketch — and the stream applies
    * the SAME ties-keep gate (score_q ≥ t_q) as one more stateless
    * narrow projection on top of [[scoreDocs]]. The finite-sample
    * guarantee transfers to the stream for free: conformal validity is
    * a property of the FROZEN threshold vs exchangeable future points,
    * not of where the future points arrive — which is precisely why
    * production conformal systems calibrate offline and serve online.
    * Zero state, no watermark, batch-identical integers (parity pinned
    * in ConformalSpec).
    */
  def conformalGateDocs(docs: org.apache.spark.sql.DataFrame,
      wq: Array[Long], tQ: Long): org.apache.spark.sql.DataFrame =
    scoreDocs(docs, wq)
      .select(col("doc_id"), col("score_q"),
        (col("score_q") >= tQ).as("keep"))

  /** Streaming twin of [[graft.operators.Classifier.langConfusion]]'s
    * scoring side: FROZEN multiclass weights (from the batch one-vs-rest
    * fit) applied to a document stream. Featurization is the same fused
    * stateless-narrow [[graft.expressions.HashedTf]] pass as
    * [[scoreDocs]], the C decision scores are broadcast-literal dots,
    * and the argmax tie-breaks to first class order exactly as batch —
    * zero state, no watermark, batch-identical arithmetic (parity
    * pinned in ClassifierStreamSpec).
    */
  def langOfDocs(docs: org.apache.spark.sql.DataFrame,
      wq: Array[Long],
      langs: Seq[String] = graft.operators.Classifier.Langs)
      : org.apache.spark.sql.DataFrame = {
    import graft.operators.Classifier
    val zCols = langs.indices.map { c =>
      val wCol = array((0 until Classifier.Dims)
        .map(j => lit(wq(c * Classifier.Dims + j) / Classifier.Q)): _*)
      graft.functions.VectorFunctions.dot(wCol, col("x"))
    }
    docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("x", graft.expressions.HashedTf.hashed_tf(
        col("toks"), Classifier.NumBuckets, Classifier.FeatScale))
      .withColumn("zs", array(zCols: _*))
      .withColumn("pi", expr("array_position(zs, array_max(zs))"))
      .select(col("doc_id"),
        element_at(array(langs.map(lit): _*), col("pi").cast("int"))
          .as("pred_lang"),
        round(expr("array_max(zs)") * Classifier.Q).cast("long").as("top_z_q"))
  }

  case class KeyedDoc(cls: Long, doc_id: Long, skey: Double)
  case class SampleCand(cls: Long, doc_id: Long, skey: Double)

  /** Streaming twin of the weighted-sample SELECTION stage
    * ([[graft.operators.Curation.weightedSample]]): documents stream
    * in, each computes its deterministic sequential-Poisson priority
    * key as a narrow map (the same arithmetic as batch — the key is a
    * pure content function, so arrival order is irrelevant), routes to
    * one of `classes` hash classes by doc_id, and each class holds its
    * n SMALLEST keys in MapState — a distributed streaming reservoir
    * with O(classes·n) CONSTANT state, no watermark, no TTL. Each
    * micro-batch re-emits the winner set of every class that received
    * input; the global n winners are EXACTLY the n smallest of the
    * ≤ classes·n candidate union (a class retains every doc that is a
    * global winner, because a global winner is a fortiori a winner of
    * its own class) — the heavyCandidates superset discipline, here
    * exact rather than probabilistic, so the batch-side refine is a
    * bounded sort (spec-pinned ≡ the batch sample).
    */
  def sampleCandidates(spark: SparkSession, docs: Dataset[StreamDoc],
      n: Int = 200, classes: Int = 32): Dataset[SampleCand] = {
    import spark.implicits._
    docs.toDF()
      .select(col("doc_id"),
        (pmod(graft.functions.TextFunctions.stringHash(col("text")) *
          lit(2654435761L) + lit(104729L),
          lit(graft.functions.TextFunctions.P)) + lit(1L)).as("u"),
        (size(graft.functions.TextFunctions.tokens(col("text"))) + 1)
          .cast("long").as("w_tok"))
      .select(pmod(col("doc_id"), lit(classes.toLong)).as("cls"), col("doc_id"),
        (col("u").cast("double") / col("w_tok").cast("double")).as("skey"))
      .as[KeyedDoc]
      .groupByKey(_.cls)
      .transformWithState(new ReservoirProcessor(n), TimeMode.None(),
        OutputMode.Append())
  }

  private class ReservoirProcessor(n: Int)
      extends StatefulProcessor[Long, KeyedDoc, SampleCand] {
    @transient private var winners: MapState[Long, Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      winners = getHandle.getMapState[Long, Double](
        "res", Encoders.scalaLong, Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedDoc],
        tv: TimerValues): Iterator[SampleCand] = {
      // ≤ n entries: load once, fold the batch in memory, write back —
      // the MgProcessor state discipline
      val m = scala.collection.mutable.HashMap.empty[Long, Double]
      winners.iterator().foreach { case (id, k) => m.update(id, k) }
      def worst: (Long, Double) =
        m.iterator.maxBy { case (id, k) => (k, id) }
      rows.foreach { d =>
        m.get(d.doc_id) match {
          // already-stored doc seen again (at-least-once redelivery, or a
          // re-crawled doc): refine IN PLACE — never the evict path, which
          // would shrink the reservoir to n−1 and permanently drop a
          // legitimate winner. MIN composition: an exact redelivery
          // (same content → same key) is a no-op, and a re-crawled doc
          // keeps its best draw, so the fold is deterministic under any
          // redelivery order (inclusion never regresses).
          case Some(prev) =>
            if (d.skey < prev) m.update(d.doc_id, d.skey)
          case None if m.size < n => m.update(d.doc_id, d.skey)
          case None =>
            val (wid, wk) = worst
            if (d.skey < wk || (d.skey == wk && d.doc_id < wid)) {
              m.remove(wid)
              m.update(d.doc_id, d.skey)
            }
        }
      }
      winners.clear()
      m.foreach { case (id, k) => winners.updateValue(id, k) }
      m.iterator.map { case (id, k) => SampleCand(key, id, k) }.toSeq.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SampleCand] = Iterator.empty
  }

  /** Streaming twin of [[graft.operators.Curation.domainPrior]]'s
    * counting stage: per-source (n_docs, n_pass) Gopher-rule counters
    * over a document stream — the rules are a pure narrow map
    * ([[graft.operators.TextAnalysis.gopherRules]], the same expression
    * tree as batch), so the counters stream through built-in
    * incremental aggregation with ZERO custom state (the cmsCells
    * pattern): run in Update mode, each batch re-emits only the sources
    * it touched, and the LATEST emission per source is the counter
    * table. The Beta smoothing is applied AT READ over these counters
    * plus the 1-row global moment (both \|sources\|-bounded) — the
    * prior itself needs no streaming state. State = the \|sources\|-row
    * counter table: constant for any stream length.
    */
  def domainCounters(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.operators.TextAnalysis.gopherRules(docs, passthrough = Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))

  /** Streaming decontamination gate — the ingest-time twin of
    * [[graft.operators.TextAnalysis.contaminatedBloom]]: a FROZEN Bloom
    * sketch of the eval split's shingles (trained batch-side by
    * [[graft.operators.TextAnalysis.evalBloomBytes]], a bounded
    * artifact) rides the stream as a literal, and each arriving doc is
    * flagged by ONE narrow `exists(shingle_hashes(text), might_contain)`
    * projection — zero state, no watermark, no shuffle, the same
    * frozen-artifact apply discipline as [[scoreDocs]]. Superset
    * semantics inherited from the sketch: no contaminated doc ever
    * passes unflagged; over-flags at the filter's FPR go to the exact
    * recheck, which is a BATCH job over the (tiny) flagged set. Parity
    * with the batch gate is spec-pinned doc-for-doc.
    */
  def bloomGate(docs: org.apache.spark.sql.DataFrame,
      bloomBytes: Array[Byte]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.types.BinaryType
    docs.select(col("doc_id"),
      exists(graft.expressions.ShingleHashes.shingle_hashes(col("text")),
        x => bridge.column(BloomFilterMightContain(
          Literal(bloomBytes, BinaryType), bridge.expression(x))))
        .as("bloom_hit"))
  }

  /** Streaming twin of the unigram tokenizer's SERVING side
    * ([[graft.operators.Unigram.unigramEncode]]): the trained vocabulary
    * (≤ vocabV + |chars| pieces, the bounded artifact class) rides as a
    * frozen map LITERAL, and every incoming doc's words are
    * Viterbi-segmented directly by the SAME DP expression the trainer
    * uses, inside a `transform` lambda — one stateless narrow pass,
    * zero joins, zero state, no watermark (the langOfDocs posture).
    *
    * Contract vs batch: for words INSIDE the batch training dictionary
    * the per-word piece count is identical (same vocab, same DP, same
    * tie rules — parity spec-pinned); for words OUTSIDE it the batch
    * apply costs the conservative character fallback while this twin
    * runs the true Viterbi, so stream n_subwords ≤ batch n_subwords
    * always (also pinned) — the stream twin serves unseen words BETTER
    * than the batch join path, which is exactly what a tokenizer
    * serving a live crawl needs.
    */
  def unigramEncodeDocs(docs: org.apache.spark.sql.DataFrame,
      vocab: Map[String, Double],
      maxLen: Int = graft.operators.Unigram.MaxLen)
      : org.apache.spark.sql.DataFrame = {
    // A word containing a character OUTSIDE the trained alphabet has no
    // Viterbi path at all — the DP returns seg = '' and size(split('',
    // ' ')) would silently count it as ONE piece. Fall back to
    // length(w) (the batch path's conservative character fallback) so
    // the documented stream ≤ batch n_subwords invariant holds by
    // construction, not by accident of an under-count. The seg is
    // computed once per word (transform into a struct), not re-evaluated
    // inside the branch.
    val vit = graft.operators.Unigram.viterbiExprFor("w", maxLen)
    docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("vm", typedLit(vocab))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_subwords",
        expr(s"""aggregate(
                |  transform(toks, w -> named_struct('l', length(w), 's', $vit)),
                |  0,
                |  (a, x) -> a + IF(x.s = '', x.l, size(split(x.s, ' '))))""".stripMargin)
          .cast("long"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        (col("n_subwords").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }

  case class ShingleHit(source: String, h: Long)
  case class KmvEntry(source: String, h: Long)

  /** Streaming twin of the KMV/theta sketch
    * ([[graft.operators.TextAnalysis.kmvSketch]]): per-source bottom-k
    * shingle-hash sketches maintained incrementally — a bottom-k sketch
    * is an order statistic, so it folds one element at a time with NO
    * window (min is associative/commutative/idempotent): each incoming
    * doc's shingle hashes either displace the current k-th minimum or
    * are discarded. A redelivered or re-crawled doc contributes hashes
    * already in the sketch — idempotent by construction, the
    * at-least-once safety the reservoir twin needed explicit in-place
    * refinement for.
    *
    * State: exactly min(k, distinct-hashes) entries per source —
    * CONSTANT for any stream length, no watermark, no TTL (a crawl
    * sketch must outlive any window; takedown-aware rebuilds go through
    * the batch path, where the delete family lives). Each batch emits
    * the sketch rows it now holds (Append; downstream keeps the latest
    * emission per source, the reservoir twin's read contract), so after
    * any prefix of batches the emitted sketch ≡ the batch
    * [[graft.operators.TextAnalysis.kmvSketchOf]] over the prefix's
    * docs (spec-pinned), and the union/intersection estimators read it
    * unchanged.
    */
  def kmvCandidates(spark: SparkSession,
      docs: Dataset[(String, String)], // (source, text)
      k: Int = graft.operators.TextAnalysis.KmvK): Dataset[KmvEntry] = {
    import spark.implicits._
    docs.toDF("source", "text")
      .select(col("source"),
        explode(graft.expressions.ShingleHashes.shingle_hashes(col("text"))).as("h"))
      .as[ShingleHit]
      .groupByKey(_.source)
      .transformWithState(new KmvProcessor(k), TimeMode.None(),
        OutputMode.Append())
  }

  private class KmvProcessor(k: Int)
      extends StatefulProcessor[String, ShingleHit, KmvEntry] {
    @transient private var mins: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mins = getHandle.getMapState[Long, Long](
        "kmv", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ShingleHit],
        tv: TimerValues): Iterator[KmvEntry] = {
      // ≤ k entries: load once, fold the batch in memory, write back
      // (the MgProcessor/ReservoirProcessor state discipline)
      val m = scala.collection.mutable.SortedSet.empty[Long]
      mins.iterator().foreach { case (h, _) => m.add(h) }
      rows.foreach { r =>
        if (!m.contains(r.h)) {
          if (m.size < k) { m.add(r.h); () }
          else if (r.h < m.last) { m.remove(m.last); m.add(r.h); () }
        }
      }
      mins.clear()
      m.foreach(h => mins.updateValue(h, h))
      m.iterator.map(h => KmvEntry(key, h)).toSeq.iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[KmvEntry] = Iterator.empty
  }

  case class HllTok(source: String, bucket: Long, rho: Long)
  case class HllCell(source: String, bucket: Long, rho: Long)

  /** Streaming twin of the HyperLogLog registers
    * ([[graft.operators.TextAnalysis.hllRegisters]]): per-source
    * bucket→max-rho cells maintained incrementally — max is
    * associative, commutative and IDEMPOTENT, so cells fold one token
    * at a time with NO window, no watermark, no TTL (the [[kmvCandidates]]
    * posture), and a redelivered doc's tokens can only re-assert maxima
    * the registers already hold: at-least-once safe by construction.
    * State: ≤ m cells per source — CONSTANT for any stream length. Each
    * batch emits the full register set it now holds (Append; downstream
    * keeps the latest emission, the KMV read contract), so after any
    * prefix of batches the emitted registers ≡ the batch
    * [[graft.operators.TextAnalysis.hllRegistersOf]] over the prefix's
    * docs (spec-pinned) and [[graft.operators.TextAnalysis.hllMerge]] /
    * the estimator read them unchanged.
    */
  def hllUpdates(spark: SparkSession,
      docs: Dataset[(String, String)]): Dataset[HllCell] = {
    import spark.implicits._
    graft.operators.TextAnalysis.hllCellsOf(
        docs.toDF("source", "text")
          .select(col("source"),
            explode(graft.functions.TextFunctions.tokens(col("text"))).as("w")))
      .as[HllTok]
      .groupByKey(_.source)
      .transformWithState(new HllProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  private class HllProcessor
      extends StatefulProcessor[String, HllTok, HllCell] {
    @transient private var regs: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      regs = getHandle.getMapState[Long, Long](
        "hll", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[HllTok],
        tv: TimerValues): Iterator[HllCell] = {
      // ≤ m cells: load once, fold the batch in memory, write back ONLY
      // the raised maxima (the KmvProcessor state discipline) — a
      // steady-state batch that raises nothing issues zero state-store
      // writes instead of m per source
      val m = scala.collection.mutable.Map.empty[Long, Long]
      regs.iterator().foreach { case (b, r) => m(b) = r }
      val raised = scala.collection.mutable.Set.empty[Long]
      rows.foreach { t =>
        if (t.rho > m.getOrElse(t.bucket, 0L)) { m(t.bucket) = t.rho; raised += t.bucket; () }
      }
      raised.foreach(b => regs.updateValue(b, m(b)))
      m.iterator.map { case (b, r) => HllCell(key, b, r) }.toSeq.iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[HllCell] = Iterator.empty
  }

  case class ManifestOp(ts: Timestamp, doc_id: Long, lang: String,
    h: Long, n_tokens: Long, deleted: Boolean)
  case class DiffEvent(doc_id: Long, lang: String, status: String,
    token_delta: Long)

  /** Streaming twin of the crawl snapshot diff
    * ([[graft.operators.Curation.snapshotDiff]]): manifest rows (doc_id,
    * lang, content hash, token count) arrive as a CDC stream — upserts
    * for every doc the new crawl carries, tombstones for takedowns — and
    * per-doc ValueState holds the LATEST known (lang, hash, tokens).
    * Each event emits its status incrementally: `added` when no state
    * exists, `unchanged`/`changed` by hash compare against the stored
    * manifest entry (the diff never needs the body — the batch op's
    * 100-TB contract, unchanged), `removed` on a tombstone for a known
    * doc (a tombstone for an unknown doc is a no-op, as the batch
    * full-outer join never makes a row for it). token_delta is the
    * doc's contribution to the epoch planner's net (new − old; removal
    * = −old), so Σ token_delta over any prefix of generations equals
    * the batch diff's conservation law.
    *
    * State: O(1) per doc_id — ONE manifest entry, the honest cost of a
    * manifest (a production deployment's state is corpus-sized by
    * definition; nothing grows with stream length or generation count).
    * No watermark: manifest state must outlive any window — generation
    * N+1 diffs against whenever generation N happened. Feeding
    * generation A as batch 1 and the A→B CDC ops as batch 2 reproduces
    * the batch `snapshotDiff` rollup exactly (spec-pinned), and the
    * per-doc statuses keep composing across generations B→C→…, which
    * the batch op would need a full re-diff per pair to answer.
    */
  def snapshotDiffCdc(spark: SparkSession,
      ops: Dataset[ManifestOp]): Dataset[DiffEvent] = {
    import spark.implicits._
    ops
      .groupByKey(_.doc_id)
      .transformWithState(new ManifestProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  private class ManifestProcessor
      extends StatefulProcessor[Long, ManifestOp, DiffEvent] {
    // (lang, hash, tokens) — the stored manifest entry
    @transient private var entry: ValueState[(String, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      entry = getHandle.getValueState[(String, Long, Long)](
        "manifest", Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ManifestOp],
        tv: TimerValues): Iterator[DiffEvent] = {
      // event-time order; a same-instant upsert+tombstone resolves
      // delete-last (the CliqueProcessor discipline)
      val evs = rows.toSeq.sortBy(e => (e.ts.getTime, e.deleted))
      val out = Seq.newBuilder[DiffEvent]
      for (e <- evs) {
        val cur: Option[(String, Long, Long)] =
          if (entry.exists()) Some(entry.get()) else None
        if (e.deleted) {
          cur.foreach { case (lang0, _, tok0) =>
            out += DiffEvent(e.doc_id, lang0, "removed", -tok0)
            entry.clear()
          } // unknown doc: no-op, as the batch join never rows it
        } else {
          cur match {
            case None =>
              out += DiffEvent(e.doc_id, e.lang, "added", e.n_tokens)
            case Some((_, h0, tok0)) =>
              val status = if (e.h == h0) "unchanged" else "changed"
              out += DiffEvent(e.doc_id, e.lang, status, e.n_tokens - tok0)
          }
          entry.update((e.lang, e.h, e.n_tokens))
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[DiffEvent] = Iterator.empty
  }

  case class TokRow(cls: Long, w: String)
  case class HeavyCand(cls: Long, w: String, cnt_lb: Long)

  /** Streaming twin of the heavy-hitter CANDIDATE stage
    * ([[graft.operators.TextAnalysis.heavyHitters]]'s pass 1): tokens
    * route to one of `classes` hash classes (the streaming stand-in for
    * batch partitions — PolyHash mod, so a word's class is stable), and
    * each class folds its token stream through a Misra–Gries summary
    * with `k` counters held in keyed state. State is O(classes·k)
    * CONSTANT — no watermark, no TTL, no growth with stream length —
    * which is the whole point: the exact streaming word count this
    * replaces needs state linear in the vocabulary.
    *
    * Each micro-batch emits the CURRENT survivor set (word,
    * lower-bound count) for every class that received input — a
    * refreshed candidate feed, superset of every word whose true count
    * in that class reaches N_cls/k (the batch op's pigeonhole chain,
    * unchanged: MG across micro-batches IS MG over the concatenated
    * stream). Like the batch op, candidates are order-dependent
    * internally but the GUARANTEE is order-free; the downstream exact
    * count pass (batch side) restores full determinism.
    */
  def heavyCandidates(spark: SparkSession, docs: Dataset[StreamDoc],
      k: Int = 64, classes: Int = 32): Dataset[HeavyCand] = {
    import spark.implicits._
    docs.toDF()
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .select((graft.expressions.PolyHash.poly_hash(col("w")) % classes).as("cls"),
        col("w"))
      .as[TokRow]
      .groupByKey(_.cls)
      .transformWithState(new MgProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  private class MgProcessor(k: Int)
      extends StatefulProcessor[Long, TokRow, HeavyCand] {
    @transient private var counters: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[String, Long](
        "mg", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TokRow],
        tv: TimerValues): Iterator[HeavyCand] = {
      // state is ≤ k entries: load once, fold the batch in memory, write
      // back the ≤ k survivors — point updates would cost O(k) RocksDB
      // writes per overflow token
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      counters.iterator().foreach { case (w, c) => m.update(w, c) }
      rows.foreach { r =>
        m.get(r.w) match {
          case Some(c) => m.update(r.w, c + 1)
          case None if m.size < k => m.update(r.w, 1L)
          case None =>
            val keys = m.keysIterator.toArray
            var i = 0
            while (i < keys.length) {
              val c = m(keys(i))
              if (c == 1L) m.remove(keys(i)) else m.update(keys(i), c - 1)
              i += 1
            }
        }
      }
      counters.clear()
      m.foreach { case (w, c) => counters.updateValue(w, c) }
      m.iterator.map { case (w, c) => HeavyCand(key, w, c) }.toSeq.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[HeavyCand] = Iterator.empty
  }

}
