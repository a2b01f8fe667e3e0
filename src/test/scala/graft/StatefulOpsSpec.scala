package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Event, UserUpdate}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState: running per-user stats with anomaly flag") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.runningUserStats(spark, ms.toDS(), flagFactor = 10.0)
      .writeStream.format("memory").queryName("ustats").outputMode("append").start()
    ms.addData(Seq(
      Event(ts("2024-01-01 00:00:00"), 1L, "click", 10.0),
      Event(ts("2024-01-01 00:01:00"), 1L, "click", 12.0),
      Event(ts("2024-01-01 00:02:00"), 1L, "click", 500.0), // > 10× running mean → flagged
      Event(ts("2024-01-01 00:00:30"), 2L, "click", 5.0)))
    q.processAllAvailable()
    // state persists across micro-batches: next event continues user 1's counts
    ms.addData(Seq(Event(ts("2024-01-01 00:03:00"), 1L, "click", 11.0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ustats").as[UserUpdate].collect()
    val u1 = rows.filter(_.user_id == 1L).sortBy(_.n)
    assert(u1.map(_.n).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(u1.map(_.flagged).toSeq === Seq(false, false, true, false))
    assert(u1.last.sum === 533.0 && u1.last.max === 500.0)
    assert(rows.count(_.user_id == 2L) === 1)
  }

  test("transformWithState running-stats twin: cross-batch parity with the fMGWS twin") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batches = Seq(
        Seq(Event(ts("2024-01-01 00:00:00"), 1L, "click", 10.0),
          Event(ts("2024-01-01 00:01:00"), 1L, "click", 12.0),
          Event(ts("2024-01-01 00:02:00"), 1L, "click", 500.0),
          Event(ts("2024-01-01 00:00:30"), 2L, "click", 5.0)),
        // state bridges micro-batches: user 1 continues at n=4
        Seq(Event(ts("2024-01-01 00:03:00"), 1L, "click", 11.0)))
      val ms = MemoryStream[Event]
      val q = StatefulOps.runningUserStatsTws(spark, ms.toDS(), flagFactor = 10.0)
        .writeStream.format("memory").queryName("ustats_tws").outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val tws = spark.table("ustats_tws").as[UserUpdate].collect()
      val u1 = tws.filter(_.user_id == 1L).sortBy(_.n)
      assert(u1.map(_.n).toSeq === Seq(1L, 2L, 3L, 4L))
      assert(u1.map(_.flagged).toSeq === Seq(false, false, true, false))
      assert(u1.last.sum === 533.0 && u1.last.max === 500.0)
      // API parity: the fMGWS twin on the SAME feed emits the SAME updates
      val ms2 = MemoryStream[Event]
      val q2 = StatefulOps.runningUserStats(spark, ms2.toDS(), flagFactor = 10.0)
        .writeStream.format("memory").queryName("ustats_f").outputMode("append").start()
      batches.foreach { b => ms2.addData(b); q2.processAllAvailable() }
      q2.stop()
      def norm(rows: Array[UserUpdate]) =
        rows.map(r => (r.user_id, r.n, r.sum, r.max, r.flagged)).toSeq.sorted
      assert(norm(tws) === norm(spark.table("ustats_f").as[UserUpdate].collect()),
        "the two stateful APIs must emit identical update streams")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("LSH CDC tombstones: point-deletes stop future pairs, free cap slots, empty the bucket") {
    import graft.streaming.DocStream
    import DocStream.{Collision, DocOp}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
      def add(t: String, id: Long) = DocOp(ts(t), id, tA, deleted = false)
      def del(t: String, id: Long) = DocOp(ts(t), id, tA, deleted = true)
      val batches = Seq(
        Seq(add("2024-01-01 00:00:00", 1L), add("2024-01-01 00:00:10", 2L)),
        // cross-batch tombstone: doc 1 leaves every bucket it occupies
        Seq(del("2024-01-01 00:01:00", 1L)),
        // doc 3 must pair with 2 ONLY (1 is gone); tombstone for an
        // absent doc (9) is a no-op
        Seq(del("2024-01-01 00:01:30", 9L), add("2024-01-01 00:02:00", 3L)),
        Seq(add("2024-01-01 00:03:00", 4L)))
      val ms = MemoryStream[DocOp]
      val q = DocStream.lshCollisionsCdc(spark, ms.toDS(), maxOccupants = 2)
        .writeStream.format("memory").queryName("lshcdc").outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val got = spark.table("lshcdc").as[Collision].collect()
      val pairs = got.map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      // 1~2 was emitted before the tombstone and STANDS (append cannot
      // retract); 3 pairs with 2 only; the cap slot 1 freed lets 4 be
      // ADMITTED at maxOccupants=2 (occupants {2, 3}) so 4 pairs with both
      assert(pairs === Seq((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L)), s"got $pairs")
      // no pair ever names doc 1 after its tombstone batch
      assert(!pairs.exists(p => p._2 != 2L && (p._1 == 1L || p._2 == 1L)),
        "a tombstoned doc appeared in a post-delete pair")
      // full-delete: tombstoning the survivors leaves empty state; a
      // fresh doc then pairs with NOTHING
      val ms2 = MemoryStream[DocOp]
      val q2 = DocStream.lshCollisionsCdc(spark, ms2.toDS())
        .writeStream.format("memory").queryName("lshcdc2").outputMode("append").start()
      Seq(
        Seq(add("2024-01-01 00:00:00", 1L), add("2024-01-01 00:00:10", 2L)),
        Seq(del("2024-01-01 00:01:00", 1L), del("2024-01-01 00:01:00", 2L)),
        Seq(add("2024-01-01 00:02:00", 5L))
      ).foreach { b => ms2.addData(b); q2.processAllAvailable() }
      q2.stop()
      val got2 = spark.table("lshcdc2").as[Collision].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      assert(got2 === Seq((1L, 2L)),
        s"doc 5 must find an emptied bucket, got $got2")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("CDC tombstone memory: in-watermark reordering cannot resurrect a deleted doc") {
    import graft.streaming.DocStream
    import DocStream.{Collision, DocOp}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
      def add(t: String, id: Long) = DocOp(ts(t), id, tA, deleted = false)
      def del(t: String, id: Long) = DocOp(ts(t), id, tA, deleted = true)
      val ms = MemoryStream[DocOp]
      val q = DocStream.lshCollisionsCdc(spark, ms.toDS())
        .writeStream.format("memory").queryName("lshooo").outputMode("append").start()
      def pairs() = spark.table("lshooo").as[Collision].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      // b1: 1 and 2 collide; b2: doc 1 deleted at 00:01:00, doc 9 deleted
      // at 00:01:00 BEFORE its add has ever arrived
      ms.addData(Seq(add("2024-01-01 00:00:00", 1L), add("2024-01-01 00:00:10", 2L)))
      q.processAllAvailable()
      ms.addData(Seq(del("2024-01-01 00:01:00", 1L), del("2024-01-01 00:01:00", 9L)))
      q.processAllAvailable()
      // b3 arrives later but carries EARLIER event times (inside the 1h
      // watermark): the adds of 1 and 9 are logically before their deletes
      // — both must be rejected, not re-admitted; doc 3 is a normal add
      ms.addData(Seq(add("2024-01-01 00:00:30", 1L), add("2024-01-01 00:00:30", 9L),
        add("2024-01-01 00:02:00", 3L)))
      q.processAllAvailable()
      assert(pairs() === Seq((1L, 2L), (2L, 3L)),
        s"an out-of-order add resurrected a tombstoned doc: ${pairs()}")
      // b4: an add STRICTLY AFTER the delete's event time is a legitimate
      // re-publication — doc 1 re-enters and pairs with the survivors
      ms.addData(Seq(add("2024-01-01 00:03:00", 1L)))
      q.processAllAvailable()
      q.stop()
      assert(pairs() === Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)),
        s"re-publication after the delete must admit normally: ${pairs()}")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("winnow CDC tombstones: the shared hook gives the winnow twin identical delete semantics") {
    import graft.streaming.DocStream
    import DocStream.{DocOp, WinnowCand}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // long repeated text → stable winnow fingerprints shared across docs
      val tA = Seq.fill(4)("the quick brown fox jumps over the lazy dog by the river").mkString(" ")
      def add(t: String, id: Long) = DocOp(ts(t), id, tA, deleted = false)
      def del(t: String, id: Long) = DocOp(ts(t), id, tA, deleted = true)
      val ms = MemoryStream[DocOp]
      val q = DocStream.winnowCandidatesCdc(spark, ms.toDS())
        .writeStream.format("memory").queryName("wincdc").outputMode("append").start()
      Seq(
        Seq(add("2024-01-01 00:00:00", 1L), add("2024-01-01 00:00:10", 2L)),
        Seq(del("2024-01-01 00:01:00", 1L)),
        Seq(add("2024-01-01 00:02:00", 3L))
      ).foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val pairs = spark.table("wincdc").as[WinnowCand].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      // 1~2 stands (emitted pre-tombstone); 3 pairs with 2 ONLY — doc 1
      // left every fingerprint bucket it occupied
      assert(pairs === Seq((1L, 2L), (2L, 3L)), s"got $pairs")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transitions: stream twin bridges micro-batches and matches the batch window") {
    import StatefulOps.{KeyedEvent, Transition}
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StatefulOps.transitions(spark, ms.toDS())
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    val batch1 = Seq(
      KeyedEvent(ts("2024-01-01 00:00:00"), 1L, 1L, "view"),
      KeyedEvent(ts("2024-01-01 00:01:00"), 2L, 1L, "click"),
      // same-ts tie for user 2: event_id breaks the order, as in batch
      KeyedEvent(ts("2024-01-01 00:00:30"), 4L, 2L, "click"),
      KeyedEvent(ts("2024-01-01 00:00:30"), 3L, 2L, "view"))
    val batch2 = Seq( // user 1's purchase must bridge from the stored "click"
      KeyedEvent(ts("2024-01-01 00:02:00"), 5L, 1L, "purchase"))
    ms.addData(batch1); q.processAllAvailable()
    ms.addData(batch2); q.processAllAvailable(); q.stop()
    val got = spark.table("trans").as[Transition].collect()
      .map(t => (t.user_id, t.from_type, t.to_type)).sorted.toSeq
    // batch reference: lead() over (ts, event_id) per user on the union
    val perUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val want = (batch1 ++ batch2).toDF()
      .withColumn("to_type", org.apache.spark.sql.functions.lead($"event_type", 1).over(perUser))
      .filter($"to_type".isNotNull)
      .select($"user_id", $"event_type", $"to_type").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got === want)
    assert(got.contains((1L, "click", "purchase")), "cross-batch transition must bridge state")
  }

  test("ewma stream twin: decays across micro-batches, folds late events, matches batch formula") {
    import StatefulOps.{KeyedEvent, EwmaUpdate}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    // wide watermark so batch 3's deliberately-late event isn't dropped
    val q = StatefulOps.ewmaActivity(spark, ms.toDS(), watermarkDelay = "100 days")
      .writeStream.format("memory").queryName("ewmas").outputMode("append").start()
    val batch1 = Seq(
      KeyedEvent(ts("2024-02-28 00:00:00"), 1L, 1L, "click"), // u1 Δ2 (from final anchor)
      KeyedEvent(ts("2024-02-29 23:00:00"), 2L, 1L, "click"), // u1 Δ1
      KeyedEvent(ts("2024-03-01 00:00:00"), 3L, 2L, "click")) // u2 Δ0
    val batch2 = Seq( // u1's anchor moves a day: stored score must shift >> 1
      KeyedEvent(ts("2024-03-01 10:00:00"), 4L, 1L, "click"),
      KeyedEvent(ts("2024-03-01 00:00:00"), 5L, 3L, "click"))
    val batch3 = Seq( // u3 late event 10 days BEFORE its anchor: +2^40, anchor unmoved
      KeyedEvent(ts("2024-02-20 00:00:00"), 6L, 3L, "click"))
    ms.addData(batch1); q.processAllAvailable()
    ms.addData(batch2); q.processAllAvailable()
    ms.addData(batch3); q.processAllAvailable(); q.stop()
    val rows = spark.table("ewmas").as[EwmaUpdate].collect()
    val fin = rows.groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
    assert(fin(1L).ewma_q50 === (1L << 50) + (1L << 49) + (1L << 48))
    assert(fin(1L).n_events === 3L, "cross-batch state must bridge user 1's count")
    assert(fin(2L).ewma_q50 === (1L << 50))
    assert(fin(3L).ewma_q50 === (1L << 50) + (1L << 40),
      "a late in-window event folds in at its true decayed weight")
    assert(fin(3L).last_day === java.time.LocalDate.parse("2024-03-01").toEpochDay,
      "a late event must not move the anchor backward")
    // batch≡stream parity: the q_ev_ewma weight formula, anchored per user
    // (a stream has no global horizon), over the SAME event union
    val e = (batch1 ++ batch2 ++ batch3).toDF()
      .select($"user_id", to_date($"ts").as("d"))
    val want = e.join(e.groupBy($"user_id").agg(max($"d").as("hd")), "user_id")
      .withColumn("dd", datediff($"hd", $"d"))
      .withColumn("wt", when($"dd" <= 50,
        expr("shiftleft(cast(1 as bigint), 50 - cast(dd as int))")).otherwise(lit(0L)))
      .groupBy($"user_id")
      .agg(sum($"wt").as("score"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    fin.foreach { case (u, r) =>
      assert((r.ewma_q50, r.n_events) === want(u), s"user $u diverges from batch formula")
    }
  }

  test("transformWithState ewma twin: identical output to the fMGWS twin on the same feed") {
    import StatefulOps.{KeyedEvent, EwmaUpdate}
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB state store (state-v2)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batches = Seq(
        Seq(
          KeyedEvent(ts("2024-02-28 00:00:00"), 1L, 1L, "click"),
          KeyedEvent(ts("2024-02-29 23:00:00"), 2L, 1L, "click"),
          KeyedEvent(ts("2024-03-01 00:00:00"), 3L, 2L, "click")),
        Seq( // anchor moves a day: stored score must shift >> 1
          KeyedEvent(ts("2024-03-01 10:00:00"), 4L, 1L, "click"),
          KeyedEvent(ts("2024-03-01 00:00:00"), 5L, 3L, "click")),
        Seq( // late event 10 days before u3's anchor: +2^40, anchor unmoved
          KeyedEvent(ts("2024-02-20 00:00:00"), 6L, 3L, "click")))
      val ms = MemoryStream[KeyedEvent]
      val q = StatefulOps.ewmaActivityTws(spark, ms.toDS(), watermarkDelay = "100 days")
        .writeStream.format("memory").queryName("ewmas_tws").outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val tws = spark.table("ewmas_tws").as[EwmaUpdate].collect()
      val fin = tws.groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(fin(1L).ewma_q50 === (1L << 50) + (1L << 49) + (1L << 48))
      assert(fin(1L).n_events === 3L, "cross-batch state must bridge user 1's count")
      assert(fin(2L).ewma_q50 === (1L << 50))
      assert(fin(3L).ewma_q50 === (1L << 50) + (1L << 40),
        "a late in-window event folds in at its true decayed weight")
      assert(fin(3L).last_day === java.time.LocalDate.parse("2024-03-01").toEpochDay)
      // API parity: the fMGWS twin over the SAME batch sequence emits the
      // SAME multiset of updates (both fold through StatefulOps.ewmaFold)
      val ms2 = MemoryStream[KeyedEvent]
      val q2 = StatefulOps.ewmaActivity(spark, ms2.toDS(), watermarkDelay = "100 days")
        .writeStream.format("memory").queryName("ewmas_fmgws").outputMode("append").start()
      batches.foreach { b => ms2.addData(b); q2.processAllAvailable() }
      q2.stop()
      val fmgws = spark.table("ewmas_fmgws").as[EwmaUpdate].collect()
      assert(tws.sortBy(u => (u.user_id, u.n_events)).toSeq ===
        fmgws.sortBy(u => (u.user_id, u.n_events)).toSeq,
        "the two stateful APIs must emit identical update streams")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState ewma twin: event-time timer purges idle state losslessly") {
    import StatefulOps.{KeyedEvent, EwmaUpdate}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[KeyedEvent]
      // tight ttl (2 days) + tight watermark so the timer actually fires
      val q = StatefulOps.ewmaActivityTws(spark, ms.toDS(),
          watermarkDelay = "1 hour", ttlMs = 2L * 86400000L)
        .writeStream.format("memory").queryName("ewmas_ttl").outputMode("append").start()
      ms.addData(Seq(KeyedEvent(ts("2024-01-01 00:00:00"), 1L, 1L, "click")))
      q.processAllAvailable()
      // 10 days later: u1's timer (expiry Jan 3) fires, state purged →
      // u1's next event restarts from scratch (n resets to 1)
      ms.addData(Seq(KeyedEvent(ts("2024-01-11 00:00:00"), 2L, 2L, "click")))
      q.processAllAvailable()
      ms.addData(Seq(KeyedEvent(ts("2024-01-11 01:00:00"), 3L, 1L, "click")))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("ewmas_ttl").as[EwmaUpdate].collect()
      val u1 = rows.filter(_.user_id == 1L).sortBy(_.last_day)
      assert(u1.length === 2)
      assert(u1.last.n_events === 1L,
        s"purged state must not bridge: ${u1.toSeq}")
      assert(u1.last.ewma_q50 === (1L << 50),
        "restart after purge must carry no decayed residue — and with " +
          "ttl ≥ 51 days that residue would have been exactly 0 anyway")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState sessionizer: gap-close, timer-close, batch session_window parity") {
    import StatefulOps.{Event, SessionOut}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gapMs = 4L * 3600000L
      val b1 = Seq(
        Event(ts("2024-01-01 10:00:00"), 1L, "click", 1.5),
        Event(ts("2024-01-01 10:30:00"), 1L, "view", 2.25),
        Event(ts("2024-01-01 09:00:00"), 2L, "click", 4.0))
      val b2 = Seq( // 16:00 > 10:30+4h → closes u1's first session inline
        Event(ts("2024-01-01 16:00:00"), 1L, "click", 3.0))
      val b3 = Seq( // far-future sentinel advances the watermark past every
        // open session's last+gap → timers close u1#2 and u2#1
        Event(ts("2024-01-03 00:00:00"), 99L, "click", 0.0))
      val b4 = Seq( // one more batch so b3's new watermark actually fires timers
        Event(ts("2024-01-03 00:00:01"), 99L, "click", 0.0))
      val ms = MemoryStream[Event]
      val q = StatefulOps.sessionizeTws(spark, ms.toDS(),
          gapMs = gapMs, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("sessions_tws").outputMode("append").start()
      Seq(b1, b2, b3, b4).foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val got = spark.table("sessions_tws").as[SessionOut].collect()
        .filter(_.user_id < 99L)
        .map(s => (s.user_id, s.s_start.getTime, s.s_end.getTime, s.n, s.sum_value))
        .sortBy(t => (t._1, t._2)).toSeq
      // batch ground truth: session_window over the same (non-sentinel) events
      val want = (b1 ++ b2).toDF()
        .groupBy(session_window($"ts", "4 hours"), $"user_id")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(12,2)")).cast("double").as("sum_value"))
        .select($"user_id", $"session_window.start", $"session_window.end",
          $"n", $"sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
          r.getLong(3), r.getDouble(4)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got === want,
        s"closed sessions must equal the batch session_window rows\n got=$got\nwant=$want")
      // the inline gap-close and both timer-closes all happened
      assert(got.count(_._1 == 1L) === 2 && got.count(_._1 == 2L) === 1)
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState sessionizer: a too-old late event never extends the session backwards") {
    import StatefulOps.{Event, SessionOut}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StatefulOps.sessionizeTws(spark, ms.toDS(),
          gapMs = 4L * 3600000L, watermarkDelay = "1 day")
        .writeStream.format("memory").queryName("sessions_late").outputMode("append").start()
      ms.addData(Seq(Event(ts("2024-01-01 12:00:00"), 1L, "click", 1.0)))
      q.processAllAvailable()
      // 07:00 is > 4h before the open session's 12:00 start — its window
      // [07:00, 11:00) does not overlap; session_window would make it a
      // separate session, and so do we: emitted closed immediately
      ms.addData(Seq(Event(ts("2024-01-01 07:00:00"), 1L, "view", 2.0)))
      q.processAllAvailable()
      // close the open session via the far-future sentinel + extra batch
      ms.addData(Seq(Event(ts("2024-01-03 00:00:00"), 99L, "click", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(ts("2024-01-03 00:00:01"), 99L, "click", 0.0)))
      q.processAllAvailable(); q.stop()
      val got = spark.table("sessions_late").as[SessionOut].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.s_start.getTime, s.s_end.getTime, s.n, s.sum_value))
        .sortBy(_._1).toSeq
      assert(got === Seq(
        (ts("2024-01-01 07:00:00").getTime, ts("2024-01-01 11:00:00").getTime, 1L, 2.0),
        (ts("2024-01-01 12:00:00").getTime, ts("2024-01-01 16:00:00").getTime, 1L, 1.0)),
        s"batch session_window yields two separate sessions: $got")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState sessionizer: a late event at EXACTLY start-gap merges (touching windows)") {
    import StatefulOps.{Event, SessionOut}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Seq(Event(ts("2024-01-01 12:00:00"), 1L, "click", 1.0),
        Event(ts("2024-01-01 08:00:00"), 1L, "view", 2.0)) // exactly gap before
      val ms = MemoryStream[Event]
      val q = StatefulOps.sessionizeTws(spark, ms.toDS(),
          gapMs = 4L * 3600000L, watermarkDelay = "1 day")
        .writeStream.format("memory").queryName("sessions_touch").outputMode("append").start()
      // 12:00 first, then the late 08:00 whose [08:00, 12:00) window
      // TOUCHES the open session's start — batch session_window merges
      // touching half-open windows, so the twin must too
      evs.foreach { e => ms.addData(Seq(e)); q.processAllAvailable() }
      ms.addData(Seq(Event(ts("2024-01-03 00:00:00"), 99L, "click", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(Event(ts("2024-01-03 00:00:01"), 99L, "click", 0.0)))
      q.processAllAvailable(); q.stop()
      val got = spark.table("sessions_touch").as[SessionOut].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.s_start.getTime, s.s_end.getTime, s.n, s.sum_value)).toSeq
      // ground truth from batch session_window on the same two events
      val want = evs.toDF()
        .groupBy(session_window($"ts", "4 hours"), $"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
        .select($"session_window.start", $"session_window.end", $"n", $"sum_value")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
          r.getLong(2), r.getDouble(3))).toSeq
      assert(want.size === 1, s"batch merges touching windows into one session: $want")
      assert(got === want, s"stream $got must equal batch $want at the exact boundary")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState funnel: cross-batch stages, batch parity, single conversion") {
    import StatefulOps.{KeyedEvent, Conversion}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // u1 converts across three batches; u2's click PRECEDES its view
      // (never converts); u3 purchases before any click (never converts);
      // u4 converts twice-worth of events but emits ONCE
      val batches = Seq(
        Seq(
          KeyedEvent(ts("2024-01-01 10:00:00"), 1L, 1L, "view"),
          KeyedEvent(ts("2024-01-01 09:00:00"), 2L, 2L, "click"),
          KeyedEvent(ts("2024-01-01 10:00:00"), 3L, 2L, "view"),
          KeyedEvent(ts("2024-01-01 09:30:00"), 4L, 3L, "view"),
          KeyedEvent(ts("2024-01-01 09:45:00"), 5L, 3L, "purchase")),
        Seq(
          KeyedEvent(ts("2024-01-01 11:00:00"), 6L, 1L, "click"),
          KeyedEvent(ts("2024-01-01 08:00:00"), 7L, 4L, "view"),
          KeyedEvent(ts("2024-01-01 08:30:00"), 8L, 4L, "click")),
        Seq(
          KeyedEvent(ts("2024-01-01 12:00:00"), 9L, 1L, "purchase"),
          KeyedEvent(ts("2024-01-01 09:00:00"), 10L, 4L, "purchase"),
          KeyedEvent(ts("2024-01-01 09:30:00"), 11L, 4L, "purchase"))) // second: ignored
      val ms = MemoryStream[KeyedEvent]
      val q = StatefulOps.funnelConversions(spark, ms.toDS(), watermarkDelay = "1 day")
        .writeStream.format("memory").queryName("conv").outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val got = spark.table("conv").as[Conversion].collect()
        .map(c => c.user_id -> ((c.first_view.getTime, c.first_click.getTime,
          c.first_purchase.getTime))).toMap
      assert(got.keySet === Set(1L, 4L),
        s"only stage-ordered users convert, exactly once: $got")
      assert(got(1L) === ((ts("2024-01-01 10:00:00").getTime,
        ts("2024-01-01 11:00:00").getTime, ts("2024-01-01 12:00:00").getTime)))
      assert(got(4L)._3 === ts("2024-01-01 09:00:00").getTime,
        "first qualifying purchase wins; the second never re-emits")
      assert(spark.table("conv").count() === 2, "exactly one row per converting user")
      // batch parity: the q_ev_funnel stage machine over the same events
      val ev = batches.flatten.toDF().select($"user_id", $"ts", $"event_type")
      val v = ev.filter($"event_type" === "view").groupBy($"user_id")
        .agg(min($"ts").as("fv"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ts" > $"fv").groupBy($"user_id").agg(min($"ts").as("fc"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c.join(v, "user_id"), "user_id")
        .filter($"ts" > $"fc").groupBy($"user_id")
        .agg(min($"ts").as("fp"), first($"fv").as("fv"), first($"fc").as("fc"))
      val want = p.collect().map(r => r.getLong(0) ->
        ((r.getTimestamp(2).getTime, r.getTimestamp(3).getTime,
          r.getTimestamp(1).getTime))).toMap
      assert(got === want, s"stream conversions must equal the batch machine\n$got\n$want")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState MapState: per-type counters accumulate across batches, purge whole") {
    import StatefulOps.{KeyedEvent, TypeCount}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[KeyedEvent]
      val q = StatefulOps.typeCountsTws(spark, ms.toDS(), watermarkDelay = "1 hour",
          ttlMs = 86400000L)
        .writeStream.format("memory").queryName("tcounts").outputMode("append").start()
      ms.addData(Seq(
        KeyedEvent(ts("2024-01-01 10:00:00"), 1L, 1L, "click"),
        KeyedEvent(ts("2024-01-01 10:01:00"), 2L, 1L, "click"),
        KeyedEvent(ts("2024-01-01 10:02:00"), 3L, 1L, "view")))
      q.processAllAvailable()
      ms.addData(Seq( // cross-batch: click count continues from map state
        KeyedEvent(ts("2024-01-01 11:00:00"), 4L, 1L, "click")))
      q.processAllAvailable()
      // idle > ttl: timer purges the whole map; the next click restarts at 1
      ms.addData(Seq(KeyedEvent(ts("2024-01-05 00:00:00"), 5L, 2L, "view")))
      q.processAllAvailable()
      ms.addData(Seq(KeyedEvent(ts("2024-01-05 01:00:00"), 6L, 1L, "click")))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("tcounts").as[TypeCount].collect()
      val u1clicks = rows.filter(r => r.user_id == 1L && r.event_type == "click")
        .map(_.n).sorted.toSeq
      assert(u1clicks === Seq(1L, 2L, 3L),
        s"batch1 emits 2, batch2 emits 3, post-purge restarts at 1: $u1clicks")
      assert(rows.exists(r => r.user_id == 1L && r.event_type == "view" && r.n == 1L))
      // one row per TOUCHED type per batch, not per map entry: batch 2
      // touched only click — no duplicate view row beyond batch 1's
      assert(rows.count(r => r.user_id == 1L && r.event_type == "view") === 1)
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState state survives a checkpointed query restart") {
    import StatefulOps.{KeyedEvent, TypeCount}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-tws-out").toString
      val ms = MemoryStream[KeyedEvent]
      // memory sink can't recover from a checkpoint — use the file sink
      val build = () => StatefulOps.typeCountsTws(spark, ms.toDS(),
          watermarkDelay = "1 hour")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
      val q1 = build().outputMode("append").start()
      ms.addData(Seq(
        KeyedEvent(ts("2024-01-01 10:00:00"), 1L, 1L, "click"),
        KeyedEvent(ts("2024-01-01 10:01:00"), 2L, 1L, "click")))
      q1.processAllAvailable(); q1.stop()
      // restart from the checkpoint: the RocksDB state (click → 2) must
      // be recovered, so the next click emits 3, not 1
      val q2 = build().outputMode("append").start()
      ms.addData(Seq(KeyedEvent(ts("2024-01-01 11:00:00"), 3L, 1L, "click")))
      q2.processAllAvailable(); q2.stop()
      val counts = spark.read.parquet(outDir).as[TypeCount].collect()
        .filter(r => r.user_id == 1L && r.event_type == "click").map(_.n).sorted.toSeq
      assert(counts === Seq(2L, 3L),
        s"restarted query must continue from checkpointed state: $counts")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState sessionizer: CORPUS-level parity with batch session_window at sf0.001") {
    import StatefulOps.{Event, SessionOut}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the real event table, fed IN ORDER in 4 micro-batches + a
      // far-future sentinel so every session timer fires
      val evs = graft.sources.Tables.events(spark, Sf)
        .select($"ts", $"user_id", $"event_type",
          coalesce($"value", lit(0.0)).as("value"))
        .as[Event].collect().sortBy(_.ts.getTime).toSeq
      val sentinel = Event(
        new java.sql.Timestamp(evs.last.ts.getTime + 90L * 86400000L),
        999999L, "click", 0.0)
      val ms = MemoryStream[Event]
      val q = StatefulOps.sessionizeTws(spark, ms.toDS(),
          gapMs = 4L * 3600000L, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("sessions_corpus")
        .outputMode("append").start()
      evs.grouped(math.max(evs.size / 4, 1)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      ms.addData(Seq(sentinel)); q.processAllAvailable()
      ms.addData(Seq(sentinel.copy(ts = new java.sql.Timestamp(
        sentinel.ts.getTime + 1000L)))); q.processAllAvailable()
      q.stop()
      val got = spark.table("sessions_corpus").as[SessionOut].collect()
        .filter(_.user_id != 999999L)
        .map(s => (s.user_id, s.s_start.getTime, s.s_end.getTime, s.n,
          math.round(s.sum_value * 100)))
        .sorted.toSeq
      val want = evs.toDF()
        .groupBy(session_window($"ts", "4 hours"), $"user_id")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(12,2)")).cast("double").as("sum_value"))
        .select($"user_id", $"session_window.start", $"session_window.end",
          $"n", $"sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3), math.round(r.getDouble(4) * 100)))
        .sorted.toSeq
      assert(got.size === want.size,
        s"session count: stream ${got.size} vs batch ${want.size}")
      assert(got === want, "every closed session must equal its batch row")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("streaming LSH near-dup: collisions bridge micro-batches and match batch candidates") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val tB = "completely different content about distributed query engines and shuffle planning"
    val ms = MemoryStream[StreamDoc]
    val q = DocStream.lshCollisions(spark, ms.toDS())
      .writeStream.format("memory").queryName("lshcol").outputMode("append").start()
    ms.addData(Seq(
      StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA),
      StreamDoc(ts("2024-01-01 00:00:10"), 2L, tB)))
    q.processAllAvailable()
    ms.addData(Seq( // exact copy of doc 1 arrives a batch later
      StreamDoc(ts("2024-01-01 00:01:00"), 3L, tA)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("lshcol").as[Collision].collect()
    // identical text ⇒ identical signature ⇒ a collision on EVERY band,
    // each pointing at the batch-1 occupant — state bridged the batches
    val pairs = got.map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq
    assert(pairs === Seq((1L, 3L)), s"got $pairs")
    assert(got.length === graft.operators.Dedup.NumHashes / graft.operators.Dedup.BandSize,
      "an exact copy must collide on all 8 bands")
    // batch parity: the distinct collision pairs == minhashCandidates on
    // the same three docs (arrival order matches id order here)
    val batchPairs = graft.operators.Dedup.minhashCandidates(
        Seq((1L, tA), (2L, tB), (3L, tA)).toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(pairs.sorted === batchPairs)
  }

  test("streaming LSH clique: later bucket-mates pair with each other, not just the first occupant") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val ms = MemoryStream[StreamDoc]
    val q = DocStream.lshCollisions(spark, ms.toDS())
      .writeStream.format("memory").queryName("lshclique").outputMode("append").start()
    // three copies across three batches: a star-shaped candidate set would
    // emit only (1,2) and (1,3); full prefix parity requires (2,3) too —
    // the pair that survives verification when doc 1 is a false positive
    ms.addData(Seq(StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA)))
    q.processAllAvailable()
    ms.addData(Seq(StreamDoc(ts("2024-01-01 00:01:00"), 2L, tA)))
    q.processAllAvailable()
    ms.addData(Seq(StreamDoc(ts("2024-01-01 00:02:00"), 3L, tA)))
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("lshclique").as[Collision].collect()
      .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
    assert(pairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
    // and it equals the batch candidate join on the same docs
    val batchPairs = graft.operators.Dedup.minhashCandidates(
        Seq((1L, tA), (2L, tA), (3L, tA)).toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(pairs === batchPairs)
  }

  test("streaming LSH occupant cap: overflow docs pair with stored occupants but are not retained") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val ms = MemoryStream[StreamDoc]
    val q = DocStream.lshCollisions(spark, ms.toDS(), maxOccupants = 2)
      .writeStream.format("memory").queryName("lshcap").outputMode("append").start()
    (1 to 4).foreach { i =>
      ms.addData(Seq(StreamDoc(ts(f"2024-01-01 00:0$i%d:00"), i.toLong, tA)))
      q.processAllAvailable()
    }
    q.stop()
    val pairs = spark.table("lshcap").as[Collision].collect()
      .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
    // docs 1,2 stored (cap=2); docs 3,4 each collide with both stored
    // occupants (joining the component) but never with each other
    assert(pairs === Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)),
      s"got $pairs")
  }

  test("streaming LSH TTL: an idle bucket forgets its occupant after the window") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val tB = "completely different content about distributed query engines and shuffle planning"
    val tC = "yet another unrelated document mentioning warehouses lakes and iceberg tables"
    val ms = MemoryStream[StreamDoc]
    // 1-hour TTL, tight watermark: state must die between day 1 and day 30
    val q = DocStream.lshCollisions(spark, ms.toDS(),
        watermarkDelay = "1 minute", ttlMs = 3600000L)
      .writeStream.format("memory").queryName("lshttl").outputMode("append").start()
    ms.addData(Seq(StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA)))
    q.processAllAvailable()
    // advance the watermark far past doc 1's TTL…
    ms.addData(Seq(StreamDoc(ts("2024-01-30 00:00:00"), 2L, tB)))
    q.processAllAvailable()
    // …then a batch where doc 1's buckets receive NO data: timeout fires,
    // occupant state is removed (Spark only times out data-less keys)
    ms.addData(Seq(StreamDoc(ts("2024-01-30 00:01:00"), 3L, tC)))
    q.processAllAvailable()
    // an exact copy of doc 1 arrives after the purge: no collision — the
    // window forgot the original, and the copy claims the buckets anew
    ms.addData(Seq(StreamDoc(ts("2024-01-30 00:02:00"), 4L, tA)))
    q.processAllAvailable()
    // control: a second copy right after MUST collide with doc 4
    ms.addData(Seq(StreamDoc(ts("2024-01-30 00:03:00"), 5L, tA)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("lshttl").as[Collision].collect()
      .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
    assert(!got.contains((1L, 4L)),
      "a TTL-purged occupant must not produce collisions")
    assert(got.contains((4L, 5L)),
      "the post-purge copy must become the new occupant")
  }

  test("transformWithState LSH twin: clique + cross-batch parity with the fMGWS twin") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
      val tB = "completely different content about distributed query engines and shuffle planning"
      // three copies of tA across batches (the clique case) + one unrelated
      val batches = Seq(
        Seq(StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA),
          StreamDoc(ts("2024-01-01 00:00:10"), 2L, tB)),
        Seq(StreamDoc(ts("2024-01-01 00:01:00"), 3L, tA)),
        Seq(StreamDoc(ts("2024-01-01 00:02:00"), 4L, tA)))
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.lshCollisionsTws(spark, ms.toDS())
        .writeStream.format("memory").queryName("lshtws").outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val tws = spark.table("lshtws").as[Collision].collect()
      val pairs = tws.map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      // full prefix clique, bridged across micro-batches
      assert(pairs === Seq((1L, 3L), (1L, 4L), (3L, 4L)), s"got $pairs")
      // an exact copy collides on every band
      assert(tws.count(c => c.doc_id == 3L) ===
        graft.operators.Dedup.NumHashes / graft.operators.Dedup.BandSize,
        "an exact copy must collide on all 8 bands")
      // API parity: the fMGWS twin on the SAME feed emits the SAME
      // (band, bh, pair) multiset
      val ms2 = MemoryStream[StreamDoc]
      val q2 = DocStream.lshCollisions(spark, ms2.toDS())
        .writeStream.format("memory").queryName("lshtws_f").outputMode("append").start()
      batches.foreach { b => ms2.addData(b); q2.processAllAvailable() }
      q2.stop()
      val fmgws = spark.table("lshtws_f").as[Collision].collect()
      def norm(cs: Array[Collision]) =
        cs.map(c => (c.band, c.bh, c.earlier_doc_id, c.doc_id)).toSeq.sorted
      assert(norm(tws) === norm(fmgws),
        "the two stateful APIs must emit identical collision streams")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState LSH twin: SAME-batch collisions see uncommitted MapState writes") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
      // both copies arrive in ONE micro-batch: doc 2 must see doc 1
      // through the MapState's in-batch (uncommitted) write — the path
      // the cross-batch tests never exercise
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.lshCollisionsTws(spark, ms.toDS())
        .writeStream.format("memory").queryName("lshtws_same").outputMode("append").start()
      ms.addData(Seq(
        StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA),
        StreamDoc(ts("2024-01-01 00:00:10"), 2L, tA)))
      q.processAllAvailable(); q.stop()
      val got = spark.table("lshtws_same").as[Collision].collect()
      val pairs = got.map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq
      assert(pairs === Seq((1L, 2L)), s"got $pairs")
      // exactly once per band — neither dropped (stale read) nor doubled
      assert(got.length === graft.operators.Dedup.NumHashes / graft.operators.Dedup.BandSize,
        s"an exact same-batch copy must collide on all 8 bands exactly once, got ${got.length}")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState LSH twin: occupant cap — overflow docs pair but are not retained") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.lshCollisionsTws(spark, ms.toDS(), maxOccupants = 2)
        .writeStream.format("memory").queryName("lshtws_cap").outputMode("append").start()
      (1 to 4).foreach { i =>
        ms.addData(Seq(StreamDoc(ts(f"2024-01-01 00:0$i%d:00"), i.toLong, tA)))
        q.processAllAvailable()
      }
      q.stop()
      val pairs = spark.table("lshtws_cap").as[Collision].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      // docs 1,2 stored (cap=2, nOcc persisted across batches); docs 3,4
      // each collide with both stored occupants but never with each other
      assert(pairs === Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)),
        s"got $pairs")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState LSH twin: timer purges an idle bucket after the TTL window") {
    import graft.streaming.DocStream
    import DocStream.{StreamDoc, Collision}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
      val tB = "completely different content about distributed query engines and shuffle planning"
      val tC = "yet another unrelated document mentioning warehouses lakes and iceberg tables"
      val ms = MemoryStream[StreamDoc]
      val q = DocStream.lshCollisionsTws(spark, ms.toDS(),
          watermarkDelay = "1 minute", ttlMs = 3600000L)
        .writeStream.format("memory").queryName("lshtws_ttl").outputMode("append").start()
      ms.addData(Seq(StreamDoc(ts("2024-01-01 00:00:00"), 1L, tA)))
      q.processAllAvailable()
      // advance the watermark far past doc 1's TTL, then let the timer
      // fire in a batch where doc 1's buckets receive no data
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:00:00"), 2L, tB)))
      q.processAllAvailable()
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:01:00"), 3L, tC)))
      q.processAllAvailable()
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:02:00"), 4L, tA)))
      q.processAllAvailable()
      ms.addData(Seq(StreamDoc(ts("2024-01-30 00:03:00"), 5L, tA)))
      q.processAllAvailable(); q.stop()
      val got = spark.table("lshtws_ttl").as[Collision].collect()
        .map(c => (c.earlier_doc_id, c.doc_id)).distinct.toSeq.sorted
      assert(!got.contains((1L, 4L)),
        "a timer-purged occupant must not produce collisions")
      assert(got.contains((4L, 5L)),
        "the post-purge copy must become the new occupant")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("funnel: stage order enforced — pre-view clicks and pre-click purchases don't count") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:10:00"), "click"),
      (1L, ts("2024-01-01 00:20:00"), "purchase"),
      // user 2: click BEFORE first view → not funnel-eligible; later no click
      (2L, ts("2024-01-01 00:05:00"), "click"),
      (2L, ts("2024-01-01 00:30:00"), "view"),
      (2L, ts("2024-01-01 00:01:00"), "purchase"),
      // user 3: view then click, purchase BEFORE the click → not converted
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:40:00"), "click"),
      (3L, ts("2024-01-01 00:20:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    // run the same three-stage plan as q_ev_funnel
    val v = ev.filter($"event_type" === "view").groupBy($"user_id").agg(min($"ts").as("fv"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"fv").groupBy($"user_id").agg(min($"ts").as("fc"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"fc").groupBy($"user_id").agg(min($"ts").as("fp"))
    val out = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id", $"fc".isNotNull.as("clicked"), $"fp".isNotNull.as("converted"))
      .as[(Long, Boolean, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) === ((true, true)))
    assert(out(2L) === ((false, false)), "pre-view click must not advance the funnel")
    assert(out(3L) === ((true, false)), "pre-click purchase must not convert")
  }

  test("ewma activity: dyadic day weights hand-computed; stale events truncate to 0") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00")), // Δ0 → 2^50
      (1L, ts("2024-02-29 23:00:00")), // Δ1 → 2^49
      (1L, ts("2024-02-28 00:00:00")), // Δ2 → 2^48
      (2L, ts("2024-03-01 00:00:00")), // Δ0 → 2^50
      (3L, ts("2023-12-01 00:00:00"))  // Δ91 > 50 → 0
    ).toDF("user_id", "ts")
    // the q_ev_ewma plan shape: horizon broadcast + exact integer weights
    val e = ev.select($"user_id", to_date($"ts").as("d"))
    val h = e.agg(max($"d").as("hd"))
    val got = e.crossJoin(broadcast(h))
      .withColumn("dd", datediff($"hd", $"d"))
      .withColumn("wt", when($"dd" <= 50,
        expr("shiftleft(cast(1 as bigint), 50 - cast(dd as int))")).otherwise(lit(0L)))
      .groupBy($"user_id")
      .agg(sum($"wt".cast("decimal(38,0)")).cast("long").as("ewma_q50"))
    // pin the emitted type: BIGINT, not DECIMAL — the DECIMAL sum is
    // internal only (overflow errors); the column the oracle hashes is long
    assert(got.schema("ewma_q50").dataType ===
      org.apache.spark.sql.types.LongType)
    val gotMap = got.as[(Long, Long)].collect().toMap
    assert(gotMap(1L) === (1L << 50) + (1L << 49) + (1L << 48))
    assert(gotMap(2L) === (1L << 50))
    assert(gotMap(3L) === 0L, "beyond the 50-day tail the weight truncates to 0")
    // recency dominates volume: user 1's three old-ish events can never
    // outweigh a user with one strictly fresher event plus anything else —
    // the half-life invariant Σ_{δ>0} 2^-δ < 2^0
    assert(gotMap(1L) < (1L << 50) * 2)
  }

  test("latest-per-key: max_by composite-key agg ≡ row_number window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    // the q_ev_latest shape: one partial-combinable agg, O(1) state per key
    val viaAgg = ev.groupBy($"user_id")
      .agg(max_by(struct($"ts", $"event_id"), struct($"ts", $"event_id")).as("l"))
      .select($"user_id", $"l.ts".as("ts"), $"l.event_id".as("event_id"))
    // the sort-shard formulation it must agree with (event_id unique →
    // the composite key is a total order, so the survivor is identical)
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val viaWindow = ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"ts", $"event_id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("crossCandidates stream-static: arrivals collide against the base store; batch parity; zero state") {
    import graft.streaming.DocStream
    import DocStream.StreamDoc
    import graft.operators.Dedup
    implicit val ctx = spark.sqlContext
    val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val tB = "completely different content about distributed query engines and shuffle planning"
    val base = Seq((10L, tA), (20L, tB)).toDF("doc_id", "text")
    val baseBands = Dedup.lshBands(Dedup.minhashSignatures(base)).cache()
    val ms = MemoryStream[StreamDoc]
    val q = DocStream.crossCandidates(ms.toDS(), baseBands)
      .writeStream.format("memory").queryName("crosscand").outputMode("append").start()
    ms.addData(Seq(StreamDoc(ts("2024-01-01 00:00:00"), 101L, tA)))
    q.processAllAvailable()
    // a later batch still sees the full static store (no state, no TTL);
    // a too-short doc yields no bands and must not throw
    ms.addData(Seq(StreamDoc(ts("2024-01-01 00:01:00"), 102L, tB),
      StreamDoc(ts("2024-01-01 00:02:00"), 103L, "short")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("crosscand").as[(Long, Long)].collect().toSeq.distinct.sorted
    assert(got === Seq((101L, 10L), (102L, 20L)),
      s"each arrival must hit exactly its base twin: $got")
    // batch parity: distinct emissions == the batch cross-candidate join
    // over the same incoming docs and the same store
    val incoming = Seq((101L, tA), (102L, tB), (103L, "short")).toDF("doc_id", "text")
    val batch = Dedup.lshBands(Dedup.minhashSignatures(incoming)).as("a")
      .join(baseBands.as("b"), $"a.band" === $"b.band" && $"a.bh" === $"b.bh")
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSeq.distinct.sorted
    assert(got === batch, "stream-static emissions diverged from the batch candidate stage")
  }
}
