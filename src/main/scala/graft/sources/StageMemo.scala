package graft.sources

/** Size-bounded access-order (LRU) memo for checkpointed stage tables
  * ([[graft.operators.Dedup.clustersFor]],
  * [[graft.operators.Similarity.kmeansFitMemo]]).
  *
  * Why bounded: memo keys include the data-dir FINGERPRINT
  * ([[Tables.dataKey]]), so a long-lived session that repeatedly
  * regenerates a dir mints a fresh key per generation — an unbounded map
  * would accumulate one checkpointed table per generation forever.
  * Eviction drops the eldest-by-access entry past `maxEntries`; the
  * evicted DataFrame's checkpoint blocks are reclaimed by Spark's
  * ContextCleaner once the frame is unreachable (the same lifecycle the
  * previous abandon-on-regenerate behavior relied on, now with a hard
  * bound instead of "bounded for any realistic session").
  *
  * Concurrency: one lock around lookup+build. A concurrent builder of a
  * DIFFERENT key waits — acceptable here because the driver contract
  * runs queries sequentially and a memoized stage build is seconds; the
  * lock buys the important guarantee that one key never builds twice.
  *
  * == The two-tier checkpoint discipline (the ONE home for the rule) ==
  *
  * This library truncates lineage at two different strengths, and the
  * choice is a contract, not a style:
  *
  *  - '''Tier 1 — transient `localCheckpoint(false)`''' is acceptable
  *    ONLY for an intermediate consumed entirely WITHIN one query's
  *    plan (iterative-loop lineage hygiene like the k-means/CC rounds,
  *    or a table feeding both sides of one self-join). Its blocks live
  *    in executor MEMORY_AND_DISK storage: they compete with execution
  *    memory and die with an executor — an exposure window that is fine
  *    for the seconds one query runs, and wrong for anything longer.
  *  - '''Tier 2 — [[reliableStage]] (or an explicit parquet store)''' is
  *    MANDATORY for any CROSS-QUERY shared artifact: everything a
  *    `*For`-suffixed memo serves (cluster tables, candidate pairs,
  *    centroids, codebooks, persisted indexes). A memoized stage is by
  *    definition read by several later queries; it must be immune to
  *    block eviction and executor loss, so it goes through a reliable
  *    checkpoint file (or a parquet write) and every later read is a
  *    file scan.
  *
  * StageMemoSpec enforces the boundary mechanically: every
  * `getOrCompute` call site in main source must build through
  * `reliableStage` or a parquet store — a transient checkpoint can
  * never be handed to a memo.
  */
object StageMemo {

  /** Materialize a shared stage table through a RELIABLE checkpoint (a
    * file in the SparkContext's checkpoint dir), not `localCheckpoint`.
    *
    * Why: localCheckpoint blocks live in the block manager's
    * MEMORY_AND_DISK pool and COMPETE with execution memory — the 100×
    * scale probe measured memo-riding queries swinging 25 ↔ 68 s
    * run-to-run as the memoized cluster table's blocks were evicted and
    * recomputed under shuffle pressure. A memoized stage is by definition
    * read by several later queries; the at-scale posture is the same one
    * a cluster job uses for a shared intermediate: write it out once,
    * re-read it from storage, immune to executor memory pressure and (on
    * a real cluster) to executor loss. StageMemoSpec pins survival: the
    * memoized frame still evaluates after every cached/persisted block
    * is forcibly dropped.
    *
    * The checkpoint dir defaults to a per-session tmp path on first use;
    * a cluster deployment calls `sparkContext.setCheckpointDir` with a
    * durable location (HDFS/object store) before the first stage builds.
    */
  def reliableStage(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        s"${System.getProperty("java.io.tmpdir")}/graft-ckpt/${sc.applicationId}")
    df.checkpoint() // eager + reliable: one write, every later read is a file scan
  }
}

final class StageMemo[V](maxEntries: Int = 16) {
  private val map = new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > maxEntries
  }

  def getOrCompute(key: String)(build: => V): V = map.synchronized {
    val cur = map.get(key)
    if (cur != null) cur
    else {
      val v = build
      map.put(key, v)
      v
    }
  }

  def size: Int = map.synchronized(map.size())

  def contains(key: String): Boolean = map.synchronized(map.containsKey(key))

  def clear(): Unit = map.synchronized(map.clear())
}
