package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Plan pins for the broadcast-probes serving-join conversion (round-13
  * verdict ask #2): every cell-keyed ANN serving scan must BROADCAST its
  * per-query probe side and stream the corpus-sized store — a shuffle
  * join keyed on `cell` (≤ ‖cells‖ distinct values) concentrates the
  * ‖Q‖·occupancy scoring scan on ≤ ‖cells‖ tasks (measured 79.7 s at
  * the x100 probe scale on the trained path before commit 8e40d1c).
  * Also pins the guarded helper's salted-shuffle fallback — the path
  * taken when ‖Q‖ outgrows the broadcast ceiling — row-identical to the
  * broadcast spelling.
  */
class ServingJoinPlanSpec extends SparkSpec {

  private val served = Seq("q_emb_ivfpq", "q_emb_ivfpqr", "q_emb_fivfpqr",
    "q_emb_ivfbq", "q_emb_ivfbqr", "q_emb_servecrawl", "q_emb_ivftrecall",
    "q_emb_ivft", "q_emb_fivft")

  private val cellShuffleJoin =
    """(SortMergeJoin|ShuffledHashJoin)[^\n\[]*\[(cast\()?cell#""".r

  for (name <- served) {
    test(s"$name: probe side broadcasts; the store join never shuffles on cell") {
      val plan = SparkEntry.queries(name)(spark, Sf)
        .queryExecution.executedPlan.toString
      assert(cellShuffleJoin.findFirstIn(plan).isEmpty,
        s"$name still shuffles the store on the low-cardinality cell key:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name lost its broadcast serving join:\n$plan")
    }
  }

  test("servingScanJoin salted fallback: row-identical to the broadcast spelling, keyed on (cell, salt)") {
    import spark.implicits._
    val store = spark.range(0, 2000)
      .select(col("id").as("vec_id"), (col("id") % 7).cast("int").as("cell"),
        (col("id") * 3).as("payload"))
    val probes = spark.range(0, 40)
      .select((col("id") + 100000).as("qid"), (col("id") % 7).cast("int").as("cell"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"payload", $"qid")
        .as[(Long, Int, Long, Long)].collect().toSet
    val bcast = Similarity.servingScanJoin(store, probes, 40L, 64L)
    val salted = Similarity.servingScanJoin(store, probes, 40L, 64L, maxBytes = 0L)
    // the fallback join carries the salt key (cells spread over
    // shuffle-partition-many tasks instead of ≤ ‖cells‖)…
    assert(salted.queryExecution.analyzed.toString.contains("_salt"))
    assert(!bcast.queryExecution.analyzed.toString.contains("_salt"))
    // …while the result set — and the exposed columns — are identical
    assert(bcast.columns.toSeq === salted.columns.toSeq)
    val b = rows(bcast)
    assert(rows(salted) === b)
    // sanity: every store row matched all probes of its cell
    val expected = (0 until 7).map(c =>
      (0 until 2000).count(_ % 7 == c) * (0 until 40).count(_ % 7 == c)).sum
    assert(b.size == expected)
  }

  test("salted fallback: salt count is store-volume-derived, capped at the partition count, row-identical") {
    import spark.implicits._
    val store = spark.range(0, 500)
      .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("cell"),
        (col("id") * 3).as("payload"))
    val probes = spark.range(0, 20)
      .select((col("id") + 100000).as("qid"), (col("id") % 5).cast("int").as("cell"))
    val target = spark.sessionState.conf.filesMaxPartitionBytes
    val parts = spark.sessionState.conf.numShufflePartitions
    def saltSeqBound(df: org.apache.spark.sql.DataFrame): String =
      "sequence\\(0, (\\d+)".r.findFirstMatchIn(
        df.queryExecution.analyzed.toString).map(_.group(1)).getOrElse("none")
    // a store worth ~3 target-task volumes needs exactly 3 salts (< the
    // partition count): probe replication is bounded by what the store
    // genuinely needs spread, not the global setting (r13 verdict #4)
    val derived = Similarity.servingScanJoin(store, probes, 20L, 64L,
      maxBytes = 0L, storeBytes = 3L * target - 1L)
    assert(saltSeqBound(derived) === "2", "expected 3 salts (sequence(0, 2))")
    // a store beyond parts·target volumes caps at the partition count
    val capped = Similarity.servingScanJoin(store, probes, 20L, 64L,
      maxBytes = 0L, storeBytes = (parts + 7L) * target)
    assert(saltSeqBound(capped) === s"${parts - 1}",
      s"expected the $parts-partition cap")
    // and an unpriced store keeps the conservative parts× spelling
    val unpriced = Similarity.servingScanJoin(store, probes, 20L, 64L,
      maxBytes = 0L)
    assert(saltSeqBound(unpriced) === s"${parts - 1}")
    // row identity across every salt count, including vs the broadcast
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"payload", $"qid")
        .as[(Long, Int, Long, Long)].collect().toSet
    val b = rows(Similarity.servingScanJoin(store, probes, 20L, 64L))
    assert(rows(derived) === b)
    assert(rows(capped) === b)
  }
}
