package graft

import graft.operators.{Dedup, Similarity}
import graft.sources.{StageMemo, Tables}

/** The memoized stage tables (clusters / winnow pairs / centroids) must be
  * EVICTION-PROOF: a shared stage read by several later queries cannot be
  * backed by block-manager storage that competes with execution memory
  * (the 100× probe measured localCheckpoint-backed memos recomputing under
  * pressure — q_retrieval_e2e swinging 25 ↔ 68 s). `reliableStage` routes
  * them through a reliable checkpoint file instead; this suite pins the
  * survival property by forcibly dropping every cached/persisted block —
  * a superset of what eviction under memory pressure does — and
  * re-evaluating each memoized frame.
  */
class StageMemoSpec extends SparkSpec {

  test("memoized stage tables survive a full block-manager wipe") {
    val c = Dedup.corpus(Tables.documents(spark, Sf))
    val e = Tables.embeddings(spark, Sf)
    val clusters = Dedup.clustersFor(c, Sf)
    val winnow = Dedup.winnowPairsFor(c, Sf)
    val cents = Similarity.kmeansFitMemo(e, Sf, "all")
    val before = (clusters.count(), winnow.count(), cents.count())

    // simulate eviction: drop EVERY cached and persisted block, including
    // any localCheckpoint blocks (which cannot be recomputed — lineage is
    // truncated — so a local-checkpoint-backed memo would throw here)
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    val after = (clusters.count(), winnow.count(), cents.count())
    assert(after === before,
      "memoized stage tables must re-read from the reliable checkpoint")
  }

  test("two-tier discipline: every DataFrame memo builds through reliableStage or a parquet store") {
    // the StageMemo scaladoc's boundary, enforced mechanically over main
    // source: a memoized stage is cross-query shared by definition, so a
    // frame memo may never be handed a transient localCheckpoint —
    // driver-VALUE memos (weights, fitted factors) are exempt
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    val declRe = """val (\w+)\s*=\s*new graft\.sources\.StageMemo\[([^\]]+)\]""".r
    val memoTypes = files.flatMap { f =>
      val src = java.nio.file.Files.readString(f)
      declRe.findAllMatchIn(src).map(m => m.group(1) -> m.group(2))
    }.toMap
    assert(memoTypes.nonEmpty, "memo declarations must be discoverable")
    val callRe = """(\w+)\.getOrCompute\(""".r
    val offenders = files.flatMap { f =>
      val lines = java.nio.file.Files.readAllLines(f).asScala.toVector
      lines.zipWithIndex.flatMap { case (line, i) =>
        callRe.findFirstMatchIn(line).flatMap { m =>
          val memo = m.group(1)
          val frameMemo = memoTypes.get(memo).exists(_.contains("DataFrame"))
          val window = lines.slice(i, math.min(lines.size, i + 10)).mkString("\n")
          if (frameMemo && !window.contains("reliableStage") &&
              !window.contains(".parquet("))
            Some(s"$f:${i + 1} ($memo)")
          else None
        }
      }
    }
    assert(offenders.isEmpty,
      s"DataFrame memo call sites missing reliableStage/parquet:\n${offenders.mkString("\n")}")
  }

  test("reliableStage sets a checkpoint dir on first use and is eager") {
    import spark.implicits._
    val df = StageMemo.reliableStage(Seq(1L, 2L, 3L).toDF("x"))
    assert(spark.sparkContext.getCheckpointDir.isDefined)
    // eager: the plan is already a materialized scan (no recompute of the
    // original lineage), and the data round-trips
    assert(df.as[Long].collect().sorted === Array(1L, 2L, 3L))
  }
}
