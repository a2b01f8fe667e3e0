package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** Greedy max-coverage source selection: the greedy pick rule replayed
  * brute-force on a constructed corpus, the non-increasing-gain property
  * (greedy on a submodular function), exact cumulative coverage, and the
  * early-stop on exhausted sources.
  */
class SourceSelectSpec extends SparkSpec {
  import spark.implicits._

  // docs engineered so coverage sets overlap: srcA is the biggest set,
  // srcB adds a disjoint tail, srcC is a subset of A (zero gain once A
  // is picked), srcD adds one novel shingle.
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "srcA"),
    (2L, "eta theta iota kappa lambda mu", "srcA"),
    (3L, "alpha beta gamma delta", "srcC"),
    (4L, "nu xi omicron pi rho sigma", "srcB"),
    (5L, "eta theta iota kappa", "srcC"),
    (6L, "alpha beta gamma newone", "srcD")
  ).toDF("doc_id", "text", "source")
    .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))

  private def coverSets: Map[String, Set[Long]] =
    Dedup.shingles(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select("source", "h").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).toSet }

  test("selection trace replays the brute-force greedy exactly") {
    val sets = coverSets
    val got = Curation.sourceSelect(docs, budget = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    var covered = Set.empty[Long]
    var picked = Set.empty[String]
    val want = (1 to 3).map { r =>
      val (src, gain) = sets.filterNot(kv => picked(kv._1))
        .map { case (s, hs) => (s, (hs -- covered).size.toLong) }
        .toSeq.sortBy { case (s, g) => (-g, s) }.head
      covered ++= sets(src); picked += src
      (r, src, gain, covered.size.toLong)
    }
    assert(got.toSeq == want, s"engine ${got.toSeq} vs brute $want")
  }

  test("gains are non-increasing and cum_cov is the exact union size") {
    val sets = coverSets
    val got = Curation.sourceSelect(docs, budget = 4)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val gains = got.map(_._2)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"greedy gains must be non-increasing: ${gains.toSeq}")
    val union = got.map(_._1).flatMap(sets).toSet
    assert(got.last._3 == union.size.toLong)
  }

  test("selection stops when no remaining source adds coverage") {
    // srcC's shingles are a strict subset of srcA's: once A is picked, C
    // contributes nothing and must never be "selected" — the trace stops
    // at 3 rows even with budget 10 (the answer to "which sources add
    // novel text" correctly excludes a fully-redundant source).
    val got = Curation.sourceSelect(docs, budget = 10).collect()
    assert(got.length == 3, s"redundant srcC must be dropped: ${got.toSeq}")
    assert(got.map(_.getString(1)).toSet == Set("srcA", "srcB", "srcD"))
  }
}
