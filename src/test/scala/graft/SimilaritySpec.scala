package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, Sf)

  test("brute-force kNN: k results per query, cosine within [-1, 1]") {
    val knn = Similarity.knnBrute(emb).cache()
    val perQ = knn.groupBy($"qid").count().select($"count").as[Long].collect()
    assert(perQ.forall(_ === 5))
    assert(knn.filter(abs($"cos") > 1.0000001).count() === 0)
  }

  test("hard negatives: labels always differ, and each IS the true cross-label top-k") {
    val hn = Similarity.hardNegatives(emb).cache()
    assert(hn.filter($"qlabel" === $"neg_label").count() === 0,
      "a negative must never share the query's label")
    val perQ = hn.groupBy($"qid").count().select($"count").as[Long].collect()
    assert(perQ.forall(_ === 3))
    // ground truth: the unrestricted brute ranking filtered to other
    // labels, re-ranked — must agree exactly (pair AND rank)
    val labels = emb.select($"vec_id", $"label")
    val full = Similarity.knnBrute(emb, k = 1000000)
      .join(labels.withColumnRenamed("vec_id", "qid").withColumnRenamed("label", "ql"), Seq("qid"))
      .join(labels, Seq("vec_id"))
      .filter($"label" =!= $"ql")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    val want = full.withColumn("rn2", row_number().over(w).cast("long"))
      .filter($"rn2" <= 3).select($"qid", $"vec_id", $"rn2".as("rn"))
    val got = hn.select($"qid", $"vec_id", $"rn")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    hn.unpersist()
  }

  test("ANN results agree with brute-force cosine for the same pairs") {
    val brute = Similarity.knnBrute(emb, k = 1000000).select($"qid", $"vec_id", $"cos".as("bcos"))
    val ann = Similarity.knnLsh(emb).join(brute, Seq("qid", "vec_id"))
    assert(ann.filter($"cos" =!= $"bcos").count() === 0)
  }

  test("multi-probe LSH: strictly more candidates than single-probe, exact cosines") {
    // every single-probe result pair must also be reachable multi-probe
    // (the probe set contains the query's own bucket)...
    val sp = Similarity.knnLsh(emb).select($"qid", $"vec_id").cache()
    val mp = Similarity.knnLshMultiProbe(emb).cache()
    // ...but ranking can differ when new candidates displace old ones, so
    // compare REACHABILITY per query: multi-probe's candidate count >=
    // single-probe's k-truncated count for every query
    val spCnt = sp.groupBy($"qid").count().withColumnRenamed("count", "nsp")
    val mpCnt = mp.groupBy($"qid").count().withColumnRenamed("count", "nmp")
    val joined = spCnt.join(mpCnt, Seq("qid"), "left")
      .select($"qid", $"nsp", coalesce($"nmp", lit(0L)).as("nmp"))
    assert(joined.filter($"nmp" < $"nsp").count() === 0,
      "a query can never lose candidates by probing more buckets")
    // sf0.001's single-probe index finds candidates for few queries; the
    // 1-bit flips must strictly widen coverage (this is the whole point)
    assert(mp.select($"qid").distinct().count() >
      sp.select($"qid").distinct().count(),
      "multi-probe must reach queries whose own bucket was empty")
    // cosines are exact: agree with brute force on the same pairs
    val brute = Similarity.knnBrute(emb, k = 1000000)
      .select($"qid", $"vec_id", $"cos".as("bcos"))
    assert(mp.join(brute, Seq("qid", "vec_id"))
      .filter($"cos" =!= $"bcos").count() === 0)
    sp.unpersist(); mp.unpersist()
  }

  test("recall audit: planted same-bucket twins score recall 1; recall stays in [0,1]") {
    // two exact copies of each query vector share every hyperplane sign →
    // same LSH bucket → the ANN must find them → recall@  truth-set = 1
    val base = emb.filter($"vec_id" < 200)
    val twins = base.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"label", $"embedding")
    val twins2 = base.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 2000000L).as("vec_id"), $"label", $"embedding")
    val planted = base.unionByName(twins).unionByName(twins2)
    val truth = Similarity.knnBrute(planted, k = 2).select($"qid", $"vec_id")
    val ann = Similarity.knnLsh(planted, k = 2).select($"qid", $"vec_id")
    val hit = truth.join(ann, Seq("qid", "vec_id"), "left_semi")
      .groupBy($"qid").agg(count(lit(1)).as("n_hit"))
    val rec = truth.groupBy($"qid").agg(count(lit(1)).as("n_truth"))
      .join(hit, Seq("qid"), "left")
      .select($"qid",
        (coalesce($"n_hit", lit(0L)).cast("double") / $"n_truth".cast("double"))
          .as("recall"))
      .as[(Long, Double)].collect().toMap
    assert(rec.nonEmpty)
    // an exact copy has cosine exactly 1 (identical float ops), so the
    // top-2 truth set is exactly the two twins, both in the query's bucket
    assert(rec.values.forall(r => r >= 0.0 && r <= 1.0))
    for ((q, r) <- rec) assert(r === 1.0, s"query $q missed a same-bucket twin")
  }

  test("IVF ANN cosines agree with brute-force for the same pairs") {
    val brute = Similarity.knnBrute(emb, k = 1000000).select($"qid", $"vec_id", $"cos".as("bcos"))
    val ivf = Similarity.knnIvf(emb).join(brute, Seq("qid", "vec_id"))
    assert(ivf.count() > 0)
    assert(ivf.filter($"cos" =!= $"bcos").count() === 0)
  }

  test("LSH buckets are stable and bounded") {
    val b = Similarity.lshBuckets(emb).select($"bucket").as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 256))
  }

  test("native SeqDot == HOF fold, bit-for-bit, across the corpus") {
    import graft.functions.VectorFunctions
    val df = emb.select(VectorFunctions.asDouble($"embedding").as("emb"))
      .withColumn("emb2", reverse($"emb"))
    // <=> (null-safe): a regression making SeqDot return null must FAIL
    // this test, which a plain =!= would silently drop
    val bad = df.filter(
      !(VectorFunctions.dot($"emb", $"emb2") <=> VectorFunctions.dotHof($"emb", $"emb2")) ||
      !(VectorFunctions.dot($"emb", $"emb") <=> VectorFunctions.dotHof($"emb", $"emb")))
    assert(bad.count() === 0)
    // mismatched lengths → null, matching zip_with's null padding
    val r = df.limit(1).select(VectorFunctions.dot($"emb", slice($"emb", 1, 3))).collect()
    assert(r(0).isNullAt(0))
    // raw array<float> input is implicitly cast to array<double>, not
    // misread as 8-byte slots
    val rawBad = emb.select(
        VectorFunctions.dot($"embedding", $"embedding").as("a"),
        VectorFunctions.dot(VectorFunctions.asDouble($"embedding"),
          VectorFunctions.asDouble($"embedding")).as("b"))
      .filter(!($"a" <=> $"b"))
    assert(rawBad.count() === 0)
  }

  test("native hyperplane-bits expression == HOF formulation on the whole corpus") {
    val bad = Similarity.lshBuckets(Similarity.embCorpus(emb))
      .withColumn("hof", Similarity.lshBucketHof)
      .filter($"bucket" =!= $"hof")
    assert(bad.count() === 0)
  }

  test("semantic dedup: planted scaled copies dropped, originals kept, assignment unique") {
    val kept = Similarity.semanticDedup(emb).cache()
    // every planted copy (id ≥ 1e6, cos = 1.0 to its original) is dropped
    assert(kept.filter($"vec_id" >= 1000000L).count() === 0)
    // each kept vector appears exactly once (nearest-cell is a function)
    assert(kept.count() === kept.select($"vec_id").distinct().count())
    // survivors ∪ dropped = planted corpus
    val corpusN = Similarity.embCorpus(emb).count()
    val keptN = kept.count()
    assert(keptN > 0 && keptN < corpusN)
    // τ = 1.1 → nothing can be dropped: kept set is the whole corpus
    assert(Similarity.semanticDedup(emb, tau = 1.1).count() === corpusN)
  }

  test("PQ: codes well-formed; ADC == exact distance to the reconstruction") {
    val codes = Similarity.pqEncode(emb).cache()
    val nLabels = emb.select($"label").distinct().count().toInt
    // every vector encodes to exactly PqSubspaces codes, each a valid index
    assert(codes.filter(size($"codes") =!= Similarity.PqSubspaces).count() === 0)
    assert(codes.filter(exists($"codes", c => c < 0 || c >= nLabels)).count() === 0)
    // ADC is BY CONSTRUCTION the exact L2² to the code reconstruction:
    // recompute one query's adc against the reconstructed vectors and
    // compare with knnPq's ranking for that query
    import graft.functions.VectorFunctions.l2sq
    val cb = Similarity.pqCodebook(emb)
    val recon = codes.select($"vec_id", posexplode($"codes").as(Seq("s", "li")))
      .join(cb, Seq("li", "s"))
      .groupBy($"vec_id")
      .agg(array_sort(collect_list(struct($"s", $"cvec"))).as("parts"))
      .select($"vec_id", flatten(transform($"parts", p => p.getField("cvec"))).as("rvec"))
    val q = emb.filter($"vec_id" % 50 === 0).limit(1)
      .select($"vec_id".as("qid"), $"embedding".cast("array<double>").as("qemb"))
    val exact = recon.crossJoin(q).filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", l2sq($"qemb", $"rvec").as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"vec_id")) - 1)
      .filter($"rn" < 5)
      .select($"qid", $"rn".cast("long").as("rank"), $"vec_id")
    val got = Similarity.knnPq(emb).join(q.select($"qid"), "qid")
    assert(got.exceptAll(exact).count() === 0 && exact.exceptAll(got).count() === 0)
  }

  test("PQ ANN: high recall on separated clusters; beats random on the corpus") {
    // clustered fixture: 4 well-separated clusters, label = cluster →
    // the codebook resolves them and PQ must retrieve same-cluster members
    val dim = 16
    val rows = for {
      c <- 0 until 4
      i <- 0 until 25
    } yield {
      val base = Array.tabulate(dim)(d => if (d % 4 == c) 5.0f else 0.1f * ((c * 25 + i + d) % 7))
      (c * 25L + i, base, s"c$c")
    }
    val df = rows.toSeq.toDF("vec_id", "embedding", "label")
    val knn = Similarity.knnPq(df, queryMod = 10, k = 5, m = dim / 8)
    val cluster = udf((id: Long) => id / 25)
    val sameCluster = knn.filter(cluster($"qid") === cluster($"vec_id")).count()
    assert(sameCluster.toDouble / knn.count() > 0.95,
      s"PQ lost cluster structure: $sameCluster same-cluster of ${knn.count()}")
    // corpus: near-random embeddings concentrate distances, but PQ must
    // still beat the random-guess baseline (5/N ≈ 0.0025) by an order
    // of magnitude on exact-L2 recall@5
    import graft.functions.VectorFunctions.l2sq
    val base = emb.select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val q = base.filter($"vec_id" % 50 === 0).select($"vec_id".as("qid"), $"e".as("qe"))
    val exact = q.join(base, $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", l2sq($"qe", $"e").as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"vec_id")))
      .filter($"rn" <= 5).select($"qid", $"vec_id")
    val hits = Similarity.knnPq(emb).select($"qid", $"vec_id").intersect(exact).count()
    val recall = hits.toDouble / exact.count()
    assert(recall > 0.03, s"PQ recall@5 $recall not above noise")
  }

  test("IVF-PQ: probed-cell members retrieved; same-cluster recall on separated clusters") {
    // same clustered fixture as the PQ recall test: label = cluster, so
    // cells are the clusters and the probe stage must steer each query
    // to its own cluster before ADC ranks within it
    val dim = 16
    val rows = for {
      c <- 0 until 4
      i <- 0 until 25
    } yield {
      val base = Array.tabulate(dim)(d => if (d % 4 == c) 5.0f else 0.1f * ((c * 25 + i + d) % 7))
      (c * 25L + i, base, s"c$c")
    }
    val df = rows.toSeq.toDF("vec_id", "embedding", "label")
    val knn = Similarity.knnIvfPq(df, queryMod = 10, k = 5, nprobe = 1, m = dim / 8)
    val cluster = udf((id: Long) => id / 25)
    assert(knn.groupBy($"qid").count().filter($"count" =!= 5).count() === 0,
      "every query must fill k results from its probed cell")
    val sameCluster = knn.filter(cluster($"qid") === cluster($"vec_id")).count()
    // nprobe=1 on cleanly separated clusters → all results same-cluster
    assert(sameCluster === knn.count(),
      s"IVF probe leaked across clusters: $sameCluster of ${knn.count()}")
  }

  test("SQ: codes in [0,255]; reconstruction within half a bin; near-exact recall") {
    val codes = Similarity.sqEncode(emb).cache()
    assert(codes.filter(exists($"codes", c => c < 0 || c > 255)).count() === 0)
    // reconstruction error per dim is ≤ (mx-mn)/512 + an ulp: the bin
    // midpoint is at most half a bin from any value that maps to it
    val p = Similarity.sqParams(emb)
    val base = emb.select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val err = codes.join(base, "vec_id").crossJoin(broadcast(p))
      .select($"vec_id",
        aggregate(sequence(lit(0), size($"codes") - 1), lit(0.0d), (acc, i) => {
          val mn = element_at($"minv", i + 1); val mx = element_at($"maxv", i + 1)
          val rec = mn + (element_at($"codes", i + 1).cast("double") + lit(0.5)) * (mx - mn) / lit(256.0)
          val bin = (mx - mn) / lit(256.0)
          greatest(acc, abs(element_at($"e", i + 1) - rec) - bin * lit(0.5) - bin * lit(1e-9))
        }).as("excess"))
    assert(err.filter($"excess" > 1e-12).count() === 0,
      "a dimension reconstructed outside half a bin width")
    // SQ8 distances are near-exact → recall@5 vs exact L2 should be high
    import graft.functions.VectorFunctions.l2sq
    val q = base.filter($"vec_id" % 50 === 0).select($"vec_id".as("qid"), $"e".as("qe"))
    val exact = q.join(base, $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", l2sq($"qe", $"e").as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"vec_id")))
      .filter($"rn" <= 5).select($"qid", $"vec_id")
    val hits = Similarity.knnSq(emb).select($"qid", $"vec_id").intersect(exact).count()
    val recall = hits.toDouble / exact.count()
    assert(recall > 0.8, s"SQ8 recall@5 $recall — should be near-exact")
  }

  test("centroids: one row per (label, dim); zero-vector mean magnitude sane") {
    val c = Similarity.centroids(emb).cache()
    val dims = emb.select(size($"embedding")).as[Int].head()
    val labels = emb.select($"label").distinct().count()
    assert(c.count() === labels * dims)
    // mean of many ~N(0, 0.1) components should be small
    assert(c.filter(abs($"centroid") > 0.5).count() === 0)
  }

  test("hardPositives: a zero-norm junk vector ranks LAST, never displacing real mislabels") {
    // zero-norm → null cos: under plain ASC Spark puts nulls FIRST,
    // which would crown the junk vector every query's top mislabel and
    // diverge from the oracle's NaN-sorts-last; asc_nulls_last pins it
    val rows = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0f, 0f), 0),      // zero-norm junk, same label
      (2L, Seq(-1f, 0f), 0),     // the real mislabel signal
      (3L, Seq(0.9f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardPositives(rows, queryMod = 50, k = 2)
      .orderBy($"rn").collect().map(r => r.getAs[Long]("vec_id")).toSeq
    assert(got === Seq(2L, 3L),
      s"junk must sort below every finite cosine, got $got")
  }

  test("hardPositives: the mislabeled far vector ranks FIRST among same-label rows") {
    // label 0: a coherent neighbor (cos ~ 0.99) and a mislabeled
    // opposite vector (cos = -1) — the audit must surface the outlier
    // at rank 1 (cos ASC) and never cross labels
    val rows = Seq(
      (0L, Seq(1f, 0f), 0),      // query (0 % 50 == 0)
      (1L, Seq(0.9f, 0.1f), 0),  // coherent same-label
      (2L, Seq(-1f, 0f), 0),     // mislabeled: same label, opposite direction
      (3L, Seq(-1f, -1f), 1))    // different label: excluded
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardPositives(rows, queryMod = 50, k = 2)
      .orderBy($"rn").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rn"), r.getAs[Double]("cos")))
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((2L, 1L), (1L, 2L)),
      s"got ${got.toSeq}")
    assert(got.head._3 === -1.0, "the mislabeled row sits at cosine -1")
  }

  test("knownItemMrr: hand-computed ranks — a parallel decoy pushes the plant to rank 2") {
    // ids 0 and 25 get ×1.5 copies at +1e6 (cosine exactly 1). id 3 is a
    // PARALLEL decoy for query 0 with the same cosine 1.0 — the (cos,
    // vec_id) tie-break ranks it FIRST (3 < 1000000), so q=0's plant
    // lands at rank 2 (rr = 0.5) while q=25's plant is clean rank 1.
    val rows = Seq(
      (0L, Seq(1f, 0f), 0),
      (3L, Seq(2f, 0f), 0),   // parallel decoy, smaller id than the plant
      (1L, Seq(0f, 1f), 0),
      (25L, Seq(0.6f, 0.8f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knownItemMrr(rows).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("n_queries") === 2L)
    assert(r.getAs[Long]("n_found") === 2L, "scaling preserves hyperplane signs — the plant always buckets with its original")
    // rr(q=0) = 1e9 div 2, rr(q=25) = 1e9 div 1 → mrr = 1.5e9 / (2 * 1e9)
    assert(r.getAs[Double]("mrr") === 0.75, s"mrr ${r.getAs[Double]("mrr")}")
  }

  test("semanticDecontam: every planted eval leak is flagged near cosine 1; a clean store flags nothing") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val flagged: Map[Long, (Long, Double)] = graft.operators.Similarity
      .semanticDecontam(graft.operators.Similarity.embCorpus(e))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // every original eval item (mod 50 ⊂ mod 25) has its ×1.5 copy in the
    // store: scale-invariant buckets guarantee the candidate join sees it
    val evalIds = e.select($"vec_id").as[Long].collect().filter(_ % 50 == 0)
    assert(evalIds.nonEmpty)
    evalIds.foreach { q =>
      val (n, c) = flagged.getOrElse(q, fail(s"eval item $q not flagged"))
      assert(n >= 1L)
      assert(c > 0.999, s"planted copy of $q must score ~1: $c")
    }
    // without plants the corpus has no ≥0.95 pair — zero false flags
    assert(graft.operators.Similarity.semanticDecontam(e).count() === 0,
      "clean store must produce no contamination rows")
  }

  test("diversifiedTopK: per-cell cap rewrites a single-topic list into distinct cells") {
    // nearly-parallel vectors (one shared LSH bucket) split across two
    // hand-built cells: the raw top-3 is ALL cell 0 (the near-dup pile);
    // the diversified list must pull cell 1's best instead of the pile's
    // second-best
    // geometry picked against the deterministic hyperplanes: y ≤ 0.024
    // shares the query's bucket, y = 0.06 sits exactly one bit away
    // (inside the 1-bit probe set); cell 1's centroid at y = 0.05 pulls
    // vec 4 while vecs 1-3 stay with cell 0
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.05)))
      .toDF("cell", "cemb")
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0L),
      (1L, Array(1.0f, 0.01f), 0L),
      (2L, Array(1.0f, 0.02f), 0L),
      (3L, Array(1.0f, 0.024f), 0L),
      (4L, Array(1.0f, 0.06f), 1L)).toDF("vec_id", "embedding", "label")
    val raw = Similarity.knnLshMultiProbe(e, 50, 3)
      .filter($"qid" === 0L).select($"vec_id").as[Long].collect().toSet
    assert(raw === Set(1L, 2L, 3L),
      s"fixture power: the raw top-3 must be the cell-0 pile, got $raw")
    val div = Similarity.diversifiedTopK(e, cents, 50, 16, 3)
      .filter($"qid" === 0L).orderBy($"rank")
      .select($"rank", $"vec_id", $"cell").as[(Long, Long, Long)].collect()
    assert(div.toSeq === Seq((1L, 1L, 0L), (2L, 4L, 1L)),
      s"cap must keep cell 0's best and admit cell 1's best: ${div.toSeq}")
    // the real corpus keeps the invariant: no query repeats a cell
    val realE = Tables.embeddings(spark, Sf)
    val real = Similarity.diversifiedTopK(realE,
      Similarity.kmeansFitMemo(realE, Sf, "all"))
      .select($"qid", $"cell").as[(Long, Long)].collect()
    assert(real.nonEmpty)
    assert(real.groupBy(_._1).forall { case (_, cs) => cs.distinct.size == cs.size },
      "diversified lists must never repeat a cell within a query")
  }

}
