package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-fusion operators: combine multiple per-query rankings of the
  * same corpus (lexical BM25, embedding kNN, …) into one hybrid ranking —
  * the standard serving-side composition of the engine's two retrieval
  * stacks ([[TextAnalysis.bm25Search]] and [[Similarity.knnBrute]]/IVF).
  * Reference analogue: the reference serves one SQL-queryable view of its
  * validated pipeline output (`src/app/order_validator.py:71-142` routes
  * the enriched stream to the serving table that Q1 scans); a retrieval
  * deployment of the same data fuses its rankers before serving, which is
  * this operator.
  */
object Retrieval {

  /** Reciprocal-Rank Fusion (Cormack–Clarke–Büttcher, SIGIR'09):
    * score(d) = Σ_lists 1/(k + rank_list(d)), here in exact integer
    * nano-units — `1e9 div (k + rank)` — so per-doc sums are
    * order-independent BIGINT arithmetic, bit-identical in any engine
    * (the house oracle discipline; see BM25's odds-idf). RRF needs no
    * score calibration between lists — only ranks — which is exactly why
    * production hybrid search defaults to it.
    *
    * Inputs: each list carries (qid, doc_id, rank) with rank ≥ 1 and at
    * most N rows per qid (enforce upstream via top-N). Output: per qid,
    * the `topK` fused docs by (rrf_nanos desc, doc_id), with `n_lists` =
    * how many input lists ranked the doc.
    *
    * Scale: the union is ≤ |lists|·N rows per query; the one shuffle is
    * the (qid, doc_id) groupBy, and the final window partitions on qid —
    * high-cardinality key, frame bounded by |lists|·N. Nothing
    * corpus-sized moves: fusion cost is per-QUERY, independent of corpus
    * size, so a 1000-executor cluster fuses a billion queries by qid
    * partitioning alone.
    */
  def rrfFuse(lists: Seq[DataFrame], kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranking")
    val unioned = lists
      .map(_.select(col("qid"), col("doc_id"), col("rank")))
      .reduce(_ unionAll _)
    val scored = unioned
      .withColumn("c_nanos", expr(s"1000000000 div (${kRrf.toLong} + rank)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c_nanos")).as("rrf_nanos"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf_nanos").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Discount table for [[ndcgAudit]]: 1/log₂(rank+1) in integer
    * nano-units, precomputed HERE so the engine column and the DuckDB
    * VALUES literal are the same exact longs — `log` is not
    * bit-identical across engines, a shared constant table is
    * (Järvelin–Kekäläinen'02 discounts).
    */
  def ndcgDiscNanos(k: Int): Seq[(Int, Long)] =
    (1 to k).map(r => r -> math.floor(1e9 * math.log(2.0) / math.log(r + 1.0)).toLong)

  /** nDCG@k ranking-quality audit of the single-term BM25 ranking
    * against raw-frequency graded relevance: per query term, grade(doc)
    * = min(tf, 3) with gain 2^grade − 1, DCG over the BM25 top-k,
    * IDCG over the grade-ideal top-k of ALL matching docs, nDCG =
    * DCG/IDCG. This measures exactly what BM25's saturation + length
    * normalization DOES to a raw-tf ordering — the ranking-evaluation
    * number (alongside the MRR known-item audit) a retrieval deployment
    * tracks per release.
    *
    * Exactness: gains are integers, discounts ride the shared
    * [[ndcgDiscNanos]] nano-unit table, so DCG/IDCG are
    * order-independent BIGINT sums; nDCG is the single IEEE division.
    *
    * Scale shape: the term filter rides the exploded token stream
    * ([[TextAnalysis.bm25Search]]'s story — only |terms| postings reach
    * the groupBy); both rank windows partition on the term over
    * posting-bounded rows; the discount join is a ≤ k-row broadcast.
    * Output = |terms| rows.
    */
  def ndcgAudit(docs: DataFrame, terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "ndcg needs at least one term")
    val spark = docs.sparkSession
    import spark.implicits._
    val disc = ndcgDiscNanos(k).toDF("rank", "disc_nanos")
    val td = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    val stats = td.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sumdl"))
    val post = td
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("gain", expr("shiftleft(1L, cast(least(tf, 3L) as int)) - 1L"))
      .localCheckpoint(false)
    val dfx = post.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // single-term BM25 score (bm25Search's exact operand tree, ungrouped)
    val scored = post.join(broadcast(dfx), "w")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sumdl").cast("double") / col("n_docs").cast("double"))
      .withColumn("c_nanos", floor(
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) *
          (col("tf") * lit(k1 + 1) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))) *
          lit(1e9)).cast("long"))
    val wRank = Window.partitionBy(col("w")).orderBy(col("c_nanos").desc, col("doc_id"))
    val dcg = scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .join(broadcast(disc), "rank")
      .groupBy(col("w"))
      .agg(sum(col("gain") * col("disc_nanos")).as("dcg_nanos"))
    val wIdeal = Window.partitionBy(col("w")).orderBy(col("gain").desc, col("doc_id"))
    val idcg = post.withColumn("rank", row_number().over(wIdeal))
      .filter(col("rank") <= k)
      .join(broadcast(disc), "rank")
      .groupBy(col("w"))
      .agg(sum(col("gain") * col("disc_nanos")).as("idcg_nanos"),
        count(lit(1)).as("n_ranked"))
    val matched = post.groupBy(col("w")).agg(count(lit(1)).as("n_matched"))
    dcg.join(idcg, "w").join(matched, "w")
      .select(col("w").as("term"), col("n_matched"), col("n_ranked"),
        col("dcg_nanos"), col("idcg_nanos"),
        (col("dcg_nanos").cast("double") / col("idcg_nanos").cast("double"))
          .as("ndcg"))
  }

  /** DuckDB mirror of [[ndcgAudit]] over `src` — same constant tables,
    * same operand tree.
    */
  def ndcgAuditSql(terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, src: String = "documents"): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val discVals = ndcgDiscNanos(k).map { case (r, d) => s"($r, $d)" }.mkString(", ")
    s"""WITH ndisc(rank, disc_nanos) AS (VALUES $discVals),
       |ntd AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks
       |  FROM (SELECT doc_id, ${graft.operators.Dedup.toksSql} AS toks FROM $src)),
       |nstats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sumdl FROM ntd),
       |npost AS (
       |  SELECT doc_id, dl, w, CAST(COUNT(*) AS BIGINT) AS tf,
       |    (CAST(1 AS BIGINT) << CAST(LEAST(COUNT(*), 3) AS INTEGER)) - 1 AS gain
       |  FROM (SELECT doc_id, dl, unnest(toks) AS w FROM ntd)
       |  WHERE w IN ($termList)
       |  GROUP BY doc_id, dl, w),
       |ndf AS (SELECT w, COUNT(*) AS df FROM npost GROUP BY w),
       |nsc AS (
       |  SELECT p.w, p.doc_id, p.gain,
       |    CAST(FLOOR(
       |      (s.n_docs - d.df + 0.5) / (d.df + 0.5) *
       |        (p.tf * ${k1 + 1} /
       |          (p.tf + $k1 * (${1 - b} + $b * p.dl / (CAST(s.sumdl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) *
       |      1e9) AS BIGINT) AS c_nanos
       |  FROM npost p JOIN ndf d USING (w) CROSS JOIN nstats s),
       |ndcg_ AS (
       |  SELECT w, SUM(gain * disc_nanos) AS dcg_nanos FROM (
       |    SELECT w, gain,
       |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY c_nanos DESC, doc_id) AS rank
       |    FROM nsc) t JOIN ndisc USING (rank)
       |  WHERE rank <= $k GROUP BY w),
       |nidcg AS (
       |  SELECT w, SUM(gain * disc_nanos) AS idcg_nanos, COUNT(*) AS n_ranked FROM (
       |    SELECT w, gain,
       |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY gain DESC, doc_id) AS rank
       |    FROM npost) t JOIN ndisc USING (rank)
       |  WHERE rank <= $k GROUP BY w),
       |nmat AS (SELECT w, COUNT(*) AS n_matched FROM npost GROUP BY w)
       |SELECT g.w AS term, CAST(m.n_matched AS BIGINT) AS n_matched,
       |  CAST(i.n_ranked AS BIGINT) AS n_ranked,
       |  CAST(g.dcg_nanos AS BIGINT) AS dcg_nanos,
       |  CAST(i.idcg_nanos AS BIGINT) AS idcg_nanos,
       |  CAST(g.dcg_nanos AS DOUBLE) / CAST(i.idcg_nanos AS DOUBLE) AS ndcg
       |FROM ndcg_ g JOIN nidcg i ON g.w = i.w JOIN nmat m ON g.w = m.w""".stripMargin
  }

  /** Min-max-normalized weighted SCORE fusion — the score-based
    * complement to [[rrfFuse]] (the two production hybrid-search
    * defaults: RRF when scores aren't comparable, normalized
    * convex-combination when the per-list score SHAPE carries signal
    * RRF's ranks throw away — a runaway-top-1 list should dominate a
    * flat one at equal ranks). Per (list, query): scores rescale to
    * [0, 1] by the list's own min/max over that query's entries (a
    * single-valued or constant list normalizes to 1 — present at the
    * list's own ceiling); fused score = Σ_l w_l·norm_l with absent docs
    * contributing 0 from that list.
    *
    * Exactness: one subtraction-division pair per row, spelled
    * identically in both engines; ties break (score desc, doc_id).
    * Scale = [[rrfFuse]]'s: per-query bounded lists, one (qid, doc_id)
    * groupBy, qid-partitioned rank window — fusion cost is per-QUERY,
    * corpus-free.
    */
  def hybridFuse(lists: Seq[(DataFrame, Double)], topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "hybridFuse needs at least one ranking")
    val tagged = lists.zipWithIndex.map { case ((df, w), i) =>
      df.select(col("qid"), col("doc_id"), col("score").cast("double").as("s"),
        lit(i).as("l"), lit(w).as("w"))
    }.reduce(_ unionAll _)
    val bounds = tagged.groupBy(col("qid"), col("l"))
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    val contrib = tagged.join(bounds.hint("shuffle_hash"), Seq("qid", "l"))
      .withColumn("norm",
        when(col("mx") > col("mn"), (col("s") - col("mn")) / (col("mx") - col("mn")))
          .otherwise(1.0))
      .select(col("qid"), col("doc_id"), (col("w") * col("norm")).as("c"))
    val w = Window.partitionBy(col("qid")).orderBy(col("hybrid").desc, col("doc_id"))
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("hybrid"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Global top-`n` of `df` by (`scoreCol` desc, `idCol`) with a dense
    * 1-based rank — the bounded list-builder feeding [[rrfFuse]]. The
    * orderBy+limit pair compiles to TakeOrderedAndProject (distributed
    * per-partition top-n, one tiny driver merge — never a full sort), and
    * the unpartitioned rank window then runs on ≤ n rows by construction.
    */
  def topNRanked(df: DataFrame, scoreCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.orderBy(col(scoreCol).desc, col(idCol))
    df.orderBy(col(scoreCol).desc, col(idCol)).limit(n)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol).as("doc_id"), col("rank"))
  }
}
