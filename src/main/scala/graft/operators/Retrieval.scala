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
