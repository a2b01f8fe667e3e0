package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Engine
import graft.operators.Similarity
import graft.functions.VectorFunctions._

/** Dev tool: stage-delta timing for the trained-IVF MMR pipeline
  * (q_emb_mmrt). This is the tool that localized the round-11 probe
  * cliff: the candidate top-k window read 40 s single-core at x30
  * because AQE coalesced the small store-side join output to one
  * partition BEFORE the row-multiplying broadcast probe join — the
  * explosion (and its WindowGroupLimit sort) inherited that single
  * task. The fix (an explicit-count repartition on the store, exempt
  * from AQE coalescing) lives in [[Similarity.mmrRerankTrained]];
  * this tool remains the harness to re-measure the stages.
  *
  * Usage: graft.tools.ProfileMmr [sfDir]   (default /tmp/graft-scale/x30)
  */
object ProfileMmr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale/x30")
    val spark = Engine.session("graft-profile-mmr")
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$label%-24s] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.sources.Tables.embeddings(spark, dir)
    val cents = t("kmeansFit")(
      Similarity.kmeansFitMemo(e, dir, "all").localCheckpoint(true))
    val base = e.withColumn("emb", asDouble(col("embedding")))
      .select(col("vec_id"), col("emb"), l2norm(col("emb")).as("nrm"))
    val store = t("store (assign+join)") {
      val s = base
        .join(Similarity.kmeansAssign(e, cents)
          .select(col("vec_id"), col("cell")), "vec_id")
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
        .localCheckpoint(true)
      s.count(); s
    }
    val centN = cents.withColumn("cnrm", l2norm(col("cemb")))
    val q = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val probeW = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cell"))
    val probes = t("probes") {
      val p = q.crossJoin(broadcast(centN))
        .withColumn("ccos", cosineWithNorms(dot(col("qemb"), col("cemb")),
          col("qnrm"), col("cnrm")))
        .withColumn("prn", row_number().over(probeW))
        .filter(col("prn") <= 2)
        .select(col("qid"), col("qemb"), col("qnrm"), col("cell"))
        .localCheckpoint(true)
      p.count(); p
    }
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val cands = broadcast(probes).join(store, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineWithNorms(dot(col("qemb"), col("emb")),
        col("qnrm"), col("nrm")))
      .select(col("qid"), col("vec_id"), col("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 20)
    t("candidate top-k")(cands.write.format("noop").mode("overwrite").save())
    t("full mmrt")(Similarity.mmrRerankTrained(e, cents).write
      .format("noop").mode("overwrite").save())
    spark.stop()
  }
}
