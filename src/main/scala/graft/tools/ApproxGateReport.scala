package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Curation
import graft.sources.Tables

/** Exercises the extreme-scale sketch variant of the quality gate
  * ([[Curation.qualityFilterApprox]]) against the exact gate on real data
  * volume and reports the divergence — the evidence that the documented
  * percentile→percentile_approx swap is safe where it would actually be
  * used. Not oracle-gated (the KLL-style sketch is engine-specific);
  * CurationSpec bounds the same divergence at sf0.001 AND sf0.1.
  *
  * Usage: dev/run.sh graft.tools.ApproxGateReport [sfDir] [accuracy]
  * Prints per-language exact vs sketch thresholds and kept counts, then
  * one JSON summary line.
  */
object ApproxGateReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val accuracy = args.lift(1).map(_.toInt).getOrElse(10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val exact = Curation.qualityFilter(docs)
      .select(col("doc_id"), col("lang"), col("q_thresh")).localCheckpoint()
    val approx = Curation.qualityFilterApprox(docs, accuracy = accuracy)
      .select(col("doc_id"), col("lang"), col("q_thresh")).localCheckpoint()

    // per-language thresholds + kept counts, side by side
    val perLang = exact.groupBy(col("lang"))
      .agg(first(col("q_thresh")).as("thresh_exact"), count(lit(1)).as("kept_exact"))
      .join(approx.groupBy(col("lang"))
          .agg(first(col("q_thresh")).as("thresh_sketch"), count(lit(1)).as("kept_sketch")),
        Seq("lang"), "full_outer")
      .orderBy(col("lang"))
    perLang.collect().foreach { r =>
      println(f"[gate] ${r.getAs[String]("lang")}%-4s exact=${r.getAs[Double]("thresh_exact")}%.9f " +
        f"sketch=${r.getAs[Double]("thresh_sketch")}%.9f " +
        f"kept ${r.getAs[Long]("kept_exact")}/${r.getAs[Long]("kept_sketch")}")
    }

    val e = exact.select(col("doc_id"))
    val a = approx.select(col("doc_id"))
    val nExact = e.count()
    val nDiff = e.exceptAll(a).count() + a.exceptAll(e).count()
    val frac = if (nExact == 0) 0.0 else nDiff.toDouble / nExact
    println(s"""{"tool":"approx_gate","sf":"$sfDir","accuracy":$accuracy,""" +
      s""""kept_exact":$nExact,"sym_diff":$nDiff,"divergence":$frac}""")
    spark.stop()
  }
}
