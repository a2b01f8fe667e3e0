package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{Curation, TextAnalysis}
import graft.sources.Tables

/** Minimal, uncontaminated timing of the quality gate (no cache/checkpoint
  * stages beforehand — CacheManager plan substitution from earlier stages
  * can silently serve later identical subtrees from memory and corrupt
  * comparisons). Usage: dev/run.sh graft.tools.ProfileGate [sfDir].
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[gate] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    time("quality score only")(TextAnalysis.quality(Tables.documents(spark, sfDir), Seq("lang")))
    time("full qualityFilter")(Curation.qualityFilter(Tables.documents(spark, sfDir)))
    time("full qualityFilter #2")(Curation.qualityFilter(Tables.documents(spark, sfDir)))
    spark.stop()
  }
}
