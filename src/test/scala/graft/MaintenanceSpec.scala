package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Maintenance
import graft.sources.Tables

/** Write-layout behaviors observed on real output files: bounded file
  * sizes, disjoint key ranges per file (file-level pruning works), and
  * schema evolution via mergeSchema.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactRangeSorted: bounded files with disjoint, sorted key ranges") {
    val out = Files.createTempDirectory("graft-compact").toString
    Maintenance.compactRangeSorted(
      Tables.lineitem(spark, Sf), out, numFiles = 4,
      maxRecordsPerFile = 2500L, "l_orderkey")
    // every row survived
    assert(spark.read.parquet(out).count() === Tables.lineitem(spark, Sf).count())
    // per-file key ranges are disjoint → min/max pruning can skip files
    val ranges = spark.read.parquet(out)
      .select(input_file_name().as("f"), $"l_orderkey")
      .groupBy($"f").agg(min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    assert(ranges.length >= 4)
    assert(ranges.forall(_.getAs[Long]("n") <= 2500L))
    val sorted = ranges.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("schema evolution: mergeSchema unions old and new file schemas") {
    val d = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$d/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$d/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert(merged.columns.toSet === Set("id", "name", "score", "batch"))
    val old = merged.filter($"id" === 1).select($"score").collect()(0)
    assert(old.isNullAt(0)) // old files surface the new column as null
  }
}
