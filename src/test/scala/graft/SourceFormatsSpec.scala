package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source-format breadth: the engine round-trips its tables through every
  * format shipped with this Spark build (parquet is the default
  * everywhere; csv/json/orc here), preserving row counts and values.
  * (No spark-avro connector jar in this build — avro is out of scope.)
  */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = Tables.lineitem(spark, Sf)
    .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag",
      date_format($"l_shipdate", "yyyy-MM-dd").as("ship"))

  test("csv round-trip with header + explicit schema") {
    val d = Files.createTempDirectory("graft-csv").toString
    sample.write.option("header", "true").mode("overwrite").csv(d)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(d)
    assert(back.count() === sample.count())
    assert(back.exceptAll(sample).count() === 0)
  }

  test("json lines round-trip") {
    val d = Files.createTempDirectory("graft-json").toString
    sample.write.mode("overwrite").json(d)
    val back = spark.read.schema(sample.schema).json(d)
    assert(back.exceptAll(sample).count() === 0 && back.count() === sample.count())
  }

  test("orc round-trip with predicate pushdown") {
    val d = Files.createTempDirectory("graft-orc").toString
    sample.write.mode("overwrite").orc(d)
    val q = spark.read.orc(d).filter($"l_quantity" > 45)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"), plan.take(800))
    assert(q.count() === sample.filter($"l_quantity" > 45).count())
  }

  test("parquet schema evolution: mergeSchema unions v1 and v2 file schemas") {
    val d = Files.createTempDirectory("graft-evo").toString
    // v1 writer: two columns; v2 adds a column (additive evolution)
    sample.select($"l_orderkey", $"l_quantity")
      .write.mode("overwrite").parquet(d + "/batch=1")
    sample.select($"l_orderkey", $"l_quantity", $"l_returnflag")
      .write.mode("overwrite").parquet(d + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert(merged.columns.toSet === Set("l_orderkey", "l_quantity", "l_returnflag", "batch"))
    assert(merged.count() === sample.count() * 2)
    // old files read the new column as null; new files carry values
    assert(merged.filter($"batch" === 1 && $"l_returnflag".isNotNull).count() === 0)
    assert(merged.filter($"batch" === 2 && $"l_returnflag".isNull).count() === 0)
  }
}
