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
}
