package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Disk-layout patterns for the 100 TB story: hive-style partitioned
  * parquet + static and dynamic partition pruning, asserted on the actual
  * plans/inputs rather than assumed.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-part").toString
    Tables.lineitem(spark, Sf)
      .withColumn("ship_year", year($"l_shipdate"))
      .write.partitionBy("ship_year").mode("overwrite").parquet(d)
    d
  }

  test("static partition pruning: a year filter reads only that year's files") {
    val q = spark.read.parquet(dir).filter($"ship_year" === 1997)
      .select($"l_orderkey", $"l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("ship_year"), plan.take(1500))
    // row-level proof: result equals the unpartitioned filter
    val expected = Tables.lineitem(spark, Sf).filter(year($"l_shipdate") === 1997).count()
    assert(q.count() === expected && expected > 0)
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try {
      val fact = spark.read.parquet(dir)
      // independent file-based dim (DPP wants a real relation on the
      // filtered side, not a subquery over the fact itself)
      val dimPath = Files.createTempDirectory("graft-dim").toString
      spark.range(1995, 2005).select($"id".cast("int").as("y"),
        concat(lit("year-"), $"id").as("label"))
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter($"label" === "year-1998")
      val joined = fact.join(dim, $"ship_year" === $"y")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"no dynamic pruning in plan:\n${plan.take(1500)}")
      val expected = Tables.lineitem(spark, Sf).filter(year($"l_shipdate") === 1998).count()
      assert(joined.count() === expected && expected > 0)
    } finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
  }

  test("parquet aggregate pushdown (v2 scan): MIN/MAX/COUNT answered from footer stats") {
    // whole-table MIN/MAX/COUNT can be answered from parquet footers
    // without touching row data — decisive for "how big is this 100 TB
    // table" probes. Requires the DSv2 parquet path, which this engine
    // does NOT enable globally: v2 reads drop bucketed-join support
    // (SkewAndBucketingSpec's co-located joins), so the swap is scoped
    // to stat-probe sessions. Both the plan shape and result parity with
    // the default path are pinned.
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      // bigint column: parquet aggregate pushdown supports int/long/float/
      // double/date min-max but bails on timestamps (conversion subtleties)
      val agg = spark.read.parquet(s"$Sf/lineitem.parquet")
        .agg(min($"l_orderkey").as("mn"), max($"l_orderkey").as("mx"),
          count(lit(1)).as("n"))
      val p = agg.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("PushedAggregation"), s"no PushedAggregation:\n${p.take(1200)}")
      val Array(row) = agg.collect()
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      val Array(expect) = Tables.lineitem(spark, Sf)
        .agg(min($"l_orderkey"), max($"l_orderkey"), count(lit(1))).collect()
      assert(row === expect)
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }
}
