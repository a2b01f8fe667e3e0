package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{OrderPipeline, RefOrders}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a named operator demonstration over the
  * driver's parquet tables; [[oracleSql]] carries the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  *
  * Numeric-stability convention for oracle-checked aggregates: sums of
  * money-like doubles go through exact DECIMAL arithmetic and are cast to
  * DOUBLE only at the end, so Spark's parallel summation order and DuckDB's
  * sequential order cannot produce last-ulp divergence. Averages are
  * computed as exact-decimal-sum / count for the same reason.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // Exact-decimal casts for money-like doubles (see scaladoc above).
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private def pct(c: Column): Column = c.cast("decimal(4,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Reference-parity pipeline (SURVEY §2 D1,T1-T3,V1-V4,E1-E2,P1,R1,K1)
    // Narrow map over loose records — no shuffle, single codegen stage.
    "ref_pipeline" -> { (s, dir) =>
      OrderPipeline.processOrders(RefOrders.rawOrders(s, dir))
    },
    // R1 valid branch + P1 projection — the enriched_orders topic payload.
    "ref_enriched" -> { (s, dir) =>
      val (valid, _) = OrderPipeline.route(OrderPipeline.processOrders(RefOrders.rawOrders(s, dir)))
      OrderPipeline.projectEnriched(valid)
    },
    // R1 invalid branch + K1 key — the invalid_orders topic payload.
    "ref_invalid" -> { (s, dir) =>
      val (_, invalid) = OrderPipeline.route(OrderPipeline.processOrders(RefOrders.rawOrders(s, dir)))
      OrderPipeline.withKafkaKey(invalid).select(col("order_id"), col("key"), col("error_message"))
    },
    // E1 envelope + K1 key — exact Kafka Connect JSON message bytes.
    "ref_envelope" -> { (s, dir) =>
      val (valid, _) = OrderPipeline.route(OrderPipeline.processOrders(RefOrders.rawOrders(s, dir)))
      OrderPipeline.toConnectEnvelope(OrderPipeline.withKafkaKey(valid))
        .select(col("key"), col("value"))
    },
    // ---- Relational core -------------------------------------------------
    // TPC-H Q1-style grouped aggregation: partial (map-side) aggregation +
    // single shuffle on the 2 grouping keys; scan prunes to 7 columns.
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" < lit("2001-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))).cast("double").as("sum_disc_price"),
          sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount")) * (lit(1) + pct($"l_tax"))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order")
        )
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "ref_pipeline" ->
      s"""${RefOrders.processedSql}
         |SELECT * FROM processed""".stripMargin,
    "ref_enriched" ->
      s"""${RefOrders.processedSql}
         |SELECT order_id, product_name, quantity, price, order_date, total_price
         |FROM processed WHERE is_valid""".stripMargin,
    "ref_invalid" ->
      s"""${RefOrders.processedSql}
         |SELECT order_id, coalesce(order_id, 'unknown') AS key, error_message
         |FROM processed WHERE NOT is_valid""".stripMargin,
    "ref_envelope" ->
      s"""${RefOrders.processedSql}
         |SELECT coalesce(order_id, 'unknown') AS key,
         |  to_json(struct_pack(
         |    schema := struct_pack(
         |      "type" := 'struct',
         |      fields := [
         |        struct_pack("type" := 'string', optional := true, field := 'order_id'),
         |        struct_pack("type" := 'string', optional := true, field := 'product_name'),
         |        struct_pack("type" := 'double', optional := true, field := 'quantity'),
         |        struct_pack("type" := 'double', optional := true, field := 'price'),
         |        struct_pack("type" := 'string', optional := true, field := 'order_date'),
         |        struct_pack("type" := 'double', optional := true, field := 'total_price')],
         |      optional := false, name := 'enriched_order'),
         |    payload := struct_pack(
         |      order_id := order_id, product_name := product_name,
         |      quantity := quantity, price := price,
         |      order_date := order_date, total_price := total_price))) AS value
         |FROM processed WHERE is_valid""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
