package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic loose "order" records synthesized from the driver's
  * lineitem table, used to exercise the reference-parity pipeline
  * (OrderPipeline) at any scale factor with planted invalid rows —
  * the same trick as the reference's hand-edited fixture (ref:
  * src/data/raw_orders.json:53-55,165-167,207-210), but generated, so it
  * scales with sf and stays byte-reproducible in DuckDB for the oracle.
  *
  * Mutations keyed on k = l_orderkey*10 + l_linenumber:
  *   k%43=0 → order_id missing        k%31=0 → quantity missing
  *   k%17=0 → quantity negative       k%29=0 → quantity non-numeric
  *   k%23=0 → price negative          k%41=0 → price non-numeric
  *   k%37=0 → order_date as epoch-days digits (exercises T3)
  */
object RefOrders {

  def rawOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = $"l_orderkey" * 10 + $"l_linenumber"
    Tables.lineitem(spark, dir).select(
      when(k % 43 === 0, lit(null))
        .otherwise(concat_ws("-", $"l_orderkey", $"l_linenumber")).as("order_id"),
      concat(lit("part-"), $"l_partkey").as("product_name"),
      when(k % 31 === 0, lit(null))
        .when(k % 17 === 0, concat(lit("-"), $"l_quantity".cast("string")))
        .when(k % 29 === 0, lit("N/A"))
        .otherwise($"l_quantity".cast("string")).as("quantity"),
      when(k % 23 === 0, concat(lit("-"), $"l_extendedprice".cast("string")))
        .when(k % 41 === 0, lit("abc"))
        .otherwise($"l_extendedprice".cast("string")).as("price"),
      // date→string cast renders "yyyy-MM-dd" directly — same bytes as
      // date_format but without the per-row DateTimeFormatter machinery
      when(k % 37 === 0, datediff($"l_shipdate".cast("date"), lit("1970-01-01").cast("date")).cast("string"))
        .otherwise($"l_shipdate".cast("date").cast("string")).as("order_date")
    )
  }

  /** The DuckDB mirror of [[rawOrders]], spliced into each ref_* oracle. */
  val rawOrdersSql: String =
    """raw AS (
      |  SELECT
      |    CASE WHEN (l_orderkey*10 + l_linenumber) % 43 = 0 THEN NULL
      |         ELSE concat_ws('-', l_orderkey, l_linenumber) END AS order_id,
      |    'part-' || l_partkey AS product_name,
      |    CASE WHEN (l_orderkey*10 + l_linenumber) % 31 = 0 THEN NULL
      |         WHEN (l_orderkey*10 + l_linenumber) % 17 = 0 THEN '-' || CAST(l_quantity AS VARCHAR)
      |         WHEN (l_orderkey*10 + l_linenumber) % 29 = 0 THEN 'N/A'
      |         ELSE CAST(l_quantity AS VARCHAR) END AS quantity,
      |    CASE WHEN (l_orderkey*10 + l_linenumber) % 23 = 0 THEN '-' || CAST(l_extendedprice AS VARCHAR)
      |         WHEN (l_orderkey*10 + l_linenumber) % 41 = 0 THEN 'abc'
      |         ELSE CAST(l_extendedprice AS VARCHAR) END AS price,
      |    CASE WHEN (l_orderkey*10 + l_linenumber) % 37 = 0
      |         THEN CAST(datediff('day', DATE '1970-01-01', l_shipdate::DATE) AS VARCHAR)
      |         ELSE strftime(l_shipdate::DATE, '%Y-%m-%d') END AS order_date
      |  FROM lineitem
      |)""".stripMargin

  /** DuckDB mirror of OrderPipeline.processOrders over `raw`. */
  val processedSql: String =
    s"""WITH $rawOrdersSql,
       |v AS (
       |  SELECT order_id, product_name, quantity, price, order_date,
       |    TRY_CAST(quantity AS DOUBLE) AS quantity_d,
       |    TRY_CAST(price AS DOUBLE) AS price_d,
       |    NULLIF(concat_ws(', ',
       |      CASE WHEN order_id IS NULL THEN 'order_id' END,
       |      CASE WHEN product_name IS NULL THEN 'product_name' END,
       |      CASE WHEN quantity IS NULL THEN 'quantity' END,
       |      CASE WHEN price IS NULL THEN 'price' END,
       |      CASE WHEN order_date IS NULL THEN 'order_date' END), '') AS missing,
       |    NULLIF(concat_ws('; ',
       |      CASE WHEN TRY_CAST(price AS DOUBLE) IS NULL
       |             THEN 'Field ''price'' should be a number, but is of value: ' || price
       |           WHEN TRY_CAST(price AS DOUBLE) < 0
       |             THEN 'Field ''price'' should be non-negative' END,
       |      CASE WHEN TRY_CAST(quantity AS DOUBLE) IS NULL
       |             THEN 'Field ''quantity'' should be a number, but is of value: ' || quantity
       |           WHEN TRY_CAST(quantity AS DOUBLE) < 0
       |             THEN 'Field ''quantity'' should be non-negative' END), '') AS numerrs
       |  FROM raw
       |),
       |processed AS (
       |  SELECT
       |    order_id, product_name, quantity_d AS quantity, price_d AS price,
       |    CASE WHEN regexp_matches(order_date, '^[0-9]+$$')
       |         THEN strftime(DATE '1970-01-01' + TRY_CAST(order_date AS INTEGER), '%Y-%m-%d')
       |         ELSE order_date END AS order_date,
       |    CASE WHEN missing IS NULL AND numerrs IS NULL
       |         -- round_even = banker's rounding, mirroring Spark bround;
       |         -- plain ROUND is half-away and diverges on exact .xx5
       |         THEN ROUND_EVEN(quantity_d * price_d, 2) END AS total_price,
       |    (missing IS NULL AND numerrs IS NULL) AS is_valid,
       |    CASE WHEN missing IS NOT NULL THEN 'Missing required fields: ' || missing
       |         ELSE numerrs END AS error_message
       |  FROM v
       |)""".stripMargin
}
