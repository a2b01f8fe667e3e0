package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish parquet tables (see
  * /root/repo/TESTDATA.md). One function per table so every query goes
  * through a single scan definition — filters/projections placed on top of
  * these are pushed into the parquet reader by Catalyst (verify with
  * `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  /** The driver regenerates the parquet tables between rounds and the
    * timestamp physical annotation has varied (TIMESTAMP(MICROS) adjusted
    * to UTC, TIMESTAMP(NANOS), and most recently TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark 4 surfaces as TIMESTAMP_NTZ).
    * Every operator in this library was written against TimestampType, so
    * normalize NTZ columns to TimestampType here, at the single scan
    * definition. All entry points pin `spark.sql.session.timeZone=UTC`, so
    * the NTZ→LTZ cast reinterprets the same wall-clock value as the same
    * UTC instant — epoch arithmetic (`unix_micros`, `cast(ts as bigint)`)
    * and DuckDB's naive-timestamp reading agree exactly. The cast is a
    * zero-cost metadata reinterpretation (both types are micros-since-epoch
    * longs) — but it is NOT pushdown-transparent: Catalyst's
    * UnwrapCastInBinaryComparison refuses NTZ→LTZ (timezone-dependent), so
    * a timestamp-literal filter above this cast would NOT reach the parquet
    * row-group pruner. Engine.tune therefore disables NTZ inference
    * (`spark.sql.parquet.inferTimestampNTZ.enabled=false`) so these columns
    * surface as TimestampType AT THE SCAN and this function is a no-op
    * safety net (it still fires if a session skipped Engine.tune).
    * Limitation: only top-level columns are normalized — NTZ fields nested
    * inside struct/array/map pass through (fine for the driver's flat
    * TPC-H-ish schemas; recurse if nested timestamps ever appear).
    */
  private def ntzToUtc(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, d.col(f.name).cast("timestamp"))
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "region")))
  def nation(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "nation")))
  def customer(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "customer")))
  def supplier(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "supplier")))
  def part(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "part")))
  def orders(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "orders")))
  def lineitem(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "lineitem")))
  def documents(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "documents")))
  def embeddings(spark: SparkSession, dir: String): DataFrame = ntzToUtc(spark.read.parquet(p(dir, "embeddings")))

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * TimestampType (microseconds) cannot hold; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a raw
    * nanosecond long. Convert to a microsecond timestamp here (floor
    * division — matches DuckDB's ns→us truncation) so downstream operators
    * see a proper TimestampType column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(p(dir, "events"))
    raw.schema("ts").dataType.typeName match {
      // Integer FLOOR division: `/` on longs promotes to double and loses
      // precision at nanosecond magnitudes (~1.7e18 > 2^53), and a plain
      // `DIV` truncates toward zero — off by 1 µs for pre-epoch
      // timestamps. pmod-floor matches DuckDB's ns→µs conversion for any
      // sign.
      case "long" =>
        // ntzToUtc wraps this branch too: today ts is the only timestamp
        // column, but a regenerated events.parquet carrying an additional
        // NTZ column must not leak TIMESTAMP_NTZ past the one normalization
        // point
        ntzToUtc(raw.withColumn("ts",
          timestamp_micros(expr("(ts - ((ts % 1000) + 1000) % 1000) DIV 1000"))))
      case _      => ntzToUtc(raw)
    }
  }
}
