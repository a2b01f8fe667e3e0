package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the driver's local[32] single-JVM harness but configured the
  * way a 1000-executor cluster job would be: AQE on (runtime re-plan,
  * skew-join splitting, partition coalescing), UTC session time zone
  * (oracle parity), and shuffle partitions sized to the actual
  * parallelism instead of the 200 default.
  */
object Engine {
  val ShufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def session(appName: String = "graft", master: String = s"local[$ShufflePartitions]"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", ShufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    tune(spark)
    spark
  }

  /** Apply engine runtime confs to an externally-created session (the
    * driver's Verify/Bench sessions call this so queries see the same
    * plan-shaping settings everywhere).
    */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    // events.parquet carries TIMESTAMP(NANOS) which Spark cannot represent;
    // read the raw int64 and convert explicitly in Tables.events.
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Surface parquet isAdjustedToUTC=false TIMESTAMP(MICROS) as
    // TimestampType directly AT THE SCAN instead of TIMESTAMP_NTZ (under
    // the pinned UTC session zone the instant is identical). With NTZ
    // inference on, Tables.ntzToUtc's post-scan cast kept the values right
    // but COST PUSHDOWN: UnwrapCastInBinaryComparison does not unwrap
    // NTZ→LTZ casts (timezone-dependent), so timestamp-literal predicates
    // stopped reaching the parquet row-group pruner. Scan-native
    // TimestampType keeps them pushable; ntzToUtc stays as a no-op safety
    // net for any future physical annotation drift.
    c.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark
  }
}
