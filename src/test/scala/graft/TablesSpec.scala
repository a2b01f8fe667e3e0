package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Pins for the scan-definition layer: the memo data-key (session + data
  * fingerprint) and the recursive NTZ normalization.
  */
class TablesSpec extends SparkSpec {

  test("dataKey is stable for an unchanged dir and distinct across dirs/variants") {
    val k1 = Tables.dataKey(spark, Sf)
    val k2 = Tables.dataKey(spark, Sf)
    assert(k1 === k2, "same session + same unchanged dir must produce the same key")
    assert(Tables.dataKey(spark, "/root/testdata/sf0.01") !== k1)
    assert(Tables.dataKey(spark, Sf, "even") !== k1)
  }

  test("dataKey changes when the dir's data is regenerated (mtime/size change)") {
    val dir = Files.createTempDirectory("graft-datakey").toFile
    dir.deleteOnExit()
    val f = Paths.get(dir.toString, "t.parquet")
    Files.write(f, "v1".getBytes)
    Files.setLastModifiedTime(f, FileTime.fromMillis(1000000000000L))
    val before = Tables.dataKey(spark, dir.toString)
    // same listing, same mtimes -> same fingerprint
    assert(Tables.dataKey(spark, dir.toString) === before)
    // the driver regenerating a table bumps mtime (and usually size):
    // the key MUST move so session-lifetime memos can't serve stale stages
    Files.setLastModifiedTime(f, FileTime.fromMillis(1000000000001L))
    assert(Tables.dataKey(spark, dir.toString) !== before)
    // ...and a size change with a restored mtime still moves the key
    Files.write(f, "v2-longer".getBytes)
    Files.setLastModifiedTime(f, FileTime.fromMillis(1000000000000L))
    assert(Tables.dataKey(spark, dir.toString) !== before)
  }

  test("dataKey on a missing dir does not throw (marks it absent)") {
    val k = Tables.dataKey(spark, "/tmp/graft-no-such-dir-xyz")
    assert(k.contains("absent"))
  }

  test("NTZ normalization recurses into struct, array, and map types") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("plain", TimestampNTZType),
      StructField("s", StructType(Seq(
        StructField("inner_ts", TimestampNTZType),
        StructField("deep", StructType(Seq(
          StructField("deepest", TimestampNTZType)))))) ),
      StructField("arr", ArrayType(TimestampNTZType)),
      StructField("m", MapType(StringType, TimestampNTZType))))
    val ldt = java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)
    val row = org.apache.spark.sql.Row(
      1L, ldt,
      org.apache.spark.sql.Row(ldt, org.apache.spark.sql.Row(ldt)),
      Seq(ldt), Map("k" -> ldt))
    val df = spark.createDataFrame(List(row).asJava, schema)
    val tmp = Files.createTempDirectory("graft-ntz").toString + "/t"
    df.write.parquet(tmp)

    // force NTZ inference ON for this read so the parquet round-trip
    // surfaces TIMESTAMP_NTZ at every nesting level, then normalize
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val read = spark.read.parquet(tmp)
      assert(read.schema("plain").dataType === TimestampNTZType)
      val fixed = Tables.ntzToUtc(read)
      def noNtz(dt: DataType): Boolean = dt match {
        case TimestampNTZType => false
        case s: StructType    => s.fields.forall(f => noNtz(f.dataType))
        case a: ArrayType     => noNtz(a.elementType)
        case m: MapType       => noNtz(m.keyType) && noNtz(m.valueType)
        case _                => true
      }
      assert(fixed.schema.fields.forall(f => noNtz(f.dataType)),
        s"NTZ survived normalization: ${fixed.schema.treeString}")
      // value check: session TZ is UTC, so wall-clock reinterprets exactly
      val got = fixed.selectExpr(
        "unix_micros(plain)", "unix_micros(s.inner_ts)",
        "unix_micros(s.deep.deepest)", "unix_micros(arr[0])",
        "unix_micros(m['k'])").head()
      val want = ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
      (0 until 5).foreach(i => assert(got.getLong(i) === want))
    } finally {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    }
  }
}
