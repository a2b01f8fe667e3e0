package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

import graft.sources.jsonpoll.JsonPollDataSource
import graft.streaming.OrderStream

/** End-to-end tests of the custom DSv2 json-poll source: incremental
  * consumption (SIMPLE_INCREMENTING — no re-reads), checkpoint-resume, and
  * composition with the order pipeline.
  */
class JsonPollSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(): Path = {
    val d = Files.createTempDirectory("jsonpoll")
    d.resolve("orders.jsonl")
  }

  private def append(f: Path, lines: String*): Unit =
    Files.write(f, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("incremental offsets: each record consumed exactly once across polls") {
    val f = tmpFile()
    append(f, """{"a":1}""", """{"a":2}""")
    val q = spark.readStream.format(JsonPollDataSource.Name)
      .option("path", f.toString).load()
      .writeStream.format("memory").queryName("poll1").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("poll1").count() === 2)
    append(f, """{"a":3}""")
    q.processAllAvailable()
    q.stop()
    // 3 rows total, no re-read of the first two
    val vals = spark.table("poll1").as[String].collect().sorted
    assert(vals === Array("""{"a":1}""", """{"a":2}""", """{"a":3}"""))
  }

  test("checkpoint resume: restart continues from committed count") {
    // memory sink doesn't support checkpoint recovery → use a parquet sink
    val f = tmpFile()
    val ckpt = Files.createTempDirectory("jsonpoll-ckpt").toString
    val out = Files.createTempDirectory("jsonpoll-out").toString
    def run(): Unit = {
      val q = spark.readStream.format(JsonPollDataSource.Name)
        .option("path", f.toString).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    append(f, """r1""", """r2""")
    run()
    assert(spark.read.parquet(out).count() === 2)
    append(f, """r3""")
    run()
    // restart consumed ONLY the new record — exactly-once across restarts
    val vals = spark.read.parquet(out).as[String].collect().sorted
    assert(vals === Array("r1", "r2", "r3"))
  }

  test("composes with the order pipeline end to end (S1 → D1 → V → R1)") {
    val f = tmpFile()
    append(f,
      """{"order_id":1,"product_name":"a","quantity":2,"price":3.5,"order_date":"2020-01-01"}""",
      """{"order_id":2,"product_name":"b","quantity":-1,"price":1,"order_date":"2020-01-01"}""")
    val src = spark.readStream.format(JsonPollDataSource.Name)
      .option("path", f.toString).load()
    val q = OrderStream.process(src)
      .writeStream.format("memory").queryName("pollpipe").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("pollpipe")
    assert(out.count() === 2)
    assert(out.filter($"is_valid").count() === 1)
    assert(out.filter(!$"is_valid").select($"order_id").as[String].head() === "2")
  }
}
