package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.OrderPipeline
import graft.streaming.OrderStream

/** End-to-end JDBC sink test against an embedded Derby database — the S3
  * path with a real SQL engine: executors write per-partition batches via
  * the MERGE upsert, and redelivering the same micro-batch must be
  * idempotent (the at-least-once guarantee the reference's insert-mode
  * sink lacks, SURVEY §7.3).
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  // Spark's built-in Derby dialect maps StringType → CLOB, so its writer
  // calls setNull(CLOB) for null strings — which embedded Derby rejects
  // against the VARCHAR staging columns. Map strings to VARCHAR for the
  // test database (Postgres, the production target, has no such split).
  JdbcUpsertSpec.registerDerbyVarcharDialect()

  private def withTable[T](f: => T): T = {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE enriched_orders")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        """CREATE TABLE enriched_orders (
          |  order_id VARCHAR(255) PRIMARY KEY, product_name VARCHAR(255),
          |  quantity DOUBLE, price DOUBLE, order_date VARCHAR(50),
          |  total_price DOUBLE)""".stripMargin)
    } finally conn.close()
    f
  }

  private def readAll(): Map[String, Double] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT order_id, total_price FROM enriched_orders")
      val b = Map.newBuilder[String, Double]
      while (rs.next()) b += rs.getString(1) -> rs.getDouble(2)
      b.result()
    } finally conn.close()
  }

  private def upsert(df: org.apache.spark.sql.DataFrame): Unit =
    OrderStream.jdbcUpsertViaStaging(df, url, "enriched_orders", new Properties(), "order_id")

  test("redelivered micro-batch is idempotent; changed rows update in place") {
    withTable {
      val batch = Seq(
        ("1", "Lamp", 2.0, 3.5, "2020-01-01", 7.0),
        ("2", "Hat", 1.0, 10.0, "2020-01-02", 10.0)
      ).toDF("order_id", "product_name", "quantity", "price", "order_date", "total_price")
      upsert(batch)
      assert(readAll() === Map("1" -> 7.0, "2" -> 10.0))
      upsert(batch) // at-least-once redelivery — must not fail or duplicate
      assert(readAll() === Map("1" -> 7.0, "2" -> 10.0))
      val changed = Seq(("2", "Hat", 2.0, 10.0, "2020-01-02", 20.0))
        .toDF("order_id", "product_name", "quantity", "price", "order_date", "total_price")
      upsert(changed)
      assert(readAll() === Map("1" -> 7.0, "2" -> 20.0))
    }
  }

  /** All-null payload row for `id` — the Kafka tombstone after projection. */
  private def tombstones(ids: String*) =
    ids.map(id => (id, Option.empty[String], Option.empty[Double], Option.empty[Double],
      Option.empty[String], Option.empty[Double]))
      .toDF("order_id", "product_name", "quantity", "price", "order_date", "total_price")

  test("staging MERGE: tombstone deletes by PK; redelivered tombstone is a no-op") {
    withTable {
      upsert(Seq(
        ("1", "Lamp", 2.0, 3.5, "2020-01-01", 7.0),
        ("2", "Hat", 1.0, 10.0, "2020-01-02", 10.0)
      ).toDF("order_id", "product_name", "quantity", "price", "order_date", "total_price"))
      upsert(tombstones("1"))
      assert(readAll() === Map("2" -> 10.0)) // row 1 deleted
      upsert(tombstones("1")) // at-least-once redelivery → 0 rows affected
      assert(readAll() === Map("2" -> 10.0))
      // mixed batch: delete 2, insert 3, tombstone for an absent key 9
      upsert(tombstones("2", "9").unionByName(
        Seq(("3", "Mug", 1.0, 4.0, "2020-01-03", 4.0))
          .toDF("order_id", "product_name", "quantity", "price", "order_date", "total_price")))
      assert(readAll() === Map("3" -> 4.0))
    }
  }

  test("staging MERGE with orderCol: last record per key wins in a mixed batch") {
    withTable {
      upsert(Seq(("6", "Old", 1.0, 1.0, "2020-01-01", 1.0))
        .toDF("order_id", "product_name", "quantity", "price", "order_date", "total_price"))
      // several records per key in ONE batch — MERGE alone would raise a
      // cardinality violation; orderCol (the Kafka offset) reduces to the
      // last record per key first
      val batch = Seq(
        (1L, "5", Some("Pen"), Some(1.0), Some(2.0), Some("2020-01-01"), Some(2.0)),
        (2L, "5", None, None, None, None, None), // tombstone after insert
        (3L, "6", None, None, None, None, None), // tombstone…
        (4L, "6", Some("New"), Some(2.0), Some(3.0), Some("2020-01-02"), Some(6.0)) // …recreate
      ).toDF("off", "order_id", "product_name", "quantity", "price", "order_date", "total_price")
      OrderStream.jdbcUpsertViaStaging(batch, url, "enriched_orders", new Properties(),
        "order_id", Seq("off"))
      assert(readAll() === Map("6" -> 6.0)) // 5 never lands, 6 re-created
    }
  }

  test("row-wise sink applies mixed upserts and tombstones in partition order") {
    withTable {
      // single partition → deterministic row order; fresh keys → plain
      // INSERT is a valid "upsert" builder on Derby for this sequence
      val batch = Seq(
        ("5", Some("Pen"), Some(1.0), Some(2.0), Some("2020-01-01"), Some(2.0)),
        ("6", Some("Ink"), Some(2.0), Some(3.0), Some("2020-01-01"), Some(6.0)),
        ("5", None, None, None, None, None), // tombstone AFTER the insert above
        ("7", Some("Nib"), Some(1.0), Some(1.0), Some("2020-01-02"), Some(1.0))
      ).toDF("order_id", "product_name", "quantity", "price", "order_date", "total_price")
        .coalesce(1) // coalesce concatenates slices in order; repartition would not
      OrderStream.jdbcUpsertBatch(batch, url, "enriched_orders", new Properties(), "order_id",
        (t, cols, _) =>
          s"INSERT INTO $t (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})")
      assert(readAll() === Map("6" -> 6.0, "7" -> 1.0)) // 5 inserted then deleted
    }
  }

  test("streaming foreachBatch → JDBC: the full S3 path") {
    withTable {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[String]
      val q = OrderStream.process(input.toDF())
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val (valid, _) = OrderPipeline.route(b)
          upsert(OrderPipeline.projectEnriched(valid))
        }
        .start()
      input.addData(Seq(
        """{"order_id":10,"product_name":"a","quantity":2,"price":5,"order_date":"2020-01-01"}""",
        """{"order_id":11,"product_name":"b","quantity":-1,"price":5,"order_date":"2020-01-01"}"""))
      q.processAllAvailable()
      // redeliver the valid record (duplicate message on the topic)
      input.addData(Seq(
        """{"order_id":10,"product_name":"a","quantity":2,"price":5,"order_date":"2020-01-01"}"""))
      q.processAllAvailable(); q.stop()
      assert(readAll() === Map("10" -> 10.0)) // invalid row absent, dup harmless
    }
  }
}

object JdbcUpsertSpec {
  private lazy val registered: Unit = org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(
    new org.apache.spark.sql.jdbc.JdbcDialect {
      override def canHandle(u: String): Boolean = u.startsWith("jdbc:derby")
      override def getJDBCType(dt: org.apache.spark.sql.types.DataType) = dt match {
        case org.apache.spark.sql.types.StringType =>
          Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(255)", java.sql.Types.VARCHAR))
        case _ => None
      }
    })
  def registerDerbyVarcharDialect(): Unit = registered
}
