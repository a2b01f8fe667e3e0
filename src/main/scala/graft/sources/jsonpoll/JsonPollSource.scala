package graft.sources.jsonpoll

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource-V2 micro-batch source with the reference's HTTP-poll
  * connector semantics (ref: docs/kafka-connector-configurations.md:8-56):
  * each trigger polls an endpoint, and a SIMPLE_INCREMENTING offset —
  * "previous offset + number of records returned" — guarantees records are
  * consumed exactly once and never re-read (ref:
  * docs/kafka-connector-configurations.md:37-44).
  *
  * The "endpoint" here is an append-only JSON-lines file (this environment
  * has no egress; an HTTP GET would replace [[JsonPollMicroBatchStream.readAll]]
  * verbatim). Offsets are record counts, checkpointed by the engine —
  * restart resumes from the committed count, exactly like the Connect
  * offset topic.
  *
  * Schema matches the Kafka source contract downstream ops expect: a
  * single `value: string` column, one record per line.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.jsonpoll.JsonPollDataSource")
  *   .option("path", "/data/orders.jsonl").load()
  * }}}
  */
class JsonPollDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonPollDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "json-poll source requires .option(\"path\", <jsonl file>)")
    new JsonPollTable(path)
  }
}

object JsonPollDataSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType, nullable = false)))
  val Name = "graft.sources.jsonpoll.JsonPollDataSource"
}

class JsonPollTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"json-poll($path)"
  override def schema(): StructType = JsonPollDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = JsonPollDataSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new JsonPollMicroBatchStream(path)
        override def toBatch: Batch = throw new UnsupportedOperationException(
          "json-poll is a streaming source")
      }
    }
}

/** Offset = number of records consumed so far (SIMPLE_INCREMENTING). */
case class CountOffset(count: Long) extends Offset {
  override def json(): String = s"""{"count":$count}"""
}

class JsonPollMicroBatchStream(path: String) extends MicroBatchStream {

  /** One poll of the "endpoint": all currently-available records. */
  private def readAll(): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq.filter(_.nonEmpty)
  }

  override def initialOffset(): Offset = CountOffset(0L)

  override def latestOffset(): Offset = CountOffset(readAll().size.toLong)

  override def deserializeOffset(json: String): Offset = {
    val c = """"count"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad json-poll offset: $json"))
    CountOffset(c)
  }

  override def commit(end: Offset): Unit = () // engine checkpoints offsets

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].count
    val e = end.asInstanceOf[CountOffset].count
    if (e <= s) Array.empty
    else Array(JsonPollPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[JsonPollPartition]
        new JsonPollReader(p)
      }
    }

  override def stop(): Unit = ()
}

case class JsonPollPartition(path: String, startIdx: Long, endIdx: Long) extends InputPartition

class JsonPollReader(p: JsonPollPartition) extends PartitionReader[InternalRow] {
  private val lines: Iterator[String] = {
    // readAllLines is Int-bounded anyway; make the limit explicit instead
    // of letting .toInt wrap offsets silently negative
    require(p.endIdx <= Int.MaxValue, s"json-poll offset ${p.endIdx} exceeds file-source capacity")
    val all = Files.readAllLines(Paths.get(p.path), StandardCharsets.UTF_8)
      .asScala.filter(_.nonEmpty)
    all.slice(p.startIdx.toInt, p.endIdx.toInt).iterator
  }
  private var current: String = _

  override def next(): Boolean =
    if (lines.hasNext) { current = lines.next(); true } else false

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current))

  override def close(): Unit = ()
}
