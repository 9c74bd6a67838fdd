package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/**
 * Kafka-wire-shaped micro-batch streaming source —
 * `spark.readStream.format("graft-log").option("topics", "clicks,orders")
 * .option("partitionsPerTopic", 4).option("rowsPerPartition", n).load()`.
 *
 * The sandbox has no broker, so this source synthesizes the stream — but
 * the STREAMING MACHINERY is the real Kafka integration shape
 * (kafka-source parity, and the consume side of the reference's periodic
 * re-crawl, `scheduler.py:21-33` feeding `crawler.py:39-50`):
 *
 *   - the Kafka record schema: (topic, partition, offset, ts, key, value);
 *   - per-(topic,partition) OFFSET ranges as the replayable progress
 *     primitive — `initialOffset` / `latestOffset` / `deserializeOffset` /
 *     `commit` drive the checkpoint WAL exactly as for Kafka offsets, so
 *     restart recovery (q155's contract) holds here too;
 *   - admission control ([[SupportsAdmissionControl]]): `maxPerTrigger`
 *     caps rows per micro-batch (Kafka's `maxOffsetsPerTrigger`), the cap
 *     split evenly across partitions — a 100 TB backlog drains in bounded,
 *     planable batches instead of one giant catch-up batch;
 *   - [[SupportsTriggerAvailableNow]]: `Trigger.AvailableNow` pins the
 *     drain target at query start and pages to exactly that offset, then
 *     stops — the scheduled-ingest trigger;
 *   - one [[InputPartition]] per (topic, partition) per batch: maximum
 *     source parallelism equals log partitions, like Kafka's.
 *
 * Payloads are a pure function of (topic, partition, offset) — a JSON
 * value a downstream `from_json` parses — so any aggregate over the
 * stream is replayable by the DuckDB oracle from `generate_series`.
 */
class LogStreamSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogStreamSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new LogTable(
      topics = opts.getOrDefault("topics", "events").split(",").map(_.trim).filter(_.nonEmpty),
      partitionsPerTopic = opts.getOrDefault("partitionsPerTopic", "4").toInt,
      rowsPerPartition = opts.getOrDefault("rowsPerPartition", "1000").toLong,
      maxPerTrigger = Option(opts.get("maxPerTrigger")).map(_.toLong))
  }
}

object LogStreamSource {
  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** 2026-01-01T00:00:00Z — event time base; record N in a partition is N
    * seconds after it. */
  val BaseEpochSec: Long = 1767225600L

  /** Deterministic record content from (topicIndex, partition, offset)
    * alone — mirrored literally by the SQL oracle. */
  def amount(tix: Int, partition: Int, offset: Long): Long =
    (offset * 2654435761L + partition * 40503L + tix * 69069L) % 1000L

  def userId(tix: Int, partition: Int, offset: Long): Long =
    (offset * 31L + partition * 7L + tix * 3L) % 500L

  def record(topic: String, tix: Int, partition: Int, offset: Long): (Long, String, String) = {
    val uid = userId(tix, partition, offset)
    val amt = amount(tix, partition, offset)
    val tsMicros = (BaseEpochSec + offset) * 1000000L
    (tsMicros, s"u$uid", s"""{"user":"u$uid","amount":$amt}""")
  }
}

private class LogTable(topics: Array[String], partitionsPerTopic: Int,
                       rowsPerPartition: Long, maxPerTrigger: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"graft-log(${topics.mkString(",")})"
  override def schema(): StructType = LogStreamSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = LogStreamSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new LogMicroBatchStream(topics, partitionsPerTopic, rowsPerPartition, maxPerTrigger)
    }
}

/** Offsets = one long per (topic, partition), like Kafka's
  * `{"topic":{"0":off}}`; serialized sorted so the WAL entry is stable. */
private case class LogOffset(offsets: Map[(String, Int), Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy { case ((t, p), _) => (t, p) }
      .map { case ((t, p), o) => s"$t:$p=$o" }.mkString(";")
}

private object LogOffset {
  def parse(json: String): LogOffset = LogOffset(
    json.split(";").filter(_.nonEmpty).map { part =>
      val Array(tp, o) = part.split("=")
      val i = tp.lastIndexOf(':')
      (tp.substring(0, i), tp.substring(i + 1).toInt) -> o.toLong
    }.toMap)
}

private case class LogRange(topic: String, tix: Int, partition: Int,
                            from: Long, until: Long) extends InputPartition

private class LogMicroBatchStream(topics: Array[String], partitionsPerTopic: Int,
                                  rowsPerPartition: Long, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val allParts: Seq[(String, Int)] =
    topics.toSeq.flatMap(t => (0 until partitionsPerTopic).map(p => (t, p)))
  private val logEnd = LogOffset(allParts.map(_ -> rowsPerPartition).toMap)
  // AvailableNow pins the drain target at query start; a live log would
  // snapshot its current high-water mark here instead of the fixed end
  @volatile private var availableNowTarget: Option[LogOffset] = None

  override def initialOffset(): Offset = LogOffset(allParts.map(_ -> 0L).toMap)
  override def deserializeOffset(json: String): Offset = LogOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(logEnd)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset = logEnd

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffset].offsets
    val target = availableNowTarget.getOrElse(logEnd).offsets
    limit match {
      case r: ReadMaxRows =>
        // split the per-trigger row cap evenly across partitions with a
        // backlog (Kafka maxOffsetsPerTrigger semantics)
        val backlogged = allParts.filter(tp => from(tp) < target(tp))
        if (backlogged.isEmpty) LogOffset(from)
        else {
          val share = math.max(1L, r.maxRows() / backlogged.size)
          LogOffset(from.map { case (tp, o) =>
            tp -> math.min(target(tp), if (from(tp) < target(tp)) o + share else o)
          })
        }
      case _ => LogOffset(target)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].offsets
    val e = end.asInstanceOf[LogOffset].offsets
    allParts.zipWithIndex.collect {
      case ((t, p), _) if e(t, p) > s(t, p) =>
        LogRange(t, topics.indexOf(t), p, s(t, p), e(t, p)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = LogReaderFactory
}

private object LogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[LogRange]
    new PartitionReader[InternalRow] {
      private var off = r.from - 1
      override def next(): Boolean = { off += 1; off < r.until }
      override def get(): InternalRow = {
        val (ts, key, value) = LogStreamSource.record(r.topic, r.tix, r.partition, off)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.topic), r.partition, off, ts,
          UTF8String.fromString(key), UTF8String.fromString(value)))
      }
      override def close(): Unit = ()
    }
  }
}
