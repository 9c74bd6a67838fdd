package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/**
 * DataSource V2 synthetic document corpus — `spark.read.format("graft-corpus")
 * .option("rows", n).option("partitions", p).load()`.
 *
 * Plays the role of the reference's crawled corpus (SURVEY §1.1 abstraction
 * A: `{index, website/source, info/text}` rows) at ANY scale without
 * storage: rows are generated deterministically from `doc_id` alone, so a
 * "100 TB" corpus is just a bigger `rows` option — every partition
 * generates its id range independently (embarrassingly parallel, no driver
 * state, no shuffle).
 *
 * Spark-native surface demonstrated: TableProvider → Table → ScanBuilder
 * with column pruning (`SupportsPushDownRequiredColumns`) — a
 * text-metadata-only query never materializes the document bodies.
 */
class SyntheticCorpusSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-corpus"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticCorpusSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new CorpusTable(
      rows = opts.getOrElse("rows", "1000").toLong,
      partitions = opts.getOrElse("partitions", "8").toInt,
      seed = opts.getOrElse("seed", "42").toLong)
  }
}

object SyntheticCorpusSource {
  /** Aggregate pushdowns accepted this JVM (spec/query observability). */
  val aggPushes = new java.util.concurrent.atomic.AtomicLong(0L)

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("index", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private[graft] val Sources = Array("uci", "kaggle", "aws", "pwc", "hf", "ieee", "odl", "bdsp")
  private[graft] val Vocab: Array[String] =
    ("the of and to in a is for with data set model learning image text user time value large " +
      "deep neural network series graph node edge label train test split feature row column " +
      "benchmark corpus token sample signal audio video frame open source research analysis")
      .split(" ")

  /** Deterministic row content from (seed, doc_id) alone. */
  def generate(seed: Long, docId: Long): (String, String, String, Long) = {
    var h = seed * 0x9e3779b97f4a7c15L + docId
    def next(): Long = { h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29; h & Long.MaxValue }
    val source = Sources((next() % Sources.length).toInt)
    val nWords = 20 + (next() % 180).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab((next() % Vocab.length).toInt))
      i += 1
    }
    val text = sb.toString
    val index = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$source/$docId".getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString
    }
    (source, index, text, text.length.toLong)
  }
}

private class CorpusTable(rows: Long, partitions: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-corpus($rows rows)"
  override def schema(): StructType = SyntheticCorpusSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CorpusScanBuilder(rows, partitions, seed)
}

private class CorpusScanBuilder(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var required: StructType = SyntheticCorpusSource.Schema
  private var pushedAgg: Option[Seq[String]] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // COUNT(*) / MIN(doc_id) / MAX(doc_id) are METADATA on this source (ids
  // are dense 0..rows-1 by construction) — answering them from the scan
  // options turns a 100 TB-equivalent generate-and-count into one literal
  // row, the same contract parquet footers give COUNT pushdown. Only the
  // ungrouped, complete-answerable shape is accepted; anything else falls
  // back to the normal scan.
  private def answers(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (agg.groupByExpressions().nonEmpty) return None
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("doc_id"))
        case _ => false
      }
    val kinds = agg.aggregateExpressions().map {
      case _: CountStar => Some("count")
      case m: Min if isDocId(m.column()) => Some("min")
      case m: Max if isDocId(m.column()) => Some("max")
      case _ => None
    }
    // min/max over zero rows are NULL — the metadata answers below can't say
    // that, so an empty source declines the pushdown and lets Spark
    // aggregate the (empty) scan itself.
    if (rows == 0 && kinds.flatten.exists(k => k == "min" || k == "max")) None
    else if (kinds.forall(_.isDefined)) Some(kinds.flatten.toSeq) else None
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    answers(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    answers(agg) match {
      case Some(kinds) =>
        pushedAgg = Some(kinds)
        SyntheticCorpusSource.aggPushes.incrementAndGet()
        true
      case None => false
    }

  override def build(): Scan = pushedAgg match {
    case Some(kinds) => new CorpusAggScan(rows, kinds)
    case None => new CorpusScan(rows, partitions, seed, required)
  }
}

/** The pushed-aggregate scan: ONE row of metadata-derived values. */
private class CorpusAggScan(rows: Long, kinds: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(kinds.zipWithIndex.map {
    case (k, i) => StructField(s"${k}_$i", LongType, nullable = false)
  })
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(CorpusRange(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    CorpusAggReaderFactory(kinds.map {
      case "count" => rows
      case "min" => 0L
      case "max" => rows - 1
    }.toArray)
}

private case class CorpusAggReaderFactory(values: Array[Long])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          values.map(_.asInstanceOf[Any]))
      override def close(): Unit = ()
    }
}

private case class CorpusRange(start: Long, end: Long) extends InputPartition

private class CorpusScan(rows: Long, partitions: Int, seed: Long,
                         required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(s => CorpusRange(s, math.min(rows, s + per)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CorpusReaderFactory(seed, required)
}

private class CorpusReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[CorpusRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      // column projectors bound once per partition, not per row
      private val fields: Array[(Long, (String, String, String, Long)) => Any] =
        required.fields.map(_.name match {
          case "doc_id" => (id: Long, _: (String, String, String, Long)) => id
          case "source" => (_: Long, g: (String, String, String, Long)) => UTF8String.fromString(g._1)
          case "index" => (_: Long, g: (String, String, String, Long)) => UTF8String.fromString(g._2)
          case "text" => (_: Long, g: (String, String, String, Long)) => UTF8String.fromString(g._3)
          case "n_chars" => (_: Long, g: (String, String, String, Long)) => g._4
        })
      private val needsGen = required.fieldNames.exists(f => f != "doc_id")
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = {
        val g = if (needsGen) SyntheticCorpusSource.generate(seed, id) else null
        // fill a fresh values array directly — no per-row Seq wrapper/map
        val values = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) { values(i) = fields(i)(id, g); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
