package graft

import graft.sources.LogStreamSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Kafka-wire-shaped DSv2 micro-batch source (sources/LogStreamSource.scala):
  * offset-range planning, admission control, and checkpoint recovery. */
class LogStreamSourceSpec extends SparkSpec {

  private def drain(sink: String, ckpt: String, rowsPerPartition: Long,
                    maxPerTrigger: Option[Long] = None): Int = {
    var r = spark.readStream.format("graft-log")
      .option("topics", "a,b")
      .option("partitionsPerTopic", "2")
      .option("rowsPerPartition", rowsPerPartition.toString)
    maxPerTrigger.foreach(m => r = r.option("maxPerTrigger", m.toString))
    val q = r.load()
      .writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0)
  }

  test("AvailableNow drains exactly rowsPerPartition per (topic,partition), no dups") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-log-ckpt").toString
    drain("log_drain", ckpt, 250L)
    val out = spark.table("log_drain")
    assert(out.count() == 2L * 2 * 250)
    assert(out.select("topic", "partition", "offset").distinct().count() == 2L * 2 * 250)
    val ranges = out.groupBy("topic", "partition")
      .agg(min("offset").as("lo"), max("offset").as("hi"), count(lit(1)).as("n"))
      .collect()
    assert(ranges.length == 4)
    ranges.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L && r.getAs[Long]("hi") == 249L
        && r.getAs[Long]("n") == 250L)
    }
  }

  test("admission control pages the backlog at maxPerTrigger rows per micro-batch") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-log-ckpt").toString
    // 4 partitions × 300 rows = 1200 total at ≤400/trigger ⇒ ≥3 data batches
    val batches = drain("log_paced", ckpt, 300L, Some(400L))
    assert(batches >= 3, s"expected ≥3 paced micro-batches, saw $batches")
    assert(spark.table("log_paced").count() == 1200L)
  }

  test("restart from the checkpoint consumes only offsets beyond the WAL") {
    val base = java.nio.file.Files.createTempDirectory("graft-log-restart").toString
    // the memory sink refuses checkpoint recovery; the file sink is the
    // recovery-capable shape (and what an ingest pipeline lands on anyway)
    def drainToFiles(rowsPerPartition: Long): Unit = {
      val q = spark.readStream.format("graft-log")
        .option("topics", "a,b")
        .option("partitionsPerTopic", "2")
        .option("rowsPerPartition", rowsPerPartition.toString)
        .load()
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainToFiles(100L)
    assert(spark.read.parquet(s"$base/out").count() == 400L)
    // the log grew; a restart from the SAME checkpoint must start each
    // partition at offset 100, not re-deliver [0, 100)
    drainToFiles(150L)
    val all = spark.read.parquet(s"$base/out")
    assert(all.count() == 600L)
    assert(all.select("topic", "partition", "offset").distinct().count() == 600L)
    assert(all.groupBy("topic", "partition").agg(max("offset").as("hi"))
      .collect().forall(_.getAs[Long]("hi") == 149L))
  }

  test("payload columns replay the pure record formula") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-log-ckpt").toString
    drain("log_payload", ckpt, 50L)
    val row = spark.table("log_payload")
      .filter(col("topic") === "b" && col("partition") === 1 && col("offset") === 7)
      .head()
    val (tsMicros, key, value) = LogStreamSource.record("b", 1, 1, 7L)
    assert(row.getAs[String]("key") == key)
    assert(row.getAs[String]("value") == value)
    assert(row.getAs[java.sql.Timestamp]("ts").getTime == tsMicros / 1000L)
  }
}
