package graft

import org.apache.spark.sql.functions._

/** The write-hygiene contract behind q67: `maxRecordsPerFile` must actually
  * bound every output file — at corpus scale an unbounded part file is a
  * straggler/OOM for every downstream reader. (File names aren't
  * deterministic, so this lives here and the graded q67 row checks only the
  * read-back data.) */
class BoundedWriteSpec extends SparkSpec {

  test("maxRecordsPerFile caps every output part file") {
    val out = java.nio.file.Files.createTempDirectory("graft_bounded").toString
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
    val total = src.count()
    val cap = 1000L
    src.write.mode("overwrite").option("maxRecordsPerFile", cap.toString).parquet(out)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
    assert(perFile.agg(max(col("n"))).head().getLong(0) <= cap, "a part file exceeds the cap")
    assert(perFile.agg(sum(col("n"))).head().getLong(0) == total, "rows lost in the bounded write")
    assert(perFile.count() >= (total + cap - 1) / cap, "fewer files than the cap implies")
  }
}
