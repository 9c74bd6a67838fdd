package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Shared plumbing for the declared query suite (`SparkEntry.queries`).
 *
 * Determinism conventions (SURVEY §5.1 / FIXTURES §3), applied to every query:
 *  - float aggregates go through decimal: `cast(sum(cast(x as decimal)) as
 *    double)` — exact, summation-order-independent, so Spark partial
 *    aggregation and the single-threaded DuckDB oracle agree bit-for-bit;
 *  - every result is totally ordered by its output columns;
 *  - scores derived from float math are rounded at a declared scale.
 */
object QHelpers {

  type Q = (SparkSession, String) => DataFrame

  /** Read one testdata table (TESTDATA.md layout).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as long and truncate ns→µs (integer DIV — the
    * same truncation DuckDB applies when casting its ns read to TIMESTAMP).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Order-independent exact sum of a double column (via decimal). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** DuckDB spelling of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"cast(sum(cast($expr as decimal(18,$scale))) as double)"
}
