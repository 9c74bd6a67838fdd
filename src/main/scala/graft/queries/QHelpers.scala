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
    * `events.ts` has shipped as parquet TIMESTAMP(NANOS) (read as long
    * under nanosAsLong, truncated ns→µs here — the same truncation DuckDB
    * applies casting its ns read to TIMESTAMP) and, since the 2026-08-13
    * regeneration, as native TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ;
    * cast to session-zone TIMESTAMP — identity under the UTC session).
    * [[tsNorm]] dispatches on the observed dtype so both vintages read to
    * the SAME column type and values.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // FastParquet memoizes the SCHEMA per (path, file listing) — the
    // catalog role a metastore/table format plays at scale — so repeated
    // table opens skip the one-task footer-inference job; rows are always
    // re-read from the current files
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      tsNorm(graft.util.FastParquet.read(spark, s"$dir/$name.parquet"))
    } else graft.util.FastParquet.read(spark, s"$dir/$name.parquet")
  }

  /** Normalize an events-shaped `ts` column (legacy ns-as-long or native
    * µs NTZ/LTZ timestamp) to session-zone TIMESTAMP at µs precision.
    * Works on batch and streaming frames alike (pure projection). */
  def tsNorm(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }

  /** A literal in the RAW (file-schema) domain of an events `ts` column —
    * for filters/sentinel rows applied BEFORE [[tsNorm]]: raw ns long for
    * legacy files, TIMESTAMP_NTZ for native-µs files. */
  def tsRawLit(df: DataFrame, epochSec: Long): Column = df.schema("ts").dataType match {
    case LongType         => lit(epochSec * 1000000000L)
    case TimestampNTZType => timestamp_seconds(lit(epochSec)).cast(TimestampNTZType)
    case _                => timestamp_seconds(lit(epochSec))
  }

  /** Order-independent exact sum of a double column (via decimal). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** DuckDB spelling of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"cast(sum(cast($expr as decimal(18,$scale))) as double)"
}
