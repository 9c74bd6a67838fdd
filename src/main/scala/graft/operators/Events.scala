package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-time operators over the `events` table (SURVEY §2.10 extension
 * surface — the reference has no streaming runtime; these are the
 * batch-equivalent shapes that lift directly to Structured Streaming).
 */
object Events {

  /** Tumbling event-time window aggregation; `window()` is identical in
    * batch and streaming. */
  def tumblingCounts(events: DataFrame, every: String,
                     tsCol: String = "ts", typeCol: String = "event_type"): DataFrame =
    events
      .groupBy(window(col(tsCol), every).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col(typeCol),
        col("n_events"), col("sum_value"))

  /**
   * Sessionization via gaps-and-islands (lag + cumulative sum): a new session
   * starts when the gap to the previous event of the same user exceeds
   * `gapMinutes`. Batch-oracle-checkable; semantically equal to
   * `session_window(ts, gap)` (see [[sessionWindows]]).
   */
  def sessionize(events: DataFrame, gapMinutes: Int,
                 userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gapSec = gapMinutes * 60.0
    // fractional-second epoch (timestamp→double keeps microseconds) so gap
    // comparison is µs-exact — integer-second truncation would split
    // differently than the oracle on sub-second boundaries
    val withFlag = events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col(tsCol).cast("double") - col("prev_ts").cast("double") > gapSec, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withFlag.groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Native session windows (streaming-ready spelling of [[sessionize]]). */
  def sessionWindows(events: DataFrame, gap: String,
                     userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("w"), col(userCol))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col(userCol), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))

  /**
   * Bucketed range join: for each left row, count right rows with the same
   * key whose timestamp falls in [left.ts - windowSec, left.ts). A naive
   * theta join degenerates to per-key nested loops; instead both sides
   * bucket time into `windowSec`-wide cells and the left probes its own and
   * the preceding cell — every qualifying pair lands in exactly one of the
   * two equi-join arms, so the join stays a hash join on (key, bucket) and
   * the range predicate only post-filters. Epoch arithmetic in double keeps
   * microseconds exact (52-bit mantissa ≥ 51 bits needed).
   */
  def rangeCountPreceding(left: DataFrame, right: DataFrame, keyCol: String,
                          tsCol: String, windowSec: Long,
                          leftIdCol: String): DataFrame = {
    val lb = left
      .withColumn("__b", floor(col(tsCol).cast("double") / windowSec).cast("long"))
      .withColumn("__probe", explode(array(col("__b"), col("__b") - 1)))
    val rb = right.select(col(keyCol).as("__rk"), col(tsCol).as("__rts"))
      .withColumn("__probe", floor(col("__rts").cast("double") / windowSec).cast("long"))
    lb.join(rb,
        lb(keyCol) === rb("__rk") && lb("__probe") === rb("__probe") &&
          rb("__rts").cast("double") >= lb(tsCol).cast("double") - windowSec &&
          rb("__rts").cast("double") < lb(tsCol).cast("double"),
        "left")
      .groupBy(col(leftIdCol), col(keyCol), col(tsCol))
      .agg(count(col("__rk")).as("n_in_range"))
  }

  /**
   * As-of join (LEFT ASOF: for each left row, the latest right row with
   * right.ts <= left.ts and same key). Spark has no built-in; the scalable
   * plan is the union trick — tag both sides, sort within user by time, and
   * carry the last right timestamp forward with a running window. One
   * shuffle on the key; no range-join row explosion.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               leftCols: Seq[String]): DataFrame = {
    val l = left.select(col(keyCol), col(tsCol),
      struct(leftCols.map(col): _*).as("__lpayload"))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast(left.schema(tsCol).dataType))
    val r = right.select(col(keyCol), col(tsCol))
      .withColumn("__lpayload", lit(null).cast(l.schema("__lpayload").dataType))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(tsCol))
    // right rows sort before left rows at equal ts => inclusive (<=) semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(keyCol), col(tsCol), col("__lpayload.*"), col("asof_ts"))
  }
}
