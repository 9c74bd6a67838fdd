package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable frequency
 * MV — the 100 TB answer to "how often does key X occur" when the key space
 * is too large to store exactly. The stored artifact is `depth × width`
 * counters (a few KB) regardless of corpus size; sketches of disjoint
 * batches ADD cell-wise, so incremental ingest just sums sketch tables —
 * the same mergeability contract as q127's HLL MV, for point frequency
 * instead of cardinality.
 *
 * Estimates are upper bounds: est(k) = min over the `depth` salted rows of
 * the hashed cell, so est ≥ true always, and est ≤ true + 2N/width with
 * probability ≥ 1 − (1/2)^depth (N = total count). Heavy hitters keep tight
 * estimates; the long tail inflates first — which is exactly the right
 * failure mode for corpus frequency monitoring (stopword/boilerplate
 * tracking, hot-key detection feeding q40-style salting decisions).
 *
 * Determinism: the row hashes are salted 60-bit sha256 slices
 * (Sampling.hashBucket's decomposition), a pure projection of (salt, key) —
 * identical across partitionings, re-runs and engines, so a DuckDB oracle
 * replays the whole sketch bit-for-bit. No seeded rand(), no JVM hashCode.
 */
object Sketches {

  /** Row-`salt` cell index of `key`: 60-bit sha256 slice of "cm<salt>:<key>"
    * mod `width` (hex digits 2-16; width a power of two keeps the
    * truncation exact — see Sampling.hashBucket). */
  def cmBucket(salt: Column, key: Column, width: Int): Column = {
    require(width > 0 && (width & (width - 1)) == 0, "width must be a power of two")
    conv(substring(sha2(concat(lit("cm"), salt.cast("string"), lit(":"), key), 256), 2, 15),
      16, 10).cast(LongType) % width
  }

  /** DuckDB spelling of [[cmBucket]] for oracle SQL. */
  def cmBucketSql(saltExpr: String, keyExpr: String, width: Int): String =
    s"(cast(('0x' || substr(sha256('cm' || cast($saltExpr as varchar) || ':' || $keyExpr), " +
      s"2, 15)) as bigint) % $width)"

  /** Build the sketch from PRE-AGGREGATED (key, weight) rows — the cell
    * value is the weighted sum of keys hashing into it. Feeding counts
    * instead of raw occurrences exploits additivity: one corpus scan
    * produces exact per-key counts (map-side combined), and the tiny count
    * table fans out `depth`-fold instead of the raw token stream. */
  def cmSketch(keyCounts: DataFrame, key: Column, weight: Column,
               depth: Int, width: Int): DataFrame =
    keyCounts
      .select(key.as("k"), weight.as("w"),
        explode(sequence(lit(0), lit(depth - 1))).as("salt"))
      .groupBy(col("salt"), cmBucket(col("salt"), col("k"), width).as("bucket"))
      .agg(sum(col("w")).as("cnt"))

  /** Point-estimate each row of `keys` against a sketch: min over the
    * `depth` salted cells. The sketch is at most depth×width rows —
    * broadcast it; carried columns on `keys` survive into the output.
    * LEFT join + coalesce-to-zero: an absent cell is a zero counter, so
    * a never-seen key estimates 0 (and a partially-empty key's min is
    * correctly pulled down to 0) instead of vanishing / inflating. */
  def cmEstimate(keys: DataFrame, keyCol: String, sketch: DataFrame,
                 depth: Int, width: Int): DataFrame = {
    val carried = keys.columns.map(col).toSeq
    keys
      .select(carried :+ explode(sequence(lit(0), lit(depth - 1))).as("salt"): _*)
      .withColumn("bucket", cmBucket(col("salt"), col(keyCol), width))
      .join(broadcast(sketch), Seq("salt", "bucket"), "left")
      .groupBy(carried: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }
}
