package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Join strategies for scale (SURVEY §2.4 + the 100 TB mandate). Equi joins
 * and broadcast variants are Catalyst built-ins; this object holds the
 * shapes Spark does not plan automatically.
 */
object Joins {

  /**
   * Deterministic salted equi-join for skewed keys: every fact row scatters
   * to one of `salts` sub-keys via a row hash, and the (small) dim side is
   * replicated across all sub-keys, so a hot key's rows spread over `salts`
   * reducers instead of hammering one. The result is row-identical to
   * `fact.join(dim, key)` — salting is pure physical re-distribution.
   *
   * AQE's skew-join split handles moderate skew at runtime; explicit
   * salting is the deterministic fallback when one key dominates a shuffle
   * (the classic null-key / celebrity-key case).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Anti-entropy table reconciliation: one full-outer join on the key,
   * emitting only rows where the two sides disagree — `missing_right`
   * (left-only), `missing_left` (right-only), or `mismatch` (both present,
   * compared columns differ). Values are compared through a canonical
   * `concat_ws` fingerprint built per side (portable across engines, unlike
   * a hash), so the compare is one string equality per row however many
   * columns are diffed. At 100 TB this is the replica-sync / migration
   * -validation primitive: a single co-partitioned shuffle on the key, and
   * the output is bounded by the drift, not the table size.
   */
  def tableDiff(left: DataFrame, right: DataFrame, keyCol: String,
                compareCols: Seq[String]): DataFrame = {
    def fp(prefix: String, df: DataFrame): DataFrame =
      df.select(col(keyCol).as(s"${prefix}_key"),
        concat_ws("|", compareCols.map(c => col(c).cast("string")): _*)
          .as(s"${prefix}_fp"))
    fp("l", left).join(fp("r", right), col("l_key") === col("r_key"), "full_outer")
      .withColumn("status",
        when(col("r_key").isNull, lit("missing_right"))
          .when(col("l_key").isNull, lit("missing_left"))
          .when(col("l_fp") =!= col("r_fp"), lit("mismatch")))
      .filter(col("status").isNotNull)
      .select(coalesce(col("l_key"), col("r_key")).as(keyCol), col("status"))
  }

  /**
   * Bloom-prefiltered equi-join — semi-join reduction for the case where
   * the selective side's KEYSET fits a few-MB bloom filter but the side
   * itself is too wide/large to broadcast as a hash relation: build the
   * bloom over the small side's keys (one scan), ship it to every big-side
   * task inside the filter closure, and drop non-matching rows BEFORE the
   * join's shuffle. False positives only let extra rows through to the
   * exact join — the result is row-identical to `big.join(small, key)`;
   * what changes is the shuffle volume, which at 100 TB drops by roughly
   * the join selectivity (a 1% match rate shuffles ~1% + fpp of the fact
   * table instead of all of it).
   *
   * This is the explicit spelling of Catalyst's own runtime bloom
   * (`spark.sql.optimizer.runtime.bloomFilter.enabled` /
   * InjectRuntimeFilter) for when the planner's heuristics decline —
   * e.g. the selective side is itself a subquery the optimizer won't
   * duplicate, or the join is produced by an API that assembles plans
   * dynamically.
   */
  def bloomPrefilteredJoin(big: DataFrame, bigKey: String,
                           small: DataFrame, smallKey: String,
                           expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // `stat.bloomFilter` hashes integral keys as longs and strings as UTF-8
    // bytes — the probe MUST use the matching overload or true matches are
    // silently dropped (a long-cast probe of a string-keyed filter never
    // hits). Dispatch on the big side's key dtype; refuse anything else
    // loudly rather than return missing rows.
    // the FILTER hashes with the small side's type, the PROBE with the big
    // side's — they must be the same class (both integral or both string)
    // or true matches are silently dropped; refuse mixed/unsupported pairs
    def cls(df: DataFrame, key: String): String = df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"bloomPrefilteredJoin: unsupported key type $other for '$key' — " +
          "only integral and string keys hash consistently with stat.bloomFilter")
    }
    val bigCls = cls(big, bigKey); val smallCls = cls(small, smallKey)
    require(bigCls == smallCls,
      s"bloomPrefilteredJoin: key type classes differ — '$bigKey' is $bigCls but " +
        s"'$smallKey' is $smallCls; the bloom filter's hashing would never match the probe")
    val integral = bigCls == "integral"
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val probe =
      if (integral) {
        val mc = udf((k: Long) => bf.mightContainLong(k))
        mc(col(bigKey).cast("long"))
      } else {
        val mc = udf((k: String) => k != null && bf.mightContainString(k))
        mc(col(bigKey))
      }
    big.filter(probe).join(small, col(bigKey) === col(smallKey))
  }
}
