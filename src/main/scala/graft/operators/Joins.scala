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
}
