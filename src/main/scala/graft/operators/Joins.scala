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
}
