package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Deterministic sampling operators (beyond-reference extension: the
 * train-mix / eval-holdout side of a curation pipeline; the reference's
 * crawler keeps everything, `crawler.py:39-50`).
 *
 * Why hash-threshold instead of `df.sample()` / `df.stat.sampleBy()`:
 * seeded rand() sampling is partition-layout-dependent — a repartition, an
 * AQE re-plan, or a backfill re-run draws a DIFFERENT sample from the same
 * rows. Hash membership is a pure projection of the row's id: re-runs,
 * late-arriving rows and every cluster size make identical keep/drop
 * decisions with zero coordination, which is the only reproducibility story
 * that survives a 100 TB multi-tenant pipeline. Filters stay codegen'd and
 * pushdown-friendly (no shuffle, no driver state).
 */
object Sampling {

  /** 60-bit sha256 bucket of an id column, mod `buckets`: hex digits 2-16
    * of the sha256 (substring(hex, 2, 15) — high-order digits, NOT the low
    * bits) as a 60-bit integer. The 15-hex decomposition replays in DuckDB
    * without HUGEINT (EngineQueries.tokBucket lesson); unbiasedness comes
    * from the 60-bit width itself — any aligned 60-bit slice of sha256 is
    * uniform, and 2^60 ≡ 0 (mod 2^k) keeps power-of-two bucket counts
    * exact. */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    conv(substring(sha2(id.cast("string"), 256), 2, 15), 16, 10).cast(LongType) % buckets
  }

  /** Stratified sample: keep a row iff its id's 64-bucket hash falls under
    * the stratum's quota (`rates64`, in 64ths; `default64` otherwise) — the
    * exact, reproducible analog of `df.stat.sampleBy`. */
  def stratifiedSampleHash(df: DataFrame, stratumCol: String, idCol: String,
                           rates64: Map[String, Int], default64: Int): DataFrame = {
    require((default64 +: rates64.values.toSeq).forall(r => r >= 0 && r <= 64), "rates are 64ths")
    val quota = rates64.toSeq.sortBy(_._1).foldLeft(lit(default64)) {
      case (acc, (stratum, r)) => when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 64) < quota)
  }

  /**
   * Priority of a row for WEIGHTED sampling without replacement
   * (Duffield–Lund–Thorup priority sampling, CACM 2007): priority = w/u
   * with u uniform in (0,1]; the weighted sample of size k is the top-k by
   * priority. Inclusion probability is ∝ min(1, w/τ) for the (k+1)-largest
   * priority τ — the near-variance-optimal weighted subsample a
   * quality-weighted training mix needs.
   *
   * Integer spelling, log/float-free: u is a 28-bit sha256 slice (hex
   * digits 2-8, seeded by a caller salt so different draws decorrelate),
   * priority = (w << 28) DIV (u+1). Magnitude bound: w·2^28 must fit int64
   * ⇒ w < 2^35 — any per-document weight (chars, tokens, quality bp)
   * qualifies. Pure projection of (salt, id, w): reproducible across
   * re-runs, partitionings and engines, top-k-able per stratum with one
   * window — no coordination, no driver state.
   */
  def priority(id: Column, weight: Column, salt: String): Column = {
    val u = conv(substring(sha2(
      concat(lit(salt + ":"), id.cast("string")), 256), 2, 7), 16, 10).cast(LongType)
    call_function("div", weight.cast(LongType) * lit(268435456L), u + 1L)
  }

  /** DuckDB spelling of [[priority]] for oracle SQL. */
  def prioritySql(idExpr: String, weightExpr: String, salt: String): String =
    s"(($weightExpr * 268435456) // " +
      s"(cast(('0x' || substr(sha256('$salt:' || cast($idExpr as varchar)), 2, 7)) as bigint) + 1))"

  /** Piecewise-linear integer log2 in basis points of a POSITIVE bigint
    * SQL expression — the repo-wide cross-engine log spelling (BM25 idf,
    * LM perplexity): 10000·⌊log2 x⌋ plus a linear interpolation of the
    * fraction. Bit-identical in Spark and DuckDB (`//` for DIV there). */
  def log2BpSql(x: String): String =
    s"(10000 * (length(bin($x)) - 1) + (10000 * (($x) - " +
      s"shiftleft(cast(1 as bigint), length(bin($x)) - 1))) DIV " +
      s"shiftleft(cast(1 as bigint), length(bin($x)) - 1))"

  /**
   * DSIR importance scores (Xie et al. 2023, "Data Selection for Language
   * Models via Importance Resampling"): per-document log-likelihood ratio
   * of a TARGET hashed-unigram model over the RAW corpus model, in integer
   * bp. The hashed feature space (`buckets` sha256 buckets — the paper's
   * hashed n-gram trick) keeps both models CONSTANT-sized regardless of
   * corpus vocabulary: the model is one `buckets`-row frame that
   * broadcasts, so scoring at any corpus size is a map-side join plus one
   * partially-aggregated groupBy on the id — no corpus-sized shuffle
   * beyond the per-doc reduce. Add-1 smoothing on both models — BALANCED:
   * each of the `buckets` cells gets +1, so the normalizing totals carry
   * the matching `+buckets` term (log p = log(c+1) − log(tot+buckets),
   * the smoothed likelihood the paper's ratio implies). An empty target
   * partition fails loudly (raise_error riding the one-row totals frame)
   * instead of producing finite-but-meaningless scores.
   *
   * Returns (idCol, n_tok, score_bp); select by `score_bp` — top-m via
   * orderBy+limit (distributed top-k) or a threshold cut at extreme scale.
   */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 1024): DataFrame = {
    val l2 = log2BpSql _
    val toks = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("b", hashBucket(col("tok"), buckets))
    val feat = toks.groupBy(col("b")).agg(
        count(lit(1)).cast("long").as("rc"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).cast("long").as("tc"))
      .select(col("b"), expr(l2("tc + 1")).as("lt_bp"), expr(l2("rc + 1")).as("lr_bp"))
    val tot = toks.agg(
        count(lit(1)).cast("long").as("r_tot"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).cast("long").as("t_tot"))
      .withColumn("t_tot",
        when(col("t_tot") <= 0L, raise_error(lit(
          "DSIR: target partition selected zero tokens — scores would be meaningless")))
          .otherwise(col("t_tot")))
    toks.join(broadcast(feat), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tok"),
        sum(col("lt_bp") - col("lr_bp")).cast("long").as("__s0"))
      .crossJoin(broadcast(tot))
      .withColumn("score_bp",
        col("__s0") + col("n_tok") *
          (expr(l2(s"r_tot + $buckets")) - expr(l2(s"t_tot + $buckets"))))
      .select(col(idCol), col("n_tok"), col("score_bp"))
  }
}
