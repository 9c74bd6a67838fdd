package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._

/**
 * Inverted text index: token → posting rows, hive-partitioned by a token
 * hash bucket. This is the scan-avoidance path for term search (the
 * reference greps its corpus per query, search.py-style full scan; an
 * engine at 100 TB builds the index once and reads back only the queried
 * terms' buckets).
 *
 * Layout: `path/tb=<bucket>/…` with rows (tok, doc_id). A conjunctive
 * query filters `tb IN (buckets of its terms)` — a PARTITION filter, so
 * at most `nTerms` of the `nBuckets` directories are listed/read — then
 * `tok IN terms` inside them, and intersects posting lists with one
 * count-distinct aggregate (never a per-term self-join chain: k-way
 * intersection as a group-by scales to any k in one shuffle).
 */
object InvertedIndex {

  val nBuckets = 32

  /** Bucket of a token column — mirrors [[bucketOfTerm]] exactly. */
  def bucket(tok: Column): Column = pmod(xxhash64(tok), lit(nBuckets))

  /** Driver-side bucket of a query-term literal (same xxhash64 seed=42 the
    * SQL function applies), so the probe's IN-set is a plan-time constant
    * and Catalyst turns it into directory pruning. */
  def bucketOfTerm(term: String): Long = {
    val h = XxHash64(Seq(Literal(term)), 42L).eval(InternalRow.empty).asInstanceOf[Long]
    ((h % nBuckets) + nBuckets) % nBuckets
  }

  /** Build the index: one explode over distinct per-doc tokens, one
    * partitioned write. Token sets (not bags) — postings answer membership,
    * frequencies live in the q75 term-relevance path. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String): Unit =
    docs.select(col(idCol), explode(array_distinct(TextFns.tokens(col(textCol)))).as("tok"))
      .withColumn("tb", bucket(col("tok")))
      .write.mode("overwrite").partitionBy("tb").parquet(path)

  /** Conjunctive (AND-of-terms) query: doc ids containing every term. */
  def queryAll(spark: SparkSession, path: String, idCol: String,
               terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "conjunctive query needs at least one term")
    val buckets = terms.map(bucketOfTerm).distinct
    spark.read.parquet(path)
      .filter(col("tb").isin(buckets: _*))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("tok")).as("__nt"))
      .filter(col("__nt") === terms.length)
      .select(col(idCol))
  }

  /**
   * Phrase (exact token-adjacency) hits over a POSITIONAL posting relation
   * `toks` = (id, pos, tok): per-id count of occurrences of the consecutive
   * token sequence `phrase`. Each phrase term's postings are filter-pruned
   * first (on a positional index layout that filter is directory pruning,
   * exactly like [[queryAll]]); the adjacency check is a chain of equi
   * joins on (id, start-aligned pos) — keyed shuffles over the pruned
   * postings only, never the corpus, so cost scales with the phrase terms'
   * document frequency. This is the positional-index counterpart of
   * [[queryAll]]'s membership-only conjunctive query.
   */
  def phraseHits(toks: DataFrame, idCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "a phrase needs at least two tokens")
    val aligned = phrase.zipWithIndex.map { case (term, i) =>
      toks.filter(col("tok") === term)
        .select(col(idCol), (col("pos") - i).as("start"))
    }
    aligned.reduce((a, b) => a.join(b, Seq(idCol, "start")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /**
   * Proximity (NEAR/k) hits over the same positional posting relation:
   * per-id pairs of `termA`/`termB` occurrences within `maxDist` tokens of
   * each other, unordered — the relevance signal between [[queryAll]]'s
   * bag-of-words AND and [[phraseHits]]' exact adjacency. Both terms'
   * postings are df-pruned before the id-keyed join (directory pruning on
   * a positional index layout); the distance bound is a residual filter
   * on the joined pair, so cost scales with the terms' co-occurrence
   * frequency, never the corpus.
   */
  def proximityHits(toks: DataFrame, idCol: String, termA: String, termB: String,
                    maxDist: Int): DataFrame = {
    val a = toks.filter(col("tok") === termA)
      .select(col(idCol), col("pos").as("pa"))
    val b = toks.filter(col("tok") === termB)
      .select(col(idCol).as("__idb"), col("pos").as("pb"))
    a.join(b, a(idCol) === col("__idb") &&
        abs(col("pa") - col("pb")) <= maxDist)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pa") - col("pb"))).cast("long").as("min_dist"))
  }
}
