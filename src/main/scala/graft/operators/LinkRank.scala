package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-authority scoring (PageRank power iteration) over an edge list — the
 * quality-prior pass a crawl-scale curation pipeline runs on its host/link
 * graph to weight or schedule sources (the reference's crawler walks exactly
 * such a seed→listing→page graph, crawler.py:17-50, but never scores it).
 *
 * All arithmetic is EXACT INTEGER math (the NOTES round-5 rule: no
 * cross-engine floating-point accumulation): ranks live in integer "rank
 * units" (1e12 per node at start), each edge contribution is an integral
 * division `(rank * 85) div (outdeg * 100)`, and the teleport term is the
 * constant `RankUnit * 15 / 100`. Sums of longs are order-independent, so
 * the result is bit-identical in any engine — a DuckDB oracle can replay the
 * whole iteration with `//`.
 *
 * Scale shape: each iteration is the canonical two-exchange PageRank step —
 * edges ⋈ ranks shuffled on `src`, contributions aggregated on `dst`. Both
 * shuffles hash-partition on the node id, so at cluster scale the edge table
 * can be pre-partitioned (bucketed) on `src` once and every iteration reuses
 * the layout. The edge table is materialized once (localCheckpoint) and the
 * fixed-depth rounds chain lazily into a single job (see [[pageRank]]); the
 * final rank is materialized and the edge cache freed before returning, so
 * the operator strands nothing (the round-5 persist-leak lesson).
 */
object LinkRank {

  /** Integer rank units per node at iteration 0. */
  val RankUnit: Long = 1000000000000L

  /** Damping 85/100 split into exact integer terms. */
  private val Teleport: Long = RankUnit * 15 / 100

  /**
   * Fixed-iteration PageRank in exact integer arithmetic.
   *
   * `edges` is a directed (src, dst) list. Every node must appear on BOTH
   * sides (supply both directions for an undirected graph): a node with no
   * out-edges would leak its rank mass and drop out of the next level, and
   * because each round is `ed JOIN ranks ON src` + `GROUP BY dst`, a node
   * that never appears as a dst vanishes from the output after round 1 —
   * src-only nodes are silently absent, not ranked at the teleport floor.
   * Callers with genuine dangling or source-only nodes must add self-loops
   * first (or left-join the ranks back over the node set per round).
   *
   * Returns (node, rank) with rank in integer units after `iters` rounds.
   */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    // out-degree rides with each edge; materialized ONCE — every round scans
    // these cached blocks instead of re-running the dedup/union lineage
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // WIDTH PIN (the round-7 CPU-stage lesson): without the explicit
    // repartition, AQE coalesces the small-bytes join output to a handful
    // of partitions and the checkpoint materializes at that width — then
    // EVERY iteration's join runs 2-3 tasks wide on a 32-core box. An
    // explicit keyed repartition is exempt from AQE coalescing, and keying
    // on `src` is the layout each round's join wants anyway.
    val np = edges.sparkSession.sessionState.conf.numShufflePartitions
    val ed = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(np, col("src"))
      .localCheckpoint(true)
    // The rounds CHAIN LAZILY: each round's plan consumes the previous one
    // exactly once (a linear chain — the no-cross-branch-CSE hazard needs a
    // fan-out, absent here), so the whole fixed-depth iteration executes as
    // ONE job whose stages hand shuffle outputs to each other. Per-round
    // eager checkpoints would instead pay `iters` full job schedulings —
    // the same fixed overhead the star-CC loop (Dedup.scala) has to pay
    // because its loop is UNBOUNDED and convergence-checked; a shallow
    // fixed-iteration walk doesn't. (Deep loops — say iters > ~10 — should
    // checkpoint periodically to bound plan depth.)
    // materialize the (small) result, then free the edge table — returning a
    // lazy plan over persisted inputs is the round-5 leak lesson
    val out = chain(ed, iters).localCheckpoint(true)
    ed.unpersist()
    out
  }

  /** The lazy round chain over a prepared (src, dst, outdeg) edge table —
    * exposed package-wide so PlanSpec can gate the whole-iteration plan
    * (equi joins, partial aggregation, no cartesian) without the
    * materialization side effects of [[pageRank]]. */
  private[graft] def chain(ed: DataFrame, iters: Int): DataFrame = {
    var rank = ed.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(RankUnit))
    for (_ <- 1 to iters) {
      rank = ed.join(rank, ed("src") === rank("node"))
        // integral div, not floating /: exactly reproducible cross-engine
        .select(col("dst"), expr("(rank * 85) div (outdeg * 100)").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("inflow"))
        .select(col("dst").as("node"), (lit(Teleport) + col("inflow")).as("rank"))
    }
    rank
  }
}
