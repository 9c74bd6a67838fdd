package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph statistics over an edge list (beyond-reference
 * extension: cohesion analytics for the dedup cluster graphs the curation
 * pipeline produces — [[Dedup.nearDupPairs]] emits the edges, q48/q61 label
 * the components, and this operator measures how tightly each component is
 * knit).
 *
 * All outputs are exact integers (counts, basis points by integer division)
 * so results replay bit-for-bit in any engine — the no-float-accumulation
 * rule the suite applies to every cross-engine-graded number.
 */
object GraphStats {

  /** (degree, id) packed into one long: degree·2³² + id. A total order over
    * nodes that puts hubs LAST; comparisons stay single-long (codegen'd,
    * 8-byte shuffle keys). Requires id < 2³² and degree < 2³¹ — at a larger
    * id domain, widen to a struct compare. */
  private val IdSpace = 4294967296L // 2^32

  /**
   * Triangle census + local clustering coefficient via the degree-oriented
   * node-iterator (Schank & Wagner 2005; the MapReduce formulation is
   * Suri & Vassilvitskii WWW'11 "Counting Triangles and the Curse of the
   * Last Reducer"). Orient every edge from its (degree, id)-smaller
   * endpoint; wedges are the self-join of oriented edges on their apex; a
   * wedge closes into a triangle iff the oriented edge between its two
   * successors exists. Each triangle is found exactly once (from its
   * order-minimal corner), and total wedge work is O(m^{3/2}) REGARDLESS of
   * degree skew — a hub's out-degree under this orientation is bounded by
   * O(√m), so the "curse of the last reducer" (one hub generating deg²
   * wedges in one task) cannot happen. That property, not the join shape,
   * is what makes this survive a 100 TB social-scale graph; the naive
   * id-orientation dies on its first celebrity node.
   *
   * Input: undirected edges (any orientation, duplicates/self-loops
   * tolerated). Output: (node, deg, tri, coeff_bp) for nodes with deg ≥ 2,
   * where coeff_bp = 20000·tri div (deg·(deg−1)) — the local clustering
   * coefficient 2·tri/(deg·(deg−1)) in integer basis points.
   */
  def triangleCensus(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))

    val ek = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"),
        (col("du") * IdSpace + col("u")).as("ku"),
        (col("dv") * IdSpace + col("v")).as("kv"))
    // ku ≠ kv always (ids differ), so the orientation is total
    val oe = ek.select(
      when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("a"),
      when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("b"),
      greatest(col("ku"), col("kv")).as("kb"))

    // wedge (a; b1 ≺ b2) closes iff oriented edge (b1 → b2) exists
    val tri = oe.as("e1")
      .join(oe.as("e2"), col("e1.a") === col("e2.a") && col("e1.kb") < col("e2.kb"))
      .select(col("e1.a").as("t1"), col("e1.b").as("t2"), col("e2.b").as("t3"))
      .join(oe.select(col("a").as("t2"), col("b").as("t3")), Seq("t2", "t3"))

    val perNode = tri
      .select(explode(array(col("t1"), col("t2"), col("t3"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))

    deg.filter(col("deg") >= 2)
      .join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("tri"))
      .withColumn("coeff_bp", expr("(20000 * tri) DIV (deg * (deg - 1))"))
      .select("node", "deg", "tri", "coeff_bp")
  }

  /**
   * Bounded k-core peel — the graph-curation prune (spam/low-signal node
   * removal before link-based quality scoring): `rounds` iterations of
   * "drop every node with degree < k on the SURVIVING subgraph", which
   * converges to the k-core once a round removes nothing. Fixed rounds
   * keep the computation deterministic and oracle-unrollable; callers pick
   * `rounds` ≥ the observed convergence depth. Each round is one degree
   * aggregation + two semi joins, all hash-partitioned on node id — at
   * scale the cost is `rounds` × (1 agg shuffle + 2 join shuffles) over a
   * monotonically SHRINKING edge set; rounds are chained lazily so
   * Catalyst plans the whole peel as one job (the q87 PageRank shape), and
   * each level is localCheckpoint-materialized to keep the lineage flat.
   * Returns surviving (undirected-symmetric) edges.
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    (1 to rounds).foreach { _ =>
      val keep = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("node")
      e = e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint(false) // flat lineage: each level is one materialized step
    }
    e
  }
}
