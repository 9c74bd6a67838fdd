package graft

import graft.operators.GraphStats
import org.apache.spark.sql.functions._

/** Triangle-census invariants (operators/GraphStats.scala, graded as q115). */
class GraphStatsSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side brute force: per-node triangle count by edge-set lookup. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct
    val adj = e.flatMap(p => Seq(p, p.swap)).groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    val eset = e.toSet
    val nodes = adj.keys.toSeq
    val tri = nodes.map { n =>
      val nb = adj(n).toSeq.sorted
      n -> nb.combinations(2).count { case Seq(x, y) => eset.contains((math.min(x, y), math.max(x, y))) }
        .toLong
    }.toMap
    nodes.filter(n => adj(n).size >= 2)
      .map(n => n -> (adj(n).size.toLong, tri(n))).toMap
  }

  private def censusMap(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    GraphStats.triangleCensus(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("triangleCensus matches driver-side brute force on random graphs") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = censusMap(edges)
      val want = bruteTriangles(edges)
      assert(got.keySet == want.keySet, s"seed $seed: node sets differ")
      want.foreach { case (node, (deg, tri)) =>
        val (gDeg, gTri, gCoeff) = got(node)
        assert(gDeg == deg, s"seed $seed node $node deg")
        assert(gTri == tri, s"seed $seed node $node tri")
        assert(gCoeff == (20000L * tri) / (deg * (deg - 1)), s"seed $seed node $node coeff")
      }
    }
  }

  test("triangleCensus on K5: every node has 6 triangles and coefficient 1.0") {
    val edges = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val got = censusMap(edges)
    assert(got.size == 5)
    got.values.foreach { case (deg, tri, coeff) =>
      assert(deg == 4 && tri == 6 && coeff == 10000)
    }
  }

  test("triangleCensus on a star graph: hub has max degree, zero triangles") {
    val edges = (1L to 20L).map(i => (0L, i))
    val got = censusMap(edges)
    // leaves have deg 1 → excluded; only the hub qualifies, with no triangles
    assert(got.keySet == Set(0L))
    assert(got(0L) == ((20L, 0L, 0L)))
  }

  test("triangleCensus tolerates duplicate edges, self-loops, and reversed orientation") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val noisy = clean ++ clean.map(_.swap) ++ Seq((2L, 2L), (1L, 2L), (4L, 3L))
    assert(censusMap(noisy) == censusMap(clean))
  }
}
