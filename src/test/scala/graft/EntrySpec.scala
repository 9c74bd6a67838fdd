package graft

/** Flagship end-to-end smoke (t1 contract: rows > 0 on sf0.001). */
class EntrySpec extends SparkSpec {

  test("entry returns ranked hydrated search hits") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.length <= 4) // k=4, reference config.yml:83
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse), "ordered by score desc")
  }

  test("every declared query returns a readable non-degenerate plan") {
    // cheap structural smoke on sf0.001 — full value check is the duckdb gate
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
    }
  }

  test("oracle SQL exists for every query except declared rows-only ops") {
    // q24 is the ONLY remaining rows-only query, and it is genuinely
    // non-replayable: its pruning depends on IVF centroids trained on a
    // driver-side sample whose composition tracks Spark's partition order,
    // so no portable SQL can reproduce the cell assignment. The other two
    // former members left the list in round 5: q55's LSH hyperplanes are
    // data-independent constants (banding-replay oracle,
    // VectorQueries.lshOracleSql); q44's DSv2 generator is a pure function
    // of (seed, doc_id) (recursive-CTE hash-chain replay,
    // SourceQueries.dsv2CorpusSql).
    val rowsOnly = Set("q24_ann_ivf_probe")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
