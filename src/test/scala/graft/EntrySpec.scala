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

  test("every declared query has an oracle — the rows-only allowlist is EMPTY") {
    // History of the list (kept so it never silently regrows): q20 left in
    // round 5 (portable per-bit-majority SQL); q44 left in round 5
    // (recursive-CTE hash-chain replay of the pure (seed, doc_id)
    // generator); q55 left in round 5 (data-independent hyperplanes as SQL
    // literals, banding replayed); q24 left last — its pruning originally
    // depended on KMeans centroids trained on a driver-side sample, which
    // no portable SQL could reproduce. Round 5 moved q24 to a SEEDED
    // data-independent quantizer (VectorSearch.buildIvfSeeded) so the whole
    // pruned probe replays in DuckDB (VectorQueries.ivfProbeOracleSql);
    // the learned-KMeans path stays graded by q23's exact-parity oracle.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
