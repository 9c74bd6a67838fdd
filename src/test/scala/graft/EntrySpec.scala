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
    // q24 is genuinely approximate relative to anything DuckDB can replay:
    // its pruning depends on IVF centroids trained on a driver-side sample
    // whose composition tracks Spark's partition order, so no portable SQL
    // can reproduce the cell assignment. q44 reads the DSv2 generator (no
    // parquet table for DuckDB to see). q55's LSH is approximate vs brute
    // force but DETERMINISTIC vs its own definition — its hyperplanes are
    // data-independent constants, so it now carries a full banding-replay
    // oracle (VectorQueries.lshOracleSql) and left this list in round 5.
    val rowsOnly = Set("q24_ann_ivf_probe", "q44_dsv2_corpus")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
