package graft

import org.apache.spark.sql.functions._

/** DataSource V2 synthetic corpus: deterministic, partition-parallel,
  * column-pruned generation at arbitrary scale. */
class CorpusSourceSpec extends SparkSpec {

  private def corpus(rows: Long, parts: Int = 8) =
    spark.read.format("graft-corpus")
      .option("rows", rows).option("partitions", parts).load()

  test("row count, id range, and determinism across reads") {
    val df = corpus(1000)
    assert(df.count() == 1000)
    assert(df.agg(min("doc_id"), max("doc_id")).head() ==
      org.apache.spark.sql.Row(0L, 999L))
    val a = df.filter(col("doc_id") < 10).orderBy("doc_id").collect()
    val b = corpus(1000, parts = 3).filter(col("doc_id") < 10).orderBy("doc_id").collect()
    assert(a.sameElements(b)) // content independent of partitioning
  }

  test("schema matches the reference document abstraction; index is sha256(source/id)") {
    val row = corpus(100).filter(col("doc_id") === 7)
      .select("source", "index", "text", "n_chars").head()
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"${row.getString(0)}/7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(1) == expected)
    assert(row.getLong(3) == row.getString(2).length)
  }

  test("column pruning reaches the DSv2 scan") {
    val df = corpus(100).select("doc_id", "source")
    val scan = df.queryExecution.executedPlan.toString
    assert(!scan.contains("text#") || !scan.contains("ReadSchema: struct<doc_id:bigint,source:string,index"),
      scan.take(1000))
    assert(df.distinct().count() == 100)
  }

  test("a query plan composes: dedup-ingest from the synthetic source") {
    val incoming = corpus(500)
    val existing = corpus(300)
    val fresh = graft.operators.Ingest.newRows(incoming, existing, "index")
    assert(fresh.count() == 200)
  }

  test("COUNT/MIN/MAX push into the scan as metadata; other aggs fall back") {
    import org.apache.spark.sql.functions._
    import graft.sources.SyntheticCorpusSource
    val before = SyntheticCorpusSource.aggPushes.get()
    val big = spark.read.format("graft-corpus")
      .option("rows", "3000000").option("partitions", "8").load()
    val r = big.agg(count(lit(1)).as("n"), min("doc_id").as("lo"),
      max("doc_id").as("hi")).head()
    assert(r.getLong(0) == 3000000L && r.getLong(1) == 0L && r.getLong(2) == 2999999L)
    assert(SyntheticCorpusSource.aggPushes.get() > before,
      "the metadata-answerable aggregate did not push into the scan")
    // a non-answerable aggregate must FALL BACK to the row scan, not lie
    val pushesAfter = SyntheticCorpusSource.aggPushes.get()
    val s2 = corpus(1000).agg(sum("n_chars")).head().getLong(0)
    assert(s2 > 0)
    assert(SyntheticCorpusSource.aggPushes.get() == pushesAfter)
    // grouped aggregates fall back too (correct per-source counts)
    val grouped = corpus(1000).groupBy("source").count()
    assert(grouped.agg(sum("count")).head().getLong(0) == 1000L)
    assert(SyntheticCorpusSource.aggPushes.get() == pushesAfter)
  }
}
