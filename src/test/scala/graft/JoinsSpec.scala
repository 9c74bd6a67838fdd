package graft

import graft.operators.{InvertedIndex, Joins, VectorSearch}
import org.apache.spark.sql.functions._

/** Property tests for the reconciliation / index / PQ operators added in the
  * q93–q99 wave — invariants the DuckDB oracles can't state directly. */
class JoinsSpec extends SparkSpec {

  import spark.implicits._

  test("tableDiff of a table against itself is empty") {
    val t = spark.range(500).select(col("id"), (col("id") * 3).as("v"))
    assert(Joins.tableDiff(t, t, "id", Seq("v")).isEmpty)
  }

  test("tableDiff reports exactly the planted drift on a random table") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map(i => (i, rnd.nextInt(1000)))
    val base = rows.toDF("id", "v")
    // drift: delete ids %11, edit %13 (not deleted), insert shifted %17
    val replica = rows.filterNot(_._1 % 11 == 0)
      .map { case (i, v) => (i, if (i % 13 == 0) v + 1 else v) }
      .++(rows.filter(_._1 % 17 == 0).map { case (i, v) => (i + 100000L, v) })
      .toDF("id", "v")
    val got = Joins.tableDiff(base, replica, "id", Seq("v"))
      .as[(Long, String)].collect().toSet
    val want =
      (0L until 400L).filter(_ % 11 == 0).map(i => (i, "missing_right")) ++
      (0L until 400L).filter(i => i % 11 != 0 && i % 13 == 0).map(i => (i, "mismatch")) ++
      (0L until 400L).filter(_ % 17 == 0).map(i => (i + 100000L, "missing_left"))
    assert(got == want.toSet)
  }

  test("applying the diff's drift report reconciles a replica (round trip)") {
    val base = spark.range(300).select(col("id"), (col("id") % 7).as("v"))
    val replica = spark.range(300).filter(col("id") % 5 =!= 0)
      .select(col("id"), (col("id") % 7 + when(col("id") % 9 === 0, 1).otherwise(0)).as("v"))
    val diff = Joins.tableDiff(base, replica, "id", Seq("v"))
    // repair: drop reported mismatch/extra keys from the replica, then copy
    // the base rows for every missing/mismatched key
    val badKeys = diff.select(col("id"))
    val repaired = replica.join(badKeys, Seq("id"), "left_anti")
      .unionByName(base.join(badKeys, Seq("id"), "left_semi"))
    assert(Joins.tableDiff(base, repaired, "id", Seq("v")).isEmpty)
  }

  test("inverted-index conjunctive query equals a brute-force all-terms scan") {
    val docs = t(sf, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_invidx_spec_").toString
    InvertedIndex.build(docs, "doc_id", "text", path)
    val terms = Seq("merge", "filter")
    val viaIndex = InvertedIndex.queryAll(spark, path, "doc_id", terms)
      .as[Long].collect().toSet
    val brute = docs.filter(terms.map(tm =>
        array_contains(split(trim(col("text")), "\\s+"), tm)).reduce(_ && _))
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == brute && viaIndex.nonEmpty)
  }

  test("bucketOfTerm matches the bucket column the index was built with") {
    val toks = Seq("spark", "window", "stream", "merge", "a", "zzz")
    val fromCol = toks.toDF("tok")
      .select(col("tok"), InvertedIndex.bucket(col("tok")).as("tb"))
      .as[(String, Long)].collect().toMap
    toks.foreach(tk => assert(InvertedIndex.bucketOfTerm(tk) == fromCol(tk), tk))
  }

  test("PQ top-k: ranks are contiguous, distances non-decreasing, k per query") {
    val corpus = t(sf, "embeddings")
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val res = VectorSearch.topKPqSeeded(corpus, queries, k = 5, dim = 64)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1)
    assert(res.keySet == Set(0L, 1L, 2L))
    res.values.foreach { hits =>
      val sorted = hits.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to hits.length))
      assert(hits.length == 5)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
      assert(sorted.forall(_._3 >= 0.0))
    }
  }

  test("bloomPrefilteredJoin: result identical to the plain join, big side pruned") {
    val big = t(sf, "lineitem")
    val small = t(sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderdate") < "1996-01-01")
      .select(col("o_orderkey"))
    val bloomed = Joins.bloomPrefilteredJoin(big, "l_orderkey", small, "o_orderkey", 10000L)
    val plain = big.join(small, col("l_orderkey") === col("o_orderkey"))
    // no false negatives: the bloom path keeps every true match
    assert(bloomed.count() == plain.count())
    assert(bloomed.agg(sum("l_orderkey")).head.getLong(0)
      == plain.agg(sum("l_orderkey")).head.getLong(0))
    // and it really prunes: the prefiltered scan passes far fewer rows than
    // the fact table holds (selectivity ~3% + fpp)
    val bf = small.stat.bloomFilter("o_orderkey", 10000L, 0.01)
    val mc = udf((k: Long) => bf.mightContainLong(k))
    val passed = big.filter(mc(col("l_orderkey").cast("long"))).count()
    assert(passed < big.count() / 5, s"bloom passed $passed of ${big.count()} rows")
  }

  test("bloomPrefilteredJoin: string keys probe with the string overload (no lost matches)") {
    // stat.bloomFilter inserts strings as UTF-8 bytes — a long-cast probe
    // of a string-keyed filter never matches; the typed dispatch must keep
    // the result identical to the plain join for string keys too.
    val big = t(sf, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val small = t(sf, "customer")
      .filter(col("c_custkey") % 100 === 0)
      .select(col("c_mktsegment").as("seg")).distinct()
    val bloomed = Joins.bloomPrefilteredJoin(big, "c_mktsegment", small, "seg", 100L)
    val plain = big.join(small, col("c_mktsegment") === col("seg"))
    assert(bloomed.count() == plain.count())
    assert(bloomed.count() > 0)
  }

  test("bloomPrefilteredJoin: refuses mixed key type classes (filter hashing would never match probe)") {
    val big = t(sf, "lineitem").select(col("l_orderkey"))
    val small = t(sf, "orders").select(col("o_orderkey").cast("string").as("ok")).limit(100)
    intercept[IllegalArgumentException] {
      Joins.bloomPrefilteredJoin(big, "l_orderkey", small, "ok", 100L)
    }
  }

  test("bloomPrefilteredJoin: refuses key types stat.bloomFilter can't probe consistently") {
    val big = t(sf, "orders").select(col("o_orderkey"), col("o_orderdate"))
    val small = t(sf, "orders").select(col("o_orderdate").as("d")).limit(5)
    intercept[IllegalArgumentException] {
      Joins.bloomPrefilteredJoin(big, "o_orderdate", small, "d", 10L)
    }
  }

  private def t(dir: String, name: String) =
    graft.queries.QHelpers.t(spark, dir, name)
}
