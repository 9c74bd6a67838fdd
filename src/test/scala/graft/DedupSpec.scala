package graft

import graft.operators.{Dedup, Ingest, TransientFetchError}
import org.apache.spark.sql.functions._

/** Executor-shared attempt counter for the fetchCatalog spec (local mode:
  * one JVM, so a static map observes every partition's calls). */
object FetchCounters {
  val attempts = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
}

/** Dedup-suite invariants (SURVEY §5.3: dedup idempotence is the I2 contract). */
class DedupSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exactGroups finds planted exact duplicates") {
    val corpus = docs.select("doc_id", "text").unionAll(
      docs.limit(10).select((col("doc_id") + 5000).as("doc_id"), col("text")))
    val dups = Dedup.exactGroups(corpus, "text", "doc_id").filter(col("n_dups") > 1)
    assert(dups.count() == 10)
    assert(dups.agg(max("n_dups")).collect().head.getLong(0) == 2)
  }

  test("dropExactDups is idempotent and keeps min id") {
    val corpus = docs.select("doc_id", "text").unionAll(
      docs.limit(5).select((col("doc_id") + 5000).as("doc_id"), col("text")))
    val once = Dedup.dropExactDups(corpus, "text", "doc_id")
    val twice = Dedup.dropExactDups(once, "text", "doc_id")
    assert(once.count() == docs.count())
    assert(once.count() == twice.count())
    assert(once.filter(col("doc_id") >= 5000).count() == 0)
  }

  test("anti-join ingest is idempotent (I2 contract)") {
    val existing = docs.filter(col("doc_id") < 100)
    val incoming = docs
    val fresh = Ingest.newRows(incoming, existing, "doc_id")
    assert(fresh.count() == docs.count() - 100)
    // re-ingesting everything against the full store inserts nothing
    assert(Ingest.newRows(incoming, incoming, "doc_id").count() == 0)
  }

  test("minhash LSH surfaces planted near-duplicates with high jaccard") {
    val near = docs.limit(8).select((col("doc_id") + 5000).as("doc_id"),
      col("text").substr(lit(1), greatest(length(col("text")) - 20, lit(1))).as("text"))
    val corpus = docs.select("doc_id", "text").unionAll(near)
    val pairs = Dedup.nearDupPairs(corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5).collect()
    // every planted pair that survives banding must link id and id+5000
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 5000)
    assert(planted.length >= 4, s"found ${planted.length} planted pairs")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("incrementalNearDupPairs equals the full pipeline filtered to batch-touching pairs") {
    // the incremental-dedup contract on data the q105 oracle never sees:
    // random store/batch splits with planted cross- and intra-batch dups
    (1 to 3).foreach { seed =>
      val store = docs.filter(col("doc_id") % 3 === seed % 3).select(col("doc_id").as("id"), col("text"))
      val batch = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 30000).as("id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 25, lit(1))).as("text"))
      val inc = Dedup.incrementalNearDupPairs(store, batch, "text", "id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = Dedup.nearDupPairs(store.unionByName(batch), "text", "id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a >= 30000 || b >= 30000 }.toSet
      assert(inc == full, s"seed=$seed: inc=${inc.size} full=${full.size}")
      assert(inc.nonEmpty, s"seed=$seed surfaced no planted cross pairs")

      // the precomputed-signature-index spelling (the per-batch O(|batch|)
      // production shape) must equal the self-contained one exactly
      val idx = Dedup.buildSigIndex(store, "text", "id",
        shingleSize = 3, numHashes = 16, bands = 4)
      val viaIdx = Dedup.incrementalNearDupPairsIndexed(idx, batch, "text", threshold = 0.3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaIdx == inc, s"seed=$seed: indexed=${viaIdx.size} inc=${inc.size}")
    }
  }

  test("nearDupPairs/embedNearDupPairs release their cached index tables (no storage leak)") {
    // one stranded cached table per call is an unbounded leak in a
    // long-lived service, and enough suite-wide memory pressure to make the
    // bench cost 4-5× the isolated cost (round-4 verdict). Only the
    // materialized (small) result may remain in storage.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.nearDupPairs(docs.select("doc_id", "text"), "text", "doc_id").count()
    val afterText = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterText.size <= 1, s"nearDupPairs stranded ${afterText.size} cached tables")

    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    Dedup.embedNearDupPairs(vecs, "vec_id", "embedding", dim = 64).count()
    val afterVec = spark.sparkContext.getPersistentRDDs.keySet -- before -- afterText
    assert(afterVec.size <= 1, s"embedNearDupPairs stranded ${afterVec.size} cached tables")
  }

  test("setSimJoin is EXACT-recall: equals brute-force all-pairs shingle Jaccard") {
    // the PPJoin contract: the prefix filter may only prune pairs that
    // CANNOT reach the threshold — output must equal the unfiltered
    // inverted-index join on every corpus
    (1 to 3).foreach { seed =>
      val near = docs.filter(col("doc_id") % 7 === seed)
        .select((col("doc_id") + 5000).as("doc_id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 15 * seed, lit(1))).as("text"))
      val corpus = docs.select("doc_id", "text").unionAll(near)
      val got = Dedup.setSimJoin(corpus, "text", "doc_id", tNum = 1, tDen = 2)
        .select("id_a", "id_b", "inter").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // brute force: every pair with a nonzero shingle intersection, verified
      val sh = Dedup.shingleTable(corpus, "text", "doc_id", 3)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val want = sh.select(col("doc_id").as("id_a"), col("shingle"))
        .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .filter(col("inter") * 2 >= (col("sz_a") + col("sz_b") - col("inter")) * 1)
        .select("id_a", "id_b", "inter").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(want.nonEmpty, s"seed $seed plants no pairs — test is vacuous")
      assert(got == want, s"seed $seed: setSimJoin missed ${(want -- got).size} / " +
        s"invented ${(got -- want).size} pairs")
    }
  }

  test("setSimJoin releases its cached shingle table (no storage leak)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.setSimJoin(docs.select("doc_id", "text"), "text", "doc_id", 1, 2).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.size <= 1, s"setSimJoin stranded ${after.size} cached tables")
  }

  test("simhash: identical docs share a signature; hamming to self is 0") {
    val corpus = docs.limit(20).select("doc_id", "text").unionAll(
      docs.limit(20).select((col("doc_id") + 5000).as("doc_id"), col("text")))
    val sig = Dedup.simhash(corpus, "text", "doc_id")
    val joined = sig.as("a").join(sig.as("b"),
        col("a.doc_id") + 5000 === col("b.doc_id"))
      .select(Dedup.hamming(col("a.simhash"), col("b.simhash")).as("d"))
      .collect()
    assert(joined.length == 20)
    assert(joined.forall(_.getInt(0) == 0))
  }

  test("connectedComponents merges chains and keeps min-id labels") {
    val s = spark
    import s.implicits._
    // two components: {1,2,3,4} (chain), {10,11} — plus 20 isolated via self-edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L))
      .toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L && cc(4L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L)
  }

  test("connectedComponents converges on chains longer than any fixed iteration count") {
    val s = spark
    import s.implicits._
    // a single 13-node path 0-1-2-...-12: diameter 12 — a fixed iters=3
    // would leave it split into several labels; convergence must not
    val edges = (0L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 13)
    assert(cc.values.forall(_ == 0L), s"split clusters: $cc")
  }

  test("connectedComponents is idempotent: labels as edges reproduce themselves") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("src", "dst")
    val cc1 = Dedup.connectedComponents(edges, "src", "dst")
    // feed (node -> label) back in as edges: components must not change
    val cc2 = Dedup.connectedComponents(cc1, "node", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m1 = cc1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc2 == m1)
  }

  test("identical documents produce identical minhash signatures") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
      .select(col("doc_id"), col("text"))
    val twice = docs.unionAll(docs.select((col("doc_id") + 1000).as("doc_id"), col("text")))
    val sh = Dedup.shingleTable(twice, "text", "doc_id", 3)
    val sig = Dedup.minhashWide(sh, "doc_id", 16).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toVector).toMap
    sig.keys.filter(_ < 1000).foreach { id =>
      if (sig.contains(id + 1000)) assert(sig(id) == sig(id + 1000))
    }
  }

  test("connectedComponentsStar matches label propagation on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // 30 random graphs: n nodes, ~n edges drawn uniformly — mixes chains,
    // cycles, stars, isolates (self-edges)
    (1 to 30).foreach { trial =>
      val n = 2 + rnd.nextInt(20)
      val edges = Seq.fill(1 + rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toDF("src", "dst")
      def partition(df: org.apache.spark.sql.DataFrame): Set[Set[Long]] =
        df.collect().map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      val lp = partition(Dedup.connectedComponents(edges, "src", "dst"))
      val star = partition(Dedup.connectedComponentsStar(edges, "src", "dst"))
      assert(star == lp, s"trial $trial (n=$n) star=$star lp=$lp")
    }
  }

  test("connectedComponentsStar labels a long chain in O(log n) rounds") {
    val s = spark
    import s.implicits._
    val edges = (0L until 32L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponentsStar(edges, "src", "dst", maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 33)
    assert(cc.values.forall(_ == 0L), s"split: $cc")
  }

  test("fuzzy-match blocking is content-bounded, not per-source all-pairs") {
    val d = docs
    val n = d.count()
    val candidates = graft.queries.TextQueries.fuzzyCandidates(d).count()
    // per-source all-pairs would admit ~n²/(2·|sources|) candidate pairs;
    // the content-derived 8-char block key must stay well under 1% of that
    val sources = d.select("source").distinct().count()
    val allPairs = n * n / (2 * math.max(sources, 1))
    assert(candidates < allPairs / 100,
      s"blocking degenerated: $candidates candidates vs all-pairs $allPairs")
    // and the blocked result equals brute force restricted to the block key
    val res = graft.queries.TextQueries.fuzzyMatchBlocked(d).count()
    assert(res <= candidates)
  }

  test("fetchCatalog: per-partition client, transient retry, permanent error propagates (S4/I4/I5)") {
    val s = spark
    import s.implicits._
    FetchCounters.attempts.clear()
    val ids = (0L until 100L).toDF("id").repartition(4)
    val client = (pid: Int) => (id: Long) => {
      val n: Int = FetchCounters.attempts.merge(id, 1, (a, b) => a + b)
      if (id % 5 == 0 && n == 1) throw new TransientFetchError(s"flaky $id")
      s"payload-$id"
    }
    val out = Ingest.fetchCatalog(ids, "id", client).collect()
    assert(out.length == 100)
    assert(out.forall(r => r.getString(1) == s"payload-${r.getLong(0)}"))
    // every flaky id was retried exactly once; the rest called once
    assert((0L until 100L).forall { id =>
      FetchCounters.attempts.get(id) == (if (id % 5 == 0) 2 else 1)
    })
    // a permanent (non-transient) error must NOT be retried away
    val bad = (_: Int) => (_: Long) => throw new RuntimeException("permanent")
    intercept[org.apache.spark.SparkException] {
      Ingest.fetchCatalog(ids, "id", bad).collect()
    }
  }

  test("ingest insert-count via Observation - metrics without a second action (A5)") {
    val obs = org.apache.spark.sql.Observation("ingest")
    val docsAll = docs
    val fresh = Ingest.newRows(docsAll, docsAll.filter(col("doc_id") < 100), "doc_id")
      .observe(obs, count(lit(1)).as("n_inserted"))
    fresh.write.format("noop").mode("overwrite").save()
    assert(obs.get("n_inserted") == docsAll.count() - 100)
  }

  test("snmCandidates: exploded equi-join pairing equals the window-band definition") {
    val corpus = docs.select(col("doc_id").as("id"),
        substring(col("text"), 1, 8).as("blk"), length(col("text")).as("len"))
    val got = Dedup.snmCandidates(corpus, "blk", Seq("len"), "id", 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference spelling: rank in block, all pairs, band filter after
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("len"), col("id"))
    val ranked = corpus.withColumn("rnk", row_number().over(w).cast("long"))
    val want = ranked.select(col("blk"), col("rnk").as("ra"), col("id").as("ia"))
      .join(ranked.select(col("blk"), col("rnk").as("rb"), col("id").as("ib")), "blk")
      .filter(col("rb") > col("ra") && col("rb") <= col("ra") + 3)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("snmGlobalPairs property: equals brute force on random sizes/keys/windows/layouts") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      n <- Gen.choose(0, 60)
      keyMod <- Gen.choose(1, 20) // collision-heavy keys stress the tie-break
      w <- Gen.choose(1, 8)
      np <- Gen.choose(1, 40) // layouts from 1 partition to far-more-than-rows
      salt <- Gen.choose(0, 1000)
    } yield (n, keyMod, w, np, salt)
    val prop = Prop.forAll(gen) { case (n, keyMod, w, np, salt) =>
      val data = (0 until n).map(i => (i.toLong, ((i * 31 + salt) % keyMod).toLong))
        .toDF("id", "key")
      val got = Dedup.snmGlobalPairs(data, Seq("key"), "id", w, np)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val order = (0 until n).map(i => (((i * 31 + salt) % keyMod).toLong, i.toLong))
        .sorted.map(_._2)
      val want = (for {
        i <- order.indices
        j <- (i + 1) to math.min(i + w, order.length - 1)
      } yield (order(i), order(j))).toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("snmGlobalPairs: window crosses partition boundaries exactly (incl. tiny partitions)") {
    import spark.implicits._
    // adversarial layout: more partitions than fit comfortably — range
    // partitions shorter than the window, so every boundary discipline
    // (fringe pull across MULTIPLE successors, empty ranges) is exercised
    val n = 97
    val data = (0 until n).map(i => (i.toLong, (i * 37 % n).toLong)).toDF("id", "key")
    for (w <- Seq(1, 3, 7); np <- Seq(2, 16, 64)) {
      val got = Dedup.snmGlobalPairs(data, Seq("key"), "id", w, np)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: global order by (key, id), all pairs within w positions
      val order = data.orderBy(col("key"), col("id")).select("id")
        .collect().map(_.getLong(0))
      val want = (for {
        i <- order.indices
        j <- (i + 1) to math.min(i + w, order.length - 1)
      } yield (order(i), order(j))).toSet
      assert(got == want, s"w=$w np=$np: got ${got.size} want ${want.size}")
    }
  }
}
