package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication suite for large text corpora (BASELINE.json LLM-pipeline
 * mandate; generalizes the reference's identity dedup at
 * `src/coldata/crawler/crawler.py:39-50` from exact-URL to content-level).
 *
 * All stages are set-oriented (explode → shuffle-on-key → group) — the
 * shape that scales: no pairwise O(n²) work ever happens outside an LSH /
 * blocking bucket.
 */
object Dedup {

  // ---------------------------------------------- storage-lifecycle plumbing
  /**
   * Eagerly materialize `df` via localCheckpoint and return it with the
   * storage-RDD ids the checkpoint registered. Checkpointed data has no
   * lineage to recompute, so a level may be freed ONLY once nothing that
   * still runs references it — the iterative operators below free each level
   * as soon as the next one is materialized, keeping storage O(1 level)
   * instead of O(rounds). (At production scale swap in a reliable checkpoint
   * dir for executor-loss tolerance — same lifecycle, durable blocks.)
   */
  private def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(true)
    (out, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  /** Drop the storage blocks behind previously [[checkpointTracked]] ids. */
  private def freeIds(spark: SparkSession, ids: Set[Int]): Unit =
    ids.foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

  /** Order-independent content checksum of a row set: sum of per-row
    * xxhash64 in decimal (exact — never overflows under ANSI arithmetic). */
  private def chkCol(cols: Seq[String]): Column =
    sum(xxhash64(cols.map(col): _*).cast(DecimalType(38, 0)))

  /**
   * (row count, content checksum) of a just-checkpointed level. Reads the
   * Observation piggybacked on the checkpoint's materialization action —
   * ZERO extra jobs per round — and falls back to one cheap aggregation
   * over the already-materialized blocks if the metrics don't surface
   * (observation delivery is async; bounded wait, never a hang).
   */
  private def levelStats(obs: Observation, df: DataFrame, cols: Seq[String]): (Long, BigDecimal) = {
    def parse(r: org.apache.spark.sql.Row): (Long, BigDecimal) = (
      r.getAs[Long]("n"),
      Option(r.getAs[java.math.BigDecimal]("chk")).map(BigDecimal(_)).getOrElse(BigDecimal(0)))
    try parse(scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration(5, java.util.concurrent.TimeUnit.SECONDS)))
    catch {
      case _: java.util.concurrent.TimeoutException =>
        val r = df.agg(count(lit(1)).as("n"), chkCol(cols).as("chk")).head()
        (r.getLong(0), Option(r.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0)))
    }
  }

  /** `.observe` aggregates matching [[levelStats]]. */
  /** Materialization width for an iterative level of `rows` rows: ~50k
    * rows per task, clamped to [1, shuffle partitions]. Small levels (the
    * tail of every convergence loop) would otherwise checkpoint at full
    * width — on a 32-core box that is 32 near-empty task dispatches per
    * level per frame, which in a 6-8 level loop is most of the loop's
    * wall time. At corpus scale `rows` is large and the width stays at
    * the configured maximum, so nothing narrows on a cluster. */
  private def levelWidth(spark: SparkSession, rows: Long): Int = {
    val np = spark.sessionState.conf.numShufflePartitions
    math.max(1, math.min(np, ((rows + 49999L) / 50000L).toInt))
  }

  private def levelObs(obs: Observation, df: DataFrame, cols: Seq[String]): DataFrame =
    df.observe(obs, count(lit(1)).as("n"), chkCol(cols).as("chk"))

  /** Exact content dedup: groups rows by sha256 of a column, keeps the
    * smallest id as canonical (SURVEY §2.5 A4 at content level). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** First-writer-wins exact dedup (keeps row with min id per content hash). */
  def dropExactDups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Portable seeded shingle hash: first 15 hex chars of sha256("seed:shingle")
    * as a positive long — reproducible in any engine with sha256. */
  def seededHash(shingle: Column, seed: Column): Column =
    conv(substring(sha2(concat_ws(":", seed, shingle), 256), 1, 15), 16, 10).cast(LongType)

  private val MhP = 1000000007L

  /** Base content hash for the minhash family: one sha256 per shingle
    * (first 15 hex chars → long, mod p). */
  def baseHash(shingle: Column): Column =
    conv(substring(sha2(shingle, 256), 1, 15), 16, 10).cast(LongType) % MhP

  /** Universal-hash family over the base hash: h_s(x) = (a_s·x + b_s) mod p
    * with a_s, b_s < 2^31 derived from the seed — one sha256 per shingle
    * total instead of one per (shingle, seed), 16× less hashing at equal
    * minhash quality. a·x < 2^31·2^30 < 2^62 so the arithmetic is exact in
    * any 64-bit engine (portable to the DuckDB oracle). */
  def familyHash(base: Column, seed: Column): Column = {
    val a = (seed * 1103515245L + 12345L) % MhP + 1L
    val b = (seed * 69069L + 1L) % MhP
    (a * base + b) % MhP
  }

  /**
   * Distinct word n-gram shingles per doc as 60-bit content hashes:
   * (id, shingle: long). Hashing inside the tokenizer UDF (sha256 prefix,
   * the exact value DuckDB's `sha256(shingle)` yields) means the
   * distinct/join/aggregate pipeline shuffles 8-byte longs instead of
   * ~30-byte strings, and no separate hash pass runs later. 60 bits keeps
   * Jaccard intersection counts collision-free at corpus scale
   * (birthday bound ≈ n²/2⁶¹).
   */
  def shingleTable(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    // SHA-256 shingling is compute-per-row: a narrow input (a one-file
    // snapshot scans as 1 partition) would serialize the digests onto one
    // core. Explicit width only when the input is narrower than the
    // session's shuffle width — a corpus at scale already has partitions.
    val np = df.sparkSession.sessionState.conf.numShufflePartitions
    val src = if (df.rdd.getNumPartitions < np) df.repartition(np) else df
    // per-doc SET semantics live INSIDE the shingling map (the id is in
    // every key, so a global distinct() was only ever per-doc dedup — paid
    // as a full (id, shingle) shuffle). Beyond the saved shuffle, skipping
    // it preserves DOC-LOCALITY into minhashWide's groupBy: with each
    // doc's shingles contiguous in its source partition, the map-side
    // partial aggregation collapses to ~one wide row per doc. The
    // distinct()'s scatter defeated that combine progressively with scale
    // — the 1000x rung measured the build's shuffle decades at 9.7x, 18x,
    // 37x per 10x of corpus (wide partial rows ∝ partitions × docs), the
    // superlinear term this spelling removes.
    src.select(col(idCol), explode(shingleSetCol(col(textCol), n)).as("shingle"))
  }

  /** Per-doc hashed word n-gram shingles with SET semantics baked in:
    * distinct, ascending-sorted hashes (sha256-derived 64-bit per shingle)
    * — the dedup and the order are per-row facts, so computing them inside
    * the shingling map is free while the explode-then-distinct spelling
    * pays a full shuffle for the same set. Served by the codegen'd
    * [[graft.functions.HashedShingleSet]] expression (no boxed-long output
    * conversion, per-thread digest reuse). */
  private def shingleSetCol(text: Column, n: Int): Column = {
    graft.functions.VectorFns.register(
      org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function("shingle_set", text, lit(n))
  }

  private val shingleWs = java.util.regex.Pattern.compile("\\s+")
  private val shingleSha = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** [[graft.functions.HashedShingleSet]]'s runtime kernel: UTF8String in,
    * primitive sorted-distinct long[] out. Bit-identical to the old UDF
    * (same tokenization, same `tok0 tok1 …` digest bytes, same >>> 4). */
  def shingleSetKernel(s: org.apache.spark.unsafe.types.UTF8String,
                       n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    if (s == null) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val toks = shingleWs.split(s.toString.trim).filter(_.nonEmpty)
    if (toks.length < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = shingleSha.get()
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      var k = 0
      while (k < n) {
        if (k > 0) md.update(' '.toByte)
        md.update(toks(i + k).getBytes("UTF-8"))
        k += 1
      }
      out(i) = java.nio.ByteBuffer.wrap(md.digest(), 0, 8).getLong >>> 4
      i += 1
    }
    // sorted distinct on primitives (the old `.distinct.sorted` boxed)
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  /** Exact |A ∩ B| of two ASCENDING-sorted distinct long arrays by merge
    * scan — linear, unboxed, allocation-free
    * ([[graft.functions.SortedIntersectCount]]'s kernel). */
  def sortedIntersectKernel(a: org.apache.spark.sql.catalyst.util.ArrayData,
                            b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val la = a.numElements(); val lb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  private def sortedIntersectCol(a: Column, b: Column): Column = {
    graft.functions.VectorFns.register(
      org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function("sorted_intersect", a, b)
  }

  /** [[familyHash]] with a plan-time seed (a, b folded to literals). */
  def familyHashAt(base: Column, seed: Int): Column = {
    val a = (seed * 1103515245L + 12345L) % MhP + 1L
    val b = (seed * 69069L + 1L) % MhP
    (lit(a) * base + lit(b)) % MhP
  }

  /**
   * MinHash signature in WIDE form: one row per doc with columns mh0..mh{n-1},
   * minhash_s(doc) = min over shingles of h_s(shingle). All `numHashes`
   * minima come out of ONE groupBy pass with map-side partial aggregation —
   * no seed explode, so the shuffle carries one row per (partition, doc)
   * instead of numHashes rows per shingle (16× less at numHashes=16).
   * The shingle-set size `sz` (|A| for the Jaccard denominator) rides along
   * as a LAST column out of the same pass — the verify stage needs it, and
   * computing it here saves a whole extra aggregation branch over the
   * shingle table.
   */
  def minhashWide(shingles: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    // shingle is already the 60-bit content hash (shingleTable); reduce mod p
    val withH0 = shingles.withColumn("h0", col("shingle") % MhP)
    val aggs = (0 until numHashes).map(sd => min(familyHashAt(col("h0"), sd)).as(s"mh$sd")) :+
      count(lit(1)).as("sz")
    withH0.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * LSH banding over the wide signature: band b's bucket key is an xxhash64
   * fingerprint of its minhashes in seed order — computed row-at-a-time from
   * the wide columns (no collect_list aggregation), then unpivoted to
   * (id, band, band_sig). Docs sharing any bucket become candidate pairs;
   * the self-join happens only inside buckets.
   *
   * The fingerprint function does not need to match the oracle's (sha256):
   * band-sig equality is equality of the underlying minhash TUPLE in either
   * engine (collisions are ~n²/2⁶⁴ — negligible), and an 8-byte codegen'd
   * xxhash64 join key beats a 64-char sha256 string through the shuffle.
   */
  def lshCandidatePairs(wideSigs: DataFrame, idCol: String, numHashes: Int,
                        bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val bandSigs = bandSignatures(wideSigs, idCol, numHashes, bands)
    val a = bandSigs.select(col("band"), col("band_sig"), col(idCol).as("id_a"))
    val b = bandSigs.select(col("band"), col("band_sig"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs via the inverted shingle table —
    * |A∩B| from a key join, never a full cross product. `sizes` carries
    * (idCol, sz) = |shingle set| per doc; [[minhashWide]] produces it for
    * free out of the signature pass. */
  def jaccardForPairs(pairs: DataFrame, shingles: DataFrame, sizes: DataFrame,
                      idCol: String): DataFrame = {
    val sa = shingles.select(col(idCol).as("id_a"), col("shingle"))
    val sb = shingles.select(col(idCol).as("id_b"), col("shingle"))
    val inter = pairs.join(sa, "id_a").join(sb, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType), 4))
      .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
  }

  /** [[jaccardForPairs]] computing sizes from the shingle table itself (an
    * extra aggregation branch — prefer the sizes-from-signature overload). */
  def jaccardForPairs(pairs: DataFrame, shingles: DataFrame, idCol: String): DataFrame =
    jaccardForPairs(pairs, shingles,
      shingles.groupBy(col(idCol)).agg(count(lit(1)).as("sz")), idCol)

  /** Full near-dup pipeline: shingle → minhash → LSH candidates → exact
    * Jaccard verify ≥ threshold. The shingle table feeds three DAG branches
    * (signatures+sizes in one pass, both sides of the intersection join), so
    * it is persisted — at corpus scale this is the
    * materialize-the-inverted-index step, spilling to disk when it outgrows
    * memory. The signature table feeds banding AND the Jaccard denominators,
    * so the verify stage adds no extra pass over the shingles. */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sh = shingleTable(df, textCol, idCol, shingleSize).persist(lvl)
    val sig = minhashWide(sh, idCol, numHashes).persist(lvl)
    val cand = lshCandidatePairs(sig, idCol, numHashes, bands)
    // materialize the (small) verified pair set while the inverted index is
    // cached, then RELEASE the index: returning a lazy plan over persisted
    // inputs strands two cached tables per call — in a long-lived service an
    // unbounded storage leak, and under a bench suite enough memory pressure
    // to make this query cost 4-5× its isolated time
    val res = jaccardForPairs(cand, sh, sig.select(col(idCol), col("sz")), idCol)
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true)
    sh.unpersist(blocking = false)
    sig.unpersist(blocking = false)
    res
  }

  /**
   * Incremental near-dup: candidate pairs RESTRICTED to those touching the
   * new batch — dedup fresh data against an existing corpus without ever
   * re-pairing the corpus against itself. The banding join takes the batch's
   * band signatures (small) against the full band table, so the incremental
   * cost is O(|batch| bands ⋈ band index + verify), independent of |store|²
   * — the only dedup shape a continuously-ingesting 100 TB pipeline can
   * afford. Shingles/signatures are recomputed here for self-containment;
   * in production the store side is the persisted signature index. Result
   * pairs are order-normalized (id_a < id_b) and equal the FULL pipeline's
   * verified pairs filtered to batch-touching ones (the q105 oracle states
   * exactly that).
   */
  def incrementalNearDupPairs(store: DataFrame, batch: DataFrame,
                              textCol: String, idCol: String,
                              shingleSize: Int = 3, numHashes: Int = 16,
                              bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val all = store.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    val sh = shingleTable(all, textCol, idCol, shingleSize).persist(lvl)
    val sig = minhashWide(sh, idCol, numHashes).persist(lvl)
    val bandSigs = bandSignatures(sig, idCol, numHashes, bands)
    val batchBands = bandSigs.join(batch.select(col(idCol)), Seq(idCol), "left_semi")
    val cand = bandSigs.select(col("band"), col("band_sig"), col(idCol).as("id_x"))
      .join(batchBands.select(col("band"), col("band_sig"), col(idCol).as("id_y")),
        Seq("band", "band_sig"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
    // same persist-then-release lifecycle as nearDupPairs (leak lesson)
    val res = jaccardForPairs(cand, sh, sig.select(col(idCol), col("sz")), idCol)
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true)
    sh.unpersist(blocking = false)
    sig.unpersist(blocking = false)
    res
  }

  /** (id, band, band_sig) rows from a wide minhash signature table —
    * shared by the self-join ([[lshCandidatePairs]]), the incremental
    * index ([[SigIndex]]), and the query-vs-index search
    * ([[graft.Engine#searchNearDup]]). Both sides of ANY candidate join
    * MUST use this one spelling — banding only works if equal signature
    * tuples hash equally. */
  def bandSignatures(sig: DataFrame, idCol: String,
                     numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandSigCols = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i")): _*)
    }
    sig.select(col(idCol), posexplode(array(bandSigCols: _*)).as(Seq("band", "band_sig")))
  }

  /**
   * Precomputed near-dup signature state over a fixed corpus side: the
   * shingle table, wide minhash signatures (carrying `sz`), and banded
   * signatures, all pinned. This is what a continuously-ingesting
   * deployment keeps MATERIALIZED next to its store — each incoming batch
   * then pays only its OWN minhash chain, never the corpus's
   * ([[incrementalNearDupPairs]] re-derives the store side per call, which
   * is the self-contained spelling but O(|store|) redundant work per
   * micro-batch; at 100 TB the signature index is the difference between
   * per-batch cost O(|batch|) and O(|corpus|)).
   */
  final case class SigIndex(shingles: DataFrame, sigs: DataFrame,
                            bandSigs: DataFrame, idCol: String,
                            shingleSize: Int, numHashes: Int, bands: Int)

  def buildSigIndex(df: DataFrame, textCol: String, idCol: String,
                    shingleSize: Int = 3, numHashes: Int = 16,
                    bands: Int = 4): SigIndex = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val sh = shingleTable(df, textCol, idCol, shingleSize).localCheckpoint(true)
    val sig = minhashWide(sh, idCol, numHashes).localCheckpoint(true)
    val bandSigs = bandSignatures(sig, idCol, numHashes, bands).localCheckpoint(true)
    SigIndex(sh, sig, bandSigs, idCol, shingleSize, numHashes, bands)
  }

  /**
   * [[incrementalNearDupPairs]] with the store side precomputed: equal
   * output by construction (a doc's shingles/signature depend on nothing
   * but its own text), with per-call cost proportional to the BATCH.
   * Precondition: batch ids are disjoint from the indexed ids (the ingest
   * dedup guarantees it) — a re-delivered id would double its shingle rows
   * in the verify union.
   */
  def incrementalNearDupPairsIndexed(store: SigIndex, batch: DataFrame,
                                     textCol: String,
                                     threshold: Double = 0.5): DataFrame = {
    val idCol = store.idCol
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bsh = shingleTable(batch.select(col(idCol), col(textCol)),
      textCol, idCol, store.shingleSize).persist(lvl)
    val bsig = minhashWide(bsh, idCol, store.numHashes).persist(lvl)
    val bBands = bandSignatures(bsig, idCol, store.numHashes, store.bands)
    // the batch side is small BY DEFINITION of incremental ingest, so it
    // BROADCASTS into the banding probe and the store's band table is only
    // scanned, never shuffled — without the hint the equi-join re-exchanges
    // the whole index per batch, and per-batch cost silently grows with the
    // corpus (measured: 1.2 GB shuffled per 500-doc batch at 500k docs)
    val allBands = store.bandSigs.unionByName(bBands)
    val cand = allBands.select(col("band"), col("band_sig"), col(idCol).as("id_x"))
      .join(broadcast(bBands.select(col("band"), col("band_sig"), col(idCol).as("id_y"))),
        Seq("band", "band_sig"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
      .localCheckpoint(true) // tiny; pins the pair set for the two prunes below
    // prune the store tables to PAIR MEMBERS before the verify join — the
    // member set is a broadcast semi-join filter, so the shingle/size scans
    // stay narrow and the verify works on O(|pairs|·doc_len) rows
    val ids = cand.select(col("id_a").as(idCol))
      .unionByName(cand.select(col("id_b").as(idCol))).distinct()
    val sh = store.shingles.unionByName(bsh)
      .join(broadcast(ids), Seq(idCol), "left_semi")
    val szs = store.sigs.select(col(idCol), col("sz"))
      .unionByName(bsig.select(col(idCol), col("sz")))
      .join(broadcast(ids), Seq(idCol), "left_semi")
    val res = jaccardForPairs(cand, sh, szs, idCol)
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true)
    bsh.unpersist(blocking = false)
    bsig.unpersist(blocking = false)
    res
  }

  // ------------------------------------------------------------------ SimHash
  /**
   * 64-bit SimHash as a typed aggregate over token hashes (SURVEY §2.11 —
   * the custom-UDAF demonstration slot): per bit, majority vote of token
   * hash bits; near-dups have small Hamming distance.
   */
  class SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var j = 0
      while (j < 64) { b(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { a(j) += b(j); j += 1 }
      a
    }
    override def finish(b: Array[Int]): Long = {
      var v = 0L; var j = 0
      while (j < 64) { if (b(j) > 0) v |= (1L << j); j += 1 }
      v
    }
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
  }

  /** 60-bit token hash as LONG from a sha256 prefix, so it composes with
    * [[hamming]] (bitwiseXOR/bit_count need an integral type). 15 hex chars
    * keep the value non-negative and inside a 64-bit long; sha256 (vs the
    * faster xxhash64) keeps the pipeline engine-portable for the oracle. */
  def tokenHash64(t: Column): Column =
    conv(substring(sha2(t, 256), 1, 15), 16, 10).cast(LongType)

  /** SimHash per document over whitespace tokens. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val agg = udaf(new SimHashAgg)
    val toks = df.select(col(idCol), explode(TextFns.tokens(col(textCol))).as("tok"))
      .withColumn("h", conv(substring(sha2(col("tok"), 256), 1, 15), 16, 10).cast(LongType))
    toks.groupBy(col(idCol)).agg(agg(col("h")).as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------- dedup cluster formation
  /**
   * Connected components over a near-dup pair graph — the step that turns
   * pairwise matches into dedup clusters (keep min-id per component as the
   * canonical document). Iterative min-label propagation TO CONVERGENCE:
   * each round every node adopts the smallest label among itself and its
   * neighbors, and the loop stops when a round changes ZERO labels (one
   * cheap count per round on the changed-label diff — the labels table is
   * materialized by that count anyway, so convergence detection is free).
   * A fixed iteration cap would silently split any component whose diameter
   * exceeds it; `maxIters` here is only a runaway-graph safety net (min-label
   * propagation converges in O(diameter) rounds, and near-dup clusters are
   * shallow — a 100 TB corpus hits tens of rounds only under adversarial
   * chain topologies, for which large-star/small-star is the next step).
   */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist(lvl)
    // localCheckpoint (not just persist) each level: `labels` feeds the next
    // round THREE times (union, neighbor join, convergence diff), so without
    // lineage TRUNCATION the logical plan grows ~3× per round — exponential
    // plan-tree blowup that stalls the driver long before the data does.
    // Checkpointed levels keep the plan O(1) per round; each level is FREED
    // once the next one is materialized (storage stays O(1 level), not
    // O(rounds)).
    val obs0 = Observation()
    var (labels, labelIds) = checkpointTracked(levelObs(obs0,
      sym.select(col("src").as("node")).distinct().withColumn("label", col("node")),
      Seq("node", "label")))
    var (curRows, curChk) = levelStats(obs0, labels, Seq("node", "label"))
    var i = 0
    var changed = 1L
    while (changed > 0 && i < maxIters) {
      val viaNeighbor = sym.join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label"))
      val obs = Observation()
      // the label set's size is KNOWN (last level's observed count — the
      // node set never grows), so the level materializes at a row-count-
      // proportional width instead of 32 near-empty tasks (levelWidth)
      val (next, nextIds) = checkpointTracked(levelObs(obs,
        labels.unionAll(viaNeighbor).groupBy("node").agg(min("label").as("label"))
          .coalesce(levelWidth(spark, curRows)),
        Seq("node", "label")))
      // convergence: min-label propagation only ever SHRINKS labels, so a
      // round that changes anything changes the (node,label) set. The
      // content checksum rides the checkpoint job (no extra pass); only an
      // APPARENT fixpoint (equal checksum) pays the exact node-keyed diff
      // that confirms it — once, at the end, not every round.
      val (nextRows, nextChk) = levelStats(obs, next, Seq("node", "label"))
      changed =
        if (nextChk != curChk) 1L
        else next.join(labels.withColumnRenamed("label", "prev"), "node")
          .filter(col("label") =!= col("prev"))
          .count()
      freeIds(spark, labelIds)
      labels = next; labelIds = nextIds; curChk = nextChk; curRows = nextRows
      i += 1
    }
    sym.unpersist()
    labels
  }
  /**
   * Connected components via alternating large-star / small-star rounds
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14) — the adversarial-topology scale path: converges in
   * O(log n) rounds regardless of component DIAMETER, where min-label
   * propagation ([[connectedComponents]]) needs O(diameter) rounds. Use
   * this when dedup graphs may contain long chains (crawl-chain dups,
   * transitive near-dup paths).
   *
   *  - large-star: every node links its LARGER neighbors to the minimum
   *    of its closed neighborhood;
   *  - small-star: after orienting edges large→small, every node links
   *    its smaller neighbors (and itself) to that minimum.
   *
   * Both are one groupBy + one join per round — same shuffle shape as a
   * propagation round — and each level is localCheckpoint'd (see
   * [[connectedComponents]] for why truncation, not caching, is the
   * point). Fixpoint = a round that changes nothing (exact exceptAll
   * diff, not an edge-count heuristic). Returns (node, label).
   */
  def connectedComponentsStar(edges: DataFrame, srcCol: String, dstCol: String,
                              maxIters: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col(srcCol).as("node"))
      .unionAll(edges.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint(true)
    val obs0 = Observation()
    var (cur, curIds) = checkpointTracked(levelObs(obs0,
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct(),
      Seq("u", "v")))
    var (curCount, curChk) = levelStats(obs0, cur, Seq("u", "v"))
    // one large-star + small-star round over the canonical (u > v) edge set
    def starRound(edges0: DataFrame): DataFrame = {
      // large-star over the symmetric view: m(u) = min(N(u) ∪ {u});
      // link strictly-larger neighbors to m
      val sym = edges0.unionAll(edges0.select(col("v").as("u"), col("u").as("v")))
      val mL = sym.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
      // no distinct here: small-star's min is duplicate-proof and the round
      // output dedups — one less shuffle per round
      val afterLarge = sym.join(mL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star on the large→small orientation: m(u) = min(N⁻(u) ∪ {u});
      // link each smaller neighbor and u itself to m
      val o = afterLarge
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mS = o.groupBy("u").agg(min(col("v")).as("m"))
      o.join(mS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(mS.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
    }
    var i = 0
    var changed = 1L
    while (changed > 0 && i < maxIters) {
      // exactly ONE star round per materialization. (Fusing two rounds per
      // checkpoint was tried and is ~2.5× SLOWER: the inner round's output
      // feeds the outer round's symmetric union twice, and without a
      // materialization boundary Spark recomputes the whole inner subtree
      // per branch — the same no-cross-branch-CSE lesson as q57.)
      val obs = Observation()
      // edge levels only ever shrink after the first round — materialize
      // at a width proportional to the last observed level size
      val (next, nextIds) = checkpointTracked(levelObs(obs,
        starRound(cur).coalesce(levelWidth(spark, curCount)), Seq("u", "v")))
      // exact fixpoint on two DISTINCT sets, paid for lazily: count and
      // content checksum ride the checkpoint materialization (no extra job
      // per round — this was ~1 s/round of fixed job overhead); only an
      // APPARENT fixpoint (equal count AND checksum) runs the exceptAll
      // diff that proves equality — once, at the end.
      val (nextCount, nextChk) = levelStats(obs, next, Seq("u", "v"))
      changed =
        if (nextCount != curCount || nextChk != curChk) 1L
        else next.exceptAll(cur).count()
      freeIds(spark, curIds)
      cur = next; curIds = nextIds
      curCount = nextCount; curChk = nextChk
      i += 1
    }
    // fixpoint is a union of stars rooted at component minima: every
    // non-root carries exactly (node, root); roots and isolated nodes
    // label themselves
    nodes.join(cur.select(col("u").as("node"), col("v").as("label")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }

  /** Deterministic random hyperplanes for sign-LSH (one per signature bit),
    * generated driver-side from a fixed seed — index metadata, like IVF
    * centroids (VectorSearch.buildIvf). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Band signatures under sign-LSH: bit b = sign(v · h_b); bits are packed
    * per band into an Int, giving `bands` bucket keys per vector. Vectors
    * whose angle is small agree on most signs, so true near-dups collide in
    * at least one band with overwhelming probability. */
  def lshBandSigs(bands: Int, bitsPerBand: Int, planes: Array[Array[Float]]):
      org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { v: Seq[Float] =>
      Array.tabulate(bands) { b =>
        var sig = 0
        var j = 0
        while (j < bitsPerBand) {
          val h = planes(b * bitsPerBand + j)
          var dot = 0.0
          var i = 0
          while (i < h.length) { dot += v(i).toDouble * h(i); i += 1 }
          if (dot >= 0) sig |= (1 << j)
          j += 1
        }
        sig
      }
    }

  /**
   * Embedding-cosine near-dup pairs: sign-LSH banding bounds the candidate
   * set (the only pairwise work happens inside (band, signature) buckets),
   * then exact cosine over the re-joined vectors verifies ≥ threshold.
   * Two shuffles on ids + one bucket self-join; the vectors are NOT carried
   * through the band explode (8× duplication avoided) — they re-join onto
   * the surviving candidate pairs only.
   */
  def embedNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                        dim: Int, bands: Int = 6, bitsPerBand: Int = 16,
                        threshold: Double = 0.9, seed: Long = 42L,
                        scoreScale: Int = 4): DataFrame = {
    val planes = hyperplanes(dim, bands * bitsPerBand, seed)
    // the (id, band, sig) table feeds BOTH sides of the bucket self-join —
    // persist it so the hyperplane UDF runs once per vector, not twice
    // (~16 bytes × bands per vector: this is the materialized sign-LSH
    // index, the same role the persisted shingle table plays in
    // nearDupPairs; the VECTORS are never persisted or exploded)
    val sigs = vecs
      .select(col(idCol), posexplode(lshBandSigs(bands, bitsPerBand, planes)(col(vecCol)))
        .as(Seq("band", "sig")))
      // (band, sig) packed into ONE int bucket key: sig < 2^bitsPerBand, so
      // band·2^bitsPerBand + sig is bijective — halves the join-key columns
      // the bucket shuffle carries
      .select(col(idCol), (col("band") * lit(1L << bitsPerBand) + col("sig")).as("bsig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sigs.select(col("bsig"), col(idCol).as("id_a"))
    val b = sigs.select(col("bsig"), col(idCol).as("id_b"))
    val cand = a.join(b, Seq("bsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    // same storage lifecycle as nearDupPairs: materialize the verified
    // pairs, then release the sign-LSH index instead of stranding it
    val res = cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("score",
        round(graft.functions.VectorFns.cosineSim(col("__va"), col("__vb")), scoreScale))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
      .localCheckpoint(true)
    sigs.unpersist(blocking = false)
    res
  }

  // ------------------------------------------------- exact set-similarity join
  /**
   * EXACT-recall token-set similarity self-join via prefix filtering
   * (PPJoin family — Xiao et al. WWW'08 / Chaudhuri et al. ICDE'06): every
   * pair with Jaccard ≥ t is found, no LSH false-negative band luck. The
   * complement to [[nearDupPairs]]: minhash trades recall for speed; this
   * trades a heavier candidate join for a guarantee — the shape a
   * contractual dedup (legal/compliance corpora) needs.
   *
   * The set elements are word n-gram shingles (the [[shingleTable]] 60-bit
   * hashes), NOT unigram tokens: template-heavy corpora share most of their
   * unigram vocabulary, so unigram-set Jaccard is quadratically dense
   * (measured: 97k pairs ≥ 0.5 at sf0.01 over unigrams vs 45 over
   * 3-shingles) — shingles keep "similar" meaning "same phrasing".
   *
   * Prefix principle: order each doc's shingles by GLOBAL rarity (document
   * frequency, then value). If J(A,B) ≥ t then |A∩B| ≥ t·|A|, so A and B
   * must collide inside their first |A|−⌈t·|A|⌉+1 rarest elements —
   * candidates are generated only from those prefixes, and rare-first
   * ordering keeps the per-element candidate lists short (the frequent
   * elements that would each produce O(df²) pairs never enter a prefix).
   * The per-doc ordering is a window partitioned BY DOC (never a global
   * row_number — the single-task trap), the doc-frequency table is an
   * aggregate over 8-byte keys, and the verify stage is the same
   * inverted-index count join as [[jaccardForPairs]].
   *
   * All threshold math is integer (t = tNum/tDen): o_min = ⌈t·sz⌉ =
   * (tNum·sz + tDen−1) div tDen; the final test is tDen·inter ≥
   * tNum·(sz_a+sz_b−inter) — exact in both engines, no float anywhere.
   * Output: (id_a, id_b, inter, sz_a, sz_b, jacc_bp) with
   * jacc_bp = 10000·inter div (sz_a+sz_b−inter), ordered pairs id_a < id_b.
   */
  def setSimJoin(df: DataFrame, textCol: String, idCol: String,
                 tNum: Int, tDen: Int, shingleSize: Int = 3): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold must be in (0,1]")

    // Prefix-filter recall holds under ANY consistent global token order
    // (Chaudhuri/Ganti/Kaushik 2006 — both docs of a qualifying pair keep
    // ≥1 shared token in their prefixes as long as everyone prunes by the
    // SAME total order). The classic df-ascending order only TIGHTENS the
    // candidate set; on 8-byte-hashed shingles the hash order is already
    // frequency-agnostic, so order by the hashed token itself.
    //
    // The per-doc SORTED SET is computed inside the shingling pass: a doc's
    // token set is per-row state, so dedup + sort are a narrow map — the
    // exploded-then-`distinct` spelling paid a full shuffle, and the two
    // id-partitioned windows (rank + size) paid another, for facts (rn, sz,
    // prefix membership) that the array already knows positionally. This
    // cut q118 from 4.5 s to the exchanges that are genuinely irreducible:
    // the prefix-token join and the candidate dedup.
    // CPU-shaped parallelism guards: SHA-256 shingling and the per-pair
    // verify are compute-per-row, not bytes-per-row, so "let AQE coalesce
    // to ~64MB partitions" (right for IO-bound stages) serializes them —
    // a single-file corpus scans as 1 partition and 270k digests run on
    // one core. Explicit widths are respected by AQE; only applied when
    // the input is narrower than the session's shuffle width (a real
    // corpus at scale already has the partitions).
    val np = df.sparkSession.sessionState.conf.numShufflePartitions
    val src = if (df.rdd.getNumPartitions < np) df.repartition(np) else df
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sets = src
      .select(col(idCol), shingleSetCol(col(textCol), shingleSize).as("ts"))
      .withColumn("sz", size(col("ts")).cast("long"))
      .filter(col("sz") > 0)
      .persist(lvl) // feeds the prefix explode AND both verify sides
    sets.count() // materialize once, in parallel, before the branches fork

    // prefix length = sz − ⌈t·sz⌉ + 1 (integer ceil div — exact, no float);
    // rn is the token's 1-based rank in the doc's sorted set (pos + 1)
    val prefixes = sets
      .withColumn("plen", expr(s"sz - ((sz * $tNum + ${tDen - 1}) DIV $tDen) + 1"))
      .select(col(idCol), col("sz"),
        posexplode(slice(col("ts"), lit(1), col("plen").cast("int")))
          .as(Seq("pos", "tok")))
      .select(col("tok"), col(idCol), col("sz"), (col("pos") + 1).as("rn"))

    // Candidate pair occurrences, pruned by PPJoin's POSITIONAL filter
    // before they ever become pairs: a qualifying pair's FIRST shared
    // token (shared tokens appear in the same relative order in both docs)
    // bounds the intersection by 1 + min(remaining-after-it on each side),
    // and the first shared token of a qualifying pair provably sits in
    // BOTH prefixes — so dropping every occurrence whose bound cannot
    // reach the overlap threshold α = ⌈t(|A|+|B|)/(1+t)⌉ keeps exact
    // recall while killing the pairs whose only shared tokens sit late in
    // both prefixes (the bulk of the junk at moderate thresholds).
    val cand = prefixes
      .select(col("tok"), col(idCol).as("id_a"), col("sz").as("pa"), col("rn").as("ra"))
      .join(prefixes
        .select(col("tok"), col(idCol).as("id_b"), col("sz").as("pb"), col("rn").as("rb")),
        Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      // size filter: t·max ≤ min, integerized — prunes before the verify join
      .filter(greatest(col("pa"), col("pb")) * tNum <= least(col("pa"), col("pb")) * tDen)
      // positional filter: (1 + min(pa−ra, pb−rb))·(tNum+tDen) ≥ tNum·(pa+pb)
      .filter((lit(1) + least(col("pa") - col("ra"), col("pb") - col("rb")))
        * (tNum + tDen) >= (col("pa") + col("pb")) * tNum)
      // explicit-width pair dedup: one exchange hashed on the pair, kept at
      // full width so the verify stage downstream runs on every core (the
      // same CPU-shaped-stage rule as `src` above)
      .select("id_a", "id_b")
      .repartition(np, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Verify with ONE row per pair side: each doc's sorted token set rides
    // as an array straight from `sets` (no re-aggregation), the exact
    // intersection is a single merge scan over the two sorted long arrays
    // (O(n+m), no boxing, no per-call hash set — array_intersect's generic
    // path was the q118 hotspot). No pair×token fan-out. At corpus scale
    // this is two hash joins on id of |candidates| rows against the
    // |docs|-row array table.
    val res = cand
      .join(sets.select(col(idCol).as("id_a"), col("ts").as("ts_a"), col("sz").as("sz_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("ts").as("ts_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("inter", sortedIntersectCol(col("ts_a"), col("ts_b")))
      .filter(col("inter") * tDen >= (col("sz_a") + col("sz_b") - col("inter")) * tNum)
      .withColumn("jacc_bp", expr("(10000 * inter) DIV (sz_a + sz_b - inter)"))
      .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jacc_bp")
      .localCheckpoint(true) // persist-then-release lifecycle (leak lesson)
    sets.unpersist(blocking = false)
    res
  }

  // ------------------------------------------------ sorted-neighborhood (SNM)
  /**
   * Blocked sorted-neighborhood candidate pairing (the third classic
   * candidate-generation family beside hash blocking and LSH banding):
   * records are ranked within `blkCol` under (`sortCols`, `idCol`) and each
   * record is paired with its `window` successors in sort order. Candidate
   * count is O(n·window) BY CONSTRUCTION — and so is the JOIN, because each
   * record EXPLODES its `window` neighbor offsets (`sequence(rnk+1,
   * rnk+window)`) and the pairing is an equi-join on (block, rank): a hot
   * block (boilerplate prefix shared by millions of records) never
   * materializes block × block anywhere in the plan; offsets past the
   * block's end simply find no partner. Returns
   * (id_a, id_b, blk, rnk_a, rnk_b); payload columns join back by id.
   */
  def snmCandidates(df: DataFrame, blkCol: String, sortCols: Seq[String],
                    idCol: String, window: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(blkCol))
      .orderBy(sortCols.map(col) :+ col(idCol).asc: _*)
    val ranked = df
      .withColumn("__rnk", row_number().over(w).cast(LongType))
      .select(col(blkCol).as("blk"), col("__rnk"), col(idCol).as("__id"))
    val a = ranked.select(col("blk"), col("__rnk").as("rnk_a"), col("__id").as("id_a"))
      .withColumn("rnk_b", explode(sequence(col("rnk_a") + 1, col("rnk_a") + window)))
    val b = ranked.select(col("blk"), col("__rnk").as("rnk_b"), col("__id").as("id_b"))
    a.join(b, Seq("blk", "rnk_b"))
      .select(col("id_a"), col("id_b"), col("blk"), col("rnk_a"), col("rnk_b"))
  }

  /**
   * Classic GLOBAL sorted-neighborhood pairing: ONE total order over the
   * whole corpus under (`sortCols`, `idCol`) — no blocks — with the sliding
   * window crossing partition boundaries. The scale-first spelling of "sort
   * everything, compare each record to its w neighbors":
   *
   *  1. range-partition + sort-within-partitions on the key (the
   *     distributed sort — Spark samples the key distribution, so ranges
   *     balance even on skewed keys);
   *  2. each partition ships its FIRST `window` rows to its predecessor
   *     (the duplicated fringe — `window` rows per partition, metadata-
   *     sized, moved by one tiny targeted shuffle);
   *  3. one mapPartitions pass slides a `window`-row buffer over
   *     own-rows ++ fringe, emitting (a, b) when a is an own row — fringe
   *     rows enter the buffer only as b-sides, so every cross-boundary pair
   *     is emitted exactly once (fringe×fringe pairs belong to the next
   *     partition, where both are own rows).
   *
   * mapPartitions is justified here (SURVEY §2.11 preference order (d)):
   * a cross-partition sliding window over a total order is the one shape
   * Catalyst's window functions can't express without a single-partition
   * Window — the thing that dies at scale. Emits (id_a, id_b) with global
   * positions (pos_a, pos_b), pos_b - pos_a ∈ [1, window]. Deterministic:
   * the sort key is totalized by the `idCol` tie-break. `idCol` must be
   * LONG (the fringe rows travel as primitive (pos, id) pairs); hash or
   * dense-rank string keys to longs first.
   */
  def snmGlobalPairs(df: DataFrame, sortCols: Seq[String], idCol: String,
                     window: Int, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed = df.select((sortCols :+ idCol).map(col): _*)
    val sorted = keyed
      .repartitionByRange(np, (sortCols.map(col) :+ col(idCol).asc): _*)
      .sortWithinPartitions(sortCols.map(col) :+ col(idCol).asc: _*)
    val idIdx = sorted.schema.fieldIndex(idCol)
    val rows = sorted.rdd // physical partitioning + intra-partition order kept
    val nParts = rows.getNumPartitions
    // One lightweight pass (the zipWithIndex discipline — no single-
    // partition stage) gathers per-partition counts AND each partition's
    // first `window` ids. Driver state is O(window · partitions) —
    // metadata-sized at any corpus scale (1000 executors × w=10 → 10k ids).
    val headsAndCounts = rows.mapPartitionsWithIndex { (p, it) =>
      val heads = new scala.collection.mutable.ArrayBuffer[Long](window)
      var n = 0L
      it.foreach { r =>
        if (n < window) heads += r.getLong(idIdx)
        n += 1L
      }
      Iterator.single((p, n, heads.toArray))
    }.collect()
    val counts = headsAndCounts.map(t => t._1 -> t._2).toMap
    val offsets = (0 until nParts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L)).toArray
    // every head row with its GLOBAL position, sorted — the fringe pool.
    // Positions base+count .. base+count+window-1 (the successors a
    // partition's tail rows pair with) are ALWAYS covered by this pool:
    // they are among the first `window` rows of whichever partitions they
    // fall in (short and empty partitions included — a partition with
    // c < window rows contributes all c of them).
    val headPool: Array[(Long, Long)] = headsAndCounts
      .flatMap { case (p, _, hs) => hs.zipWithIndex.map { case (id, i) => (offsets(p) + i, id) } }
      .sortBy(_._1)
    val poolB = spark.sparkContext.broadcast(headPool)
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val pairs = rows.mapPartitionsWithIndex { (p, own) =>
      val base = offsetsB.value(p)
      // fringe: the `window` global positions following this partition's
      // last row, pulled from the broadcast head pool by binary search
      val pool = poolB.value
      val buf = new scala.collection.mutable.ArrayDeque[(Long, Long)]() // (pos, id), own rows only as anchors
      var pos = base - 1L
      val ownPairs = own.flatMap { r =>
        pos += 1L
        val id = r.getLong(idIdx)
        val out = buf.iterator.map { case (bp, bid) => (bid, id, bp, pos) }.toList
        buf.append((pos, id))
        if (buf.size > window) buf.removeHead()
        out
      }
      // after own rows are exhausted, drain the buffer against the fringe
      // (cross-boundary pairs anchored HERE; fringe×fringe pairs are the
      // next partition's own×own pairs — emitted exactly once)
      val tailPairs: Iterator[(Long, Long, Long, Long)] = new Iterator[(Long, Long, Long, Long)] {
        private var produced: Iterator[(Long, Long, Long, Long)] = null
        private def it: Iterator[(Long, Long, Long, Long)] = {
          if (produced == null) {
            // buf now holds the last min(window, count) own rows
            val lastPos = pos
            val loPos = lastPos + 1L
            val hiPos = lastPos + window // inclusive
            var lo = java.util.Arrays.binarySearch(pool.map(_._1), loPos)
            if (lo < 0) lo = -lo - 1
            val fringe = pool.iterator.slice(lo, pool.length)
              .takeWhile(_._1 <= hiPos).toArray
            produced = fringe.iterator.flatMap { case (fp, fid) =>
              buf.iterator
                .filter { case (bp, _) => fp - bp <= window }
                .map { case (bp, bid) => (bid, fid, bp, fp) }
            }
          }
          produced
        }
        def hasNext: Boolean = it.hasNext
        def next(): (Long, Long, Long, Long) = it.next()
      }
      ownPairs ++ tailPairs
    }
    import spark.implicits._
    pairs.toDF("id_a", "id_b", "pos_a", "pos_b")
  }
}
