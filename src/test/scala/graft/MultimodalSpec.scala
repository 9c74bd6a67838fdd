package graft

import graft.operators.{Dedup, Multimodal}
import graft.queries.QHelpers
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs = QHelpers.t(spark, sf, "documents")

  test("media table: payload bytes are the UTF-8 encoding; metadata typed") {
    val row = Multimodal.mediaTable(docs).filter(col("doc_id") === 0)
      .select("payload", "meta.format", "meta.width", "meta.height").head()
    val text = docs.filter(col("doc_id") === 0).select("text").head().getString(0)
    assert(row.getAs[Array[Byte]](0).sameElements(text.getBytes("UTF-8")))
    assert(row.getString(1) == "png") // doc_id 0 → format index 1
    assert(row.getInt(2) >= 16 && row.getInt(3) >= 16)
  }

  test("batched decode: digest matches single-item reference, all rows kept") {
    val media = Multimodal.mediaTable(docs.limit(10)).repartition(2)
    val out = Multimodal.decodeFeatures(media, batchSize = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 10)
    val text0 = docs.filter(col("doc_id") === 0).select("text").head().getString(0)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(text0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head.getAs[String]("digest") == expected)
    out.foreach { r =>
      val feat = r.getSeq[Double](r.fieldIndex("feat"))
      assert(feat.length == 8 && feat.forall(f => f >= 0.0 && f < 1.0))
    }
  }

  test("frame sample: stride/width honored, fan-out bounded by maxFrames") {
    val frames = Multimodal.frameSample(Multimodal.mediaTable(docs),
      frameChars = 64, stride = 48, maxFrames = 8)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
    assert(perDoc.forall(_.getLong(1) <= 8))
    assert(frames.select("frame_hash").head().getString(0).length == 64)
  }

  test("embedding near-dup: sign-LSH + exact verify finds exactly the planted pairs") {
    val e = QHelpers.t(spark, sf, "embeddings").select("vec_id", "embedding")
    val planted = e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") + ((col("vec_id") + i) % 7 - 3) * 1e-4).cast("float"))
          .as("embedding"))
    val nPlanted = planted.count()
    val pairs = Dedup.embedNearDupPairs(e.unionAll(planted), "vec_id", "embedding",
      dim = 64, bands = 6, bitsPerBand = 16, threshold = 0.9).collect()
    assert(pairs.length == nPlanted)
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 10000))
    assert(pairs.forall(_.getDouble(2) >= 0.99))
  }

  test("q196 hot-frame cap: the ubiquitous intro frame is dropped; fan-out stays df-bounded") {
    // the q196 fixture shape: every media item opens with the SAME 32-char
    // intro, so frame 0's hash has df = corpus size — without the cap that
    // one key fans out corpus² in the self-join
    val media = docs.select(col("doc_id"),
      concat(lit("INTRO_TEST_PATTERN_0123456789ABC"), col("text"))
        .cast("binary").as("payload"))
    val nMedia = media.count()
    val frames = Multimodal.frameSample(media, frameChars = 32, stride = 16, maxFrames = 20)
    val dfTab = frames.groupBy("frame_hash").agg(countDistinct("doc_id").as("df"))
    // the planted boilerplate frame exists and exceeds the cap
    val hot = dfTab.filter(col("df") > 64)
    assert(hot.count() >= 1)
    assert(dfTab.agg(max("df")).head.getLong(0) == nMedia)
    val cold = dfTab.filter(col("df") <= 64).select("frame_hash")
    val kept = frames.join(cold, "frame_hash")
    // candidate bound: sum over kept hashes of df*(df-1)/2 — with the cap
    // each term is ≤ 64², and the UNCAPPED intro term (nMedia choose 2)
    // alone would dwarf the whole capped total
    val candidates = kept.as("a").join(kept.as("b"),
      col("a.frame_hash") === col("b.frame_hash")
        && col("a.doc_id") < col("b.doc_id")).count()
    assert(candidates < nMedia * (nMedia - 1) / 2,
      s"cap did not bound the fan-out: $candidates candidates from $nMedia items")
  }
}
