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
}
