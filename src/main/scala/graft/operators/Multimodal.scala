package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns (BASELINE.json extension mandate): media payloads are
 * opaque `BINARY` columns with a typed metadata struct riding alongside —
 * the 100 TB layout where parquet keeps bytes and metadata in one row group
 * and column pruning lets metadata-only queries skip the payload pages
 * entirely.
 *
 * The decode step (image/audio codec → pixels/samples) is STUBBED with a
 * deterministic transform — the codec libraries are not in this container —
 * but everything Spark-level is real: the binary column, the metadata
 * struct, the per-partition batched decode loop (`decodeFeatures`, the same
 * batch shape as the reference's embedding buffer, vdb.py:76-79), and the
 * frame-sampling explode (`frameSample`). A real codec drops into
 * [[MediaCodec.decode]] without touching any plan.
 */
object Multimodal {

  /**
   * Media table derived deterministically from the document corpus: the
   * UTF-8 bytes of `text` stand in for encoded media bytes; format and
   * dimensions are derived metadata. At scale this is the ingest shape:
   * `binary` payload + `struct<format,width,height>` + content digest key.
   */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
        (col("n_chars") % 640 + 16).cast(IntegerType).as("width"),
        (col("n_chars") % 480 + 16).cast(IntegerType).as("height")).as("meta"))

  /** The stubbed codec: deterministic features from the raw payload bytes.
    * Real image/audio decoding replaces this one object. */
  object MediaCodec {
    /** "Decode" a batch of payloads → (n_bytes, sha256-hex digest, 8-dim
      * feature vector derived from the digest). Batch-at-a-time signature so
      * a vectorized/JNI codec slots in unchanged. */
    def decode(batch: Seq[Array[Byte]]): Seq[(Long, String, Array[Double])] =
      batch.map { payload =>
        val md = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
        val hex = md.map("%02x".format(_)).mkString
        val feat = Array.tabulate(8) { j =>
          (java.lang.Long.parseLong(hex.substring(j * 8, j * 8 + 8), 16) % 1000L) / 1000.0
        }
        (payload.length.toLong, hex, feat)
      }
  }

  /**
   * Per-partition batched decode / feature extraction — the multimodal
   * equivalent of the reference's embed loop (vdb.py:62-85): buffer
   * `batchSize` payloads, run the codec once per batch, emit one feature row
   * per item. One codec instance per partition; no driver round-trips.
   */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", LongType),
      StructField("digest", StringType),
      StructField("feat", ArrayType(DoubleType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = media.schema.fieldIndex("doc_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = MediaCodec.decode(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.iterator.zip(decoded.iterator).map { case (r, (n, hex, feat)) =>
          Row(r.getLong(idIdx), n, hex, feat.toSeq)
        }
      }
    }(enc)
  }

  /**
   * Resize: deterministic 1-in-`factor` downsample of the decoded signal
   * (the stub codec's "thumbnail" — keep the first sample of every block),
   * with the metadata dimensions scaled to match. A real image resampler
   * replaces the regex with a kernel; the Spark shape (narrow map over the
   * payload + struct rewrite, no shuffle) is the real thing.
   */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 2, "resize factor must be >= 2")
    val keepOneInFactor = "(.)" + ("." * (factor - 1))
    media.select(
      col("doc_id"),
      regexp_replace(col("payload").cast(StringType), keepOneInFactor, "$1").as("thumb"),
      struct(
        col("meta.format").as("format"),
        floor(col("meta.width") / factor).cast(IntegerType).as("width"),
        floor(col("meta.height") / factor).cast(IntegerType).as("height")).as("meta"))
  }

  /**
   * Frame sampling: slice the decoded signal into fixed-width frames at a
   * stride (video frame-sample / audio windowing shape), keeping at most
   * `maxFrames` per item — an explode whose fan-out is bounded by plan
   * construction, not data. The signal here is the payload decoded back to
   * text (the stub codec is the identity); frames are hashed so downstream
   * dedup/search can treat them as first-class items.
   */
  def frameSample(media: DataFrame, frameChars: Int, stride: Int,
                  maxFrames: Int): DataFrame = {
    val nFrames = least(lit(maxFrames),
      (floor((length(col("signal")) - frameChars).cast(DoubleType) / stride) + 1)
        .cast(IntegerType))
    media
      .select(col("doc_id"), col("payload").cast(StringType).as("signal"))
      .filter(length(col("signal")) >= frameChars)
      .select(col("doc_id"), col("signal"),
        posexplode(sequence(lit(0), nFrames - 1)).as(Seq("i", "frame_no")))
      .select(col("doc_id"), col("frame_no"),
        sha2(substr(col("signal"), col("frame_no") * stride + 1, lit(frameChars)), 256)
          .as("frame_hash"))
  }
}
