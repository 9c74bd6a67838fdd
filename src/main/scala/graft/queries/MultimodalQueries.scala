package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QHelpers._

/**
 * Multimodal-column queries (BASELINE.json mandate): binary payloads with
 * typed metadata, a batched decode stub (`mapPartitions`, real plumbing /
 * fake codec — see graft.operators.Multimodal), and frame sampling. The
 * media table is derived deterministically from `documents` so every stage
 * stays DuckDB-checkable (the payload is the UTF-8 encoding of `text`, and
 * DuckDB's sha256(VARCHAR) hashes exactly those bytes).
 */
object MultimodalQueries {

  private val mediaSql =
    """SELECT doc_id, encode(text) AS payload, text,
      |  ['png','jpeg','wav'][cast(doc_id % 3 + 1 as int)] AS format,
      |  cast(n_chars % 640 + 16 as int) AS width,
      |  cast(n_chars % 480 + 16 as int) AS height
      |FROM documents""".stripMargin

  val queries: Map[String, Q] = Map(
    // metadata-only scan: column pruning must skip the payload pages
    "q35_media_meta" -> ((s, dir) => {
      Multimodal.mediaTable(t(s, dir, "documents"))
        .groupBy(col("meta.format").as("format"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("total_bytes"),
          round(avg(col("meta.width").cast(DoubleType)), 2).as("avg_width"),
          round(avg(col("meta.height").cast(DoubleType)), 2).as("avg_height"))
        .orderBy(col("format"))
    }),

    // batched decode stub over the binary payload (vdb.py:76-79 batch shape).
    // The feature vector is projected to scalar columns for the oracle
    // compare (list-typed outputs are not hashable by the driver); the
    // array-valued form is covered by MultimodalSpec.
    "q36_media_decode" -> ((s, dir) => {
      val feats = (0 until 8).map(j => element_at(col("feat"), j + 1).as(s"f$j"))
      Multimodal.decodeFeatures(Multimodal.mediaTable(t(s, dir, "documents")))
        .select(col("doc_id") +: col("n_bytes") +: col("digest") +: feats: _*)
        .orderBy(col("doc_id"))
    }),

    // resize stub: 1-in-4 signal downsample + scaled metadata
    "q54_media_resize" -> ((s, dir) => {
      Multimodal.resize(Multimodal.mediaTable(t(s, dir, "documents")), factor = 4)
        .select(col("doc_id"), length(col("thumb")).as("n_thumb_chars"),
          sha2(col("thumb"), 256).as("thumb_hash"),
          col("meta.width").as("w"), col("meta.height").as("h"))
        .orderBy(col("doc_id"))
    }),

    // frame sampling: bounded explode of fixed-width signal windows
    "q37_frame_sample" -> ((s, dir) => {
      Multimodal.frameSample(Multimodal.mediaTable(t(s, dir, "documents")),
          frameChars = 64, stride = 48, maxFrames = 8)
        .orderBy(col("doc_id"), col("frame_no"))
    }),

    // Cross-video frame-containment dedup — the production video-dedup
    // shape (YouTube-style re-upload detection): two items sharing ≥ K
    // identical frame hashes are the same footage, robust to trailing
    // trims/re-encodes because frames are stride-aligned from the start.
    // Planted re-uploads (every 9th item, 40 chars of signal trimmed)
    // guarantee true pairs at every scale; every item also opens with the
    // SAME 32-char intro (a test pattern / channel card — the ubiquitous
    // frame every real video corpus carries). The pair fan-out is an
    // inverted-index join on frame_hash with the stop-token discipline:
    // frame document-frequency is pre-aggregated and hashes with df > 64
    // are dropped BEFORE the self-join — the intro frame (df = corpus
    // size) would otherwise make one join key fan out corpus², while no
    // legitimate duplicate group approaches the cap. Per-key join fan-out
    // is thereby bounded by the CAP, never by corpus size.
    "q196_frame_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val media = docs
        .unionByName(docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 7000000000L).as("doc_id"),
            col("text").substr(lit(1),
              greatest(length(col("text")) - 40, lit(1))).as("text")))
        .select(col("doc_id"),
          concat(lit("INTRO_TEST_PATTERN_0123456789ABC"), col("text"))
            .cast(BinaryType).as("payload"))
      val frames = Multimodal.frameSample(media,
        frameChars = 32, stride = 16, maxFrames = 20)
      val cold = frames.groupBy(col("frame_hash"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= 64)
        .select(col("frame_hash"))
      val kept = frames.join(cold, "frame_hash")
      kept.as("a").join(kept.as("b"),
          col("a.frame_hash") === col("b.frame_hash")
            && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(countDistinct(col("a.frame_hash")).as("shared_frames"))
        .filter(col("shared_frames") >= 8)
        .orderBy(col("id_a"), col("id_b"))
    }))

  val oracle: Map[String, String] = Map(
    "q35_media_meta" ->
      s"""WITH media AS ($mediaSql)
         |SELECT format, count(*) AS n,
         |  cast(sum(octet_length(payload)) as bigint) AS total_bytes,
         |  round(avg(cast(width as double)), 2) AS avg_width,
         |  round(avg(cast(height as double)), 2) AS avg_height
         |FROM media GROUP BY format ORDER BY format""".stripMargin,

    "q36_media_decode" -> {
      val feats = (0 until 8).map(j =>
        s"(cast('0x' || substr(sha256(text), ${j * 8 + 1}, 8) as bigint) % 1000) / 1000.0 AS f$j")
        .mkString(",\n        |  ")
      s"""SELECT doc_id,
         |  cast(octet_length(encode(text)) as bigint) AS n_bytes,
         |  sha256(text) AS digest,
         |  $feats
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q54_media_resize" ->
      """WITH r AS (
        |  SELECT doc_id, regexp_replace(text, '(.)...', '\1', 'g') AS thumb,
        |    cast(floor((n_chars % 640 + 16) / 4.0) as int) AS w,
        |    cast(floor((n_chars % 480 + 16) / 4.0) as int) AS h
        |  FROM documents)
        |SELECT doc_id, length(thumb) AS n_thumb_chars, sha256(thumb) AS thumb_hash, w, h
        |FROM r ORDER BY doc_id""".stripMargin,

    "q196_frame_dedup" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |media AS (
        |  SELECT doc_id, 'INTRO_TEST_PATTERN_0123456789ABC' || text AS signal FROM docs
        |  UNION ALL
        |  SELECT doc_id + 7000000000 AS doc_id,
        |    'INTRO_TEST_PATTERN_0123456789ABC' ||
        |      substring(text, 1, cast(greatest(length(text) - 40, 1) as int)) AS signal
        |  FROM docs WHERE doc_id % 9 = 0),
        |f AS (
        |  SELECT doc_id,
        |    sha256(substring(signal, cast(frame_no * 16 + 1 as int), 32)) AS frame_hash
        |  FROM (
        |    SELECT doc_id, signal,
        |      unnest(generate_series(0,
        |        least(20, cast(floor((length(signal) - 32) / 16.0) as int) + 1) - 1))
        |        AS frame_no
        |    FROM media WHERE length(signal) >= 32)),
        |cold AS (
        |  SELECT frame_hash FROM f GROUP BY frame_hash
        |  HAVING count(DISTINCT doc_id) <= 64),
        |fk AS (SELECT f.doc_id, f.frame_hash FROM f JOIN cold USING (frame_hash)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(DISTINCT a.frame_hash) AS shared_frames
        |  FROM fk a JOIN fk b ON a.frame_hash = b.frame_hash AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, cast(shared_frames as bigint) AS shared_frames
        |FROM p WHERE shared_frames >= 8 ORDER BY id_a, id_b""".stripMargin,

    "q37_frame_sample" ->
      """WITH media AS (SELECT doc_id, text AS signal FROM documents WHERE length(text) >= 64),
        |f AS (
        |  SELECT doc_id, signal,
        |    unnest(generate_series(0,
        |      least(8, cast(floor((length(signal) - 64) / 48.0) as int) + 1) - 1)) AS frame_no
        |  FROM media)
        |SELECT doc_id, cast(frame_no as int) AS frame_no,
        |  sha256(substring(signal, cast(frame_no * 48 + 1 as int), 64)) AS frame_hash
        |FROM f ORDER BY doc_id, frame_no""".stripMargin)
}
