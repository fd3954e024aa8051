package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` media payloads with typed
  * metadata, processed batch-wise per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (see [[decodeStub]]); everything
  * Spark-side — schema, partitioning, batch iteration shape, feature
  * schema — is real and tested (MultimodalSpec). On a real cluster the
  * stub body is replaced by the codec call; the mapPartitions batch shape
  * (reuse per-partition decoder state, stream batches of rows) is exactly
  * what a JNI/FFI decoder needs.
  *
  * Scale: media bytes never hit the driver; per-partition iteration keeps
  * one decoder instance per task; metadata-only queries prune the binary
  * column at the parquet scan (columnar pruning — verified via explain in
  * the spec).
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Typed asset row: what a media table looks like at ingest. */
  final case class Asset(asset_id: Long, mime: String, media: Array[Byte], width: Int, height: Int)
  /** Extracted features (decode output). */
  final case class AssetFeatures(asset_id: Long, mime: String, n_bytes: Long,
      checksum: Long, head_hex: String, frames: Int)

  /** Synthesize an assets table from `documents` (deterministic: media =
    * UTF-8 bytes of text; real pipelines read image/audio/video files via
    * binaryFile). */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    table(s, d, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        Asset(id, if (id % 3 == 0) "image/png" else if (id % 3 == 1) "audio/wav" else "video/mp4",
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8), (n % 640).toInt, (n % 480).toInt)
      }
  }

  /** STUB decode: a deterministic fake standing in for the real codec.
    * Real implementation decodes `media` (PNG/WAV/MP4) and emits true
    * features; the fake derives them from the bytes so tests are stable.
    * The per-partition shape (one "decoder" per partition, batch loop) is
    * the real contract. */
  def decodeStub(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real code: val decoder = Codec.open(...) — once per partition
      it.map { a =>
        // ??? <- real decode goes here; deterministic fake below
        var h = 1125899906842597L
        var i = 0
        while (i < a.media.length) { h = 31 * h + (a.media(i) & 0xff); i += 1 }
        val head = a.media.take(8).map(b => f"${b & 0xff}%02x").mkString
        AssetFeatures(a.asset_id, a.mime, a.media.length.toLong, h, head,
          frames = if (a.mime.startsWith("video")) (a.media.length % 30) + 1 else 1)
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // -- metadata-only projection: oracle-checkable (byte length of UTF-8
    //    text computed identically in DuckDB)
    "x_mm_meta" -> ((s, d) =>
      assets(s, d).toDF()
        .filter(col("asset_id") < 100)
        .select(col("asset_id"), col("mime"), length(col("media")).cast("long").as("n_bytes"))
        .orderBy("asset_id")),

    // -- full decode-stub pipeline: rows-only driver check + MultimodalSpec
    "x_mm_features" -> ((s, d) =>
      decodeStub(assets(s, d)).toDF()
        .filter(col("asset_id") < 100)
        .groupBy("mime")
        .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
          max("frames").cast("long").as("max_frames"))
        .orderBy("mime")),

    // -- resize planning: fit each image into a 64×64 box preserving
    //    aspect ratio — pure integer arithmetic on the typed metadata, so
    //    oracle-exact; the actual pixel work is the decode stub's job
    //    (same mapPartitions shape as decodeStub at scale)
    "x_mm_resize" -> ((s, d) =>
      assets(s, d).toDF()
        .filter(col("mime") === "image/png" && col("asset_id") < 300)
        .select(col("asset_id"),
          greatest(col("width"), lit(1)).cast("long").as("w"),
          greatest(col("height"), lit(1)).cast("long").as("h"))
        .select(col("asset_id"), col("w"), col("h"),
          when(col("w") >= col("h"), lit(64L)).otherwise(expr("(w * 64) div h")).as("new_w"),
          when(col("w") >= col("h"), expr("(h * 64) div w")).otherwise(lit(64L)).as("new_h"))
        .orderBy("asset_id")),

    // -- frame sampling: every 5th frame of each video asset, fanned out
    //    one row per sampled frame (the shape a frame-level feature
    //    extractor consumes). Frame count comes from the deterministic
    //    decode stub, so the fan-out itself is oracle-exact; at scale this
    //    is a generator over the decode output — no shuffle.
    "x_mm_frames" -> ((s, d) =>
      decodeStub(assets(s, d)).toDF()
        .filter(col("mime") === "video/mp4" && col("asset_id") < 200)
        .select(col("asset_id"), col("frames").cast("long").as("frames"),
          explode(expr("sequence(0L, CAST(frames AS LONG) - 1L, 5L)")).as("frame_no"))
        .select(col("asset_id"), col("frames"), col("frame_no"),
          expr("frame_no div 5").as("sample_idx"))
        .orderBy("asset_id", "frame_no"))
  )

  val oracle: Map[String, String] = Map(
    "x_mm_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 100 ORDER BY asset_id""".stripMargin,
    // x_mm_features: stub-decode output → rows-only check + MultimodalSpec.

    // width/height are synthesized from n_chars (assets()); the resize
    // plan is integer arithmetic — exact oracle
    "x_mm_resize" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    greatest(CAST(n_chars % 640 AS BIGINT), 1) AS w,
        |    greatest(CAST(n_chars % 480 AS BIGINT), 1) AS h
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 300)
        |SELECT asset_id, w, h,
        |  CASE WHEN w >= h THEN 64 ELSE (w * 64) // h END AS new_w,
        |  CASE WHEN w >= h THEN (h * 64) // w ELSE 64 END AS new_h
        |FROM a ORDER BY asset_id""".stripMargin,

    // frames = (octet_length % 30) + 1 for video assets — the stub is
    // deterministic arithmetic, so the frame fan-out has an exact oracle
    "x_mm_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS asset_id,
        |         CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS frames
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 200),
        |f AS (
        |  SELECT asset_id, frames,
        |         unnest(generate_series(0, frames - 1, 5)) AS frame_no
        |  FROM v)
        |SELECT asset_id, frames, frame_no, frame_no // 5 AS sample_idx
        |FROM f ORDER BY asset_id, frame_no""".stripMargin
  )
}
