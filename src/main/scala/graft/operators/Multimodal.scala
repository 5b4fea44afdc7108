package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the LLM-pipeline surface: media payloads
  * as opaque `binary` columns with typed metadata, decode/feature-extract
  * as per-partition batch operations.
  *
  * The actual codecs (image decode, audio resample, video frame-grab) are
  * STUBBED with deterministic byte-derived fakes — this container has no
  * media libraries — but the Spark-side contract is real: schema, binary
  * payload column, partition-batched decode via mapPartitions, fixed-dim
  * feature output. Swapping the stub body for a real codec changes no
  * plan shape.
  */
object Multimodal {

  /** One media row: opaque payload + kind tag. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata/features (fixed-dim embedding). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Synthesize a typed media table from the documents fixture: payload =
    * utf-8 text bytes, kind round-robins image/audio/video by id.
    * Deterministic — the oracle sees the same bytes via the text column. */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        typedLit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Expression-level metadata "decode" (oracle-able): byte length plus
    * STUB dimensions derived from the first payload bytes. A real image
    * header parse would replace the ascii() fakes; shapes stay identical. */
  def mediaMeta(media: DataFrame): DataFrame = {
    val txt = media("payload").cast("string")
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      (lit(16) + pmod(ascii(substring(txt, 1, 1)), lit(64))).as("width"),
      (lit(16) + pmod(ascii(substring(txt, 2, 1)), lit(64))).as("height"),
      when(col("kind") === "video",
        pmod(octet_length(col("payload")), lit(30)) + 1).otherwise(1).as("n_frames"))
  }

  /** Resize contract (map-side, no shuffle): clamps the stub decode dims
    * to a target box and carries the payload through — the seam where a
    * real scaler would re-encode. Emits the original and resized dims so
    * the transform is oracle-checkable as pure arithmetic. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    mediaMeta(media).select(
      col("media_id"), col("kind"),
      col("width"), col("height"),
      least(col("width"), lit(maxW)).as("resized_width"),
      least(col("height"), lit(maxH)).as("resized_height"))

  /** Frame sampling (video fan-out shape): one output row per sampled
    * frame index — 0, step, 2·step … below the stub frame count. The
    * frame payload is a STUB byte-slice of the container (a real codec
    * seeks/decodes instead); offsets and lengths are pure arithmetic so
    * the fan-out is oracle-checkable. This is the row-explosion shape a
    * video pipeline runs at scale: map-side `explode`, output rows ≈
    * frames/step × videos, no shuffle until a downstream aggregation. */
  def sampleFrames(media: DataFrame, step: Int, frameBytes: Int = 16): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        (pmod(octet_length(col("payload")), lit(30)) + 1).as("n_frames"))
      .select(col("media_id"), col("payload"), col("n_bytes"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx").cast("long") * frameBytes).as("frame_off"),
        greatest(lit(0L),
          least(lit(frameBytes.toLong),
            col("n_bytes") - col("frame_idx").cast("long") * frameBytes)).as("frame_len"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_payload"))

  /** STUB decode + feature extraction, batched per partition — the seam
    * where a real codec (libjpeg / ffmpeg / soundfile) would run. The
    * deterministic fake derives dims and a `dim`-element float feature
    * from payload bytes, mirroring mediaMeta for cross-checking. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition batch: a real implementation would init the codec
      // once here and decode the partition as one batch
      rows.map { r =>
        val b = r.payload
        def at(i: Int): Int = if (b.length > i) b(i) & 0xff else 0
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = b.length.toLong,
          width = 16 + (at(0) % 64),
          height = 16 + (at(1) % 64),
          n_frames = if (r.kind == "video") (b.length % 30) + 1 else 1,
          feature = Array.tabulate(dim)(i => at(i % math.max(b.length, 1)) / 255.0f))
      }
    }
  }
}
