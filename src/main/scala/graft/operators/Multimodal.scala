package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the LLM-pipeline surface: media payloads
  * as opaque `binary` columns with typed metadata, decode/feature-extract
  * as per-partition batch operations.
  *
  * Decode reality has two tiers. Uncompressed Netpbm images (binary P5
  * grayscale / P6 RGB) are decoded FOR REAL — header parse, comments,
  * 1/2-byte samples by maxval, true width/height, pixel-derived features
  * — because Netpbm needs no codec library. Compressed formats (JPEG/
  * PNG/audio/video) would need libjpeg/ffmpeg-class natives this
  * container lacks, so they fall back to a deterministic byte-derived
  * fake. Either way the Spark-side contract is identical: schema, binary
  * payload column, partition-batched decode via mapPartitions, fixed-dim
  * feature output — swapping the fallback for a real codec changes no
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

  /** REAL pure-JVM decode for the Netpbm family — binary P5 (grayscale)
    * and P6 (RGB): magic check, whitespace/`#`-comment header parse,
    * width/height/maxval, 1-byte samples (or 2-byte MSB-first when
    * maxval > 255, per the Netpbm spec). Returns (width, height,
    * channels, maxval, sample accessor) or None for anything that is
    * not a well-formed binary Netpbm payload. */
  private[operators] def decodeNetpbm(
      b: Array[Byte]): Option[(Int, Int, Int, Int, Int => Double)] = {
    if (b.length < 2 || b(0) != 'P'.toByte || (b(1) != '5'.toByte && b(1) != '6'.toByte))
      return None
    val channels = if (b(1) == '6'.toByte) 3 else 1
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = (b(i) & 0xff).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n'.toByte) i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < b.length && b(i) >= '0'.toByte && b(i) <= '9'.toByte) {
        v = v * 10 + (b(i) - '0'.toByte)
        i += 1
        any = true
      }
      if (any) v else -1
    }
    val w = readInt()
    val h = readInt()
    val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 65535) return None
    i += 1 // exactly one whitespace byte between maxval and raster
    val bytesPerSample = if (maxv > 255) 2 else 1
    if (i.toLong + w.toLong * h * channels * bytesPerSample > b.length) return None
    val base = i
    val sample: Int => Double =
      if (bytesPerSample == 1) s => (b(base + s) & 0xff).toDouble
      else s => (((b(base + 2 * s) & 0xff) << 8) | (b(base + 2 * s + 1) & 0xff)).toDouble
    Some((w, h, channels, maxv, sample))
  }

  /** Decode + feature extraction, batched per partition. Netpbm payloads
    * decode for real: true dimensions, feature = maxval-normalized mean
    * luminance at `dim` evenly spaced pixels (row-major). Everything
    * else hits the deterministic byte-derived fallback — the seam where
    * a libjpeg/ffmpeg-class codec would run, initialized once per
    * partition batch. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition batch: a real implementation would init the codec
      // once here and decode the partition as one batch
      rows.map { r =>
        val b = r.payload
        decodeNetpbm(b) match {
          case Some((w, h, ch, maxv, sample)) =>
            val nPix = w * h
            val feature = Array.tabulate(dim) { i =>
              val p = ((i.toLong * nPix) / dim).toInt
              var s = 0.0
              var c = 0
              while (c < ch) { s += sample(p * ch + c); c += 1 }
              (s / (ch.toDouble * maxv)).toFloat
            }
            MediaFeatures(r.media_id, r.kind, b.length.toLong, w, h, 1, feature)
          case None =>
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
}
