package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("mediaFromDocs: binary payloads, kind round-robins, bytes preserved") {
    val media = Multimodal.mediaFromDocs(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select($"kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    val r = media.where($"media_id" === 0).head()
    val txt = docs.where($"doc_id" === 0).head().getAs[String]("text")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == txt)
  }

  test("sampleFrames: only videos, stride-5 indices, payload slices line up") {
    val media = Multimodal.mediaFromDocs(docs)
    val frames = Multimodal.sampleFrames(media, step = 5).collect()
    val vids = media.where($"kind" === "video")
      .select($"media_id", $"payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(frames.nonEmpty)
    assert(frames.map(_.getAs[Long]("media_id")).toSet.subsetOf(vids.keySet))
    frames.foreach { f =>
      val idx = f.getAs[Long]("frame_idx")
      assert(idx % 5 == 0)
      val payload = vids(f.getAs[Long]("media_id"))
      val off = f.getAs[Long]("frame_off").toInt
      val len = f.getAs[Long]("frame_len").toInt
      assert(off == idx * 16)
      assert(len == math.max(0, math.min(16, payload.length - off)))
      val slice = f.getAs[Array[Byte]]("frame_payload")
      assert(slice.sameElements(payload.slice(off, off + 16)))
    }
    // every video emits ceil(n_frames/5) frames
    val byVid = frames.groupBy(_.getAs[Long]("media_id")).view.mapValues(_.length)
    vids.foreach { case (id, p) =>
      val nf = p.length % 30 + 1
      assert(byVid(id) == (nf + 4) / 5)
    }
  }

  test("resize clamps stub dims to the target box") {
    val r = Multimodal.resize(Multimodal.mediaFromDocs(docs), 32, 32).collect()
    r.foreach { row =>
      assert(row.getAs[Int]("resized_width") == math.min(row.getAs[Int]("width"), 32))
      assert(row.getAs[Int]("resized_height") == math.min(row.getAs[Int]("height"), 32))
    }
  }

  test("decodeFeatures: real Netpbm decode — P6 RGB with comment, P5 16-bit, malformed falls back") {
    // P6, 2×2 RGB, maxval 255, '#' comment in the header: pixels are
    // pure R, G, B, and white — luminances 85, 85, 85, 255 (/255)
    val p6 = ("P6\n# test comment\n2 2\n255\n").getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte,
        255.toByte, 255.toByte, 255.toByte)
    // P5, 2×1 grayscale, maxval 65535 (2-byte MSB-first samples):
    // values 0 and 65535 — features 0.0 and 1.0
    val p5 = "P5 2 1 65535 ".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0xff.toByte, 0xff.toByte)
    val junk = "P6 9999 9999 255 tiny".getBytes("US-ASCII") // raster too short
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "image", p6), MediaRow(2L, "image", p5), MediaRow(3L, "image", junk)))
    val out = Multimodal.decodeFeatures(ds, dim = 4).collect()
      .map(f => f.media_id -> f).toMap
    // real dims from the headers, not byte fakes
    assert(out(1L).width == 2 && out(1L).height == 2 && out(1L).n_frames == 1)
    val f1 = out(1L).feature
    assert(math.abs(f1(0) - 85f / 255f) < 1e-6 && math.abs(f1(3) - 1.0f) < 1e-6)
    assert(out(2L).width == 2 && out(2L).height == 1)
    val f2 = out(2L).feature // dim=4 over 2 pixels: samples at pixels 0,0,1,1
    assert(f2(0) == 0.0f && f2(1) == 0.0f && f2(2) == 1.0f && f2(3) == 1.0f)
    // malformed header → byte-derived fallback dims ('P' = 80 → 16 + 80%64 = 32)
    assert(out(3L).width == 16 + ('P'.toInt % 64))
  }

  test("decodeFeatures (mapPartitions stub) agrees with mediaMeta expressions") {
    val media = Multimodal.mediaFromDocs(docs)
    val viaExpr = Multimodal.mediaMeta(media)
      .select($"media_id", $"n_bytes", $"width", $"height", $"n_frames")
      .collect().map(r => r.getLong(0) -> r).toMap
    val viaStub = Multimodal.decodeFeatures(media.as[MediaRow], dim = 8).collect()
    assert(viaStub.length == docs.count())
    viaStub.foreach { f =>
      val e = viaExpr(f.media_id)
      assert(f.n_bytes == e.getAs[Long]("n_bytes"))
      assert(f.width == e.getAs[Int]("width"))
      assert(f.height == e.getAs[Int]("height"))
      assert(f.n_frames == e.getAs[Int]("n_frames"))
      assert(f.feature.length == 8)
      assert(f.feature.forall(v => v >= 0f && v <= 1f))
    }
  }
}
