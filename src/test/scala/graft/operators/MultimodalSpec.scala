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
