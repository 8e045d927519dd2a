package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Specs for the multimodal binary-column plumbing (extension tier). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha payload"), (1L, "beta payload"), (2L, "gamma payload"),
    (3L, "delta payload")).toDF("doc_id", "text")

  test("assets carry UTF-8 payloads with deterministic modality") {
    val assets = Multimodal.assetsFromDocuments(docs).collect().sortBy(_.asset_id)
    assert(assets.map(_.media_type).toSeq ==
      Seq("image", "audio", "video", "image"))
    assert(new String(assets(0).payload, "UTF-8") == "alpha payload")
  }

  test("stub decode is deterministic and derives features from payload bytes") {
    val feats = Multimodal.decodeFeatures(Multimodal.assetsFromDocuments(docs))
      .collect().sortBy(_.asset_id)
    assert(feats(0).n_bytes == "alpha payload".length)
    assert(feats(0).width >= 0 && feats(0).width < 1920)
    assert(feats(0).height >= 0 && feats(0).height < 1080)
    assert(feats(0).duration_ms >= 0 && feats(0).duration_ms < 600000)
    // md5 of the payload matches Spark's SQL md5 of the same text
    val sqlMd5 = docs.selectExpr("md5(text)").as[String].collect()
    assert(feats.map(_.payload_md5).toSet == sqlMd5.toSet)
    // determinism across runs
    val again = Multimodal.decodeFeatures(Multimodal.assetsFromDocuments(docs))
      .collect().sortBy(_.asset_id)
    assert(feats.map(_.width).toSeq == again.map(_.width).toSeq)
  }

  test("modality stats aggregate per media_type") {
    val stats = Multimodal.modalityStats(
      Multimodal.decodeFeatures(Multimodal.assetsFromDocuments(docs)))
      .collect().map(r => r.getAs[String]("media_type") -> r.getAs[Long]("n_assets"))
      .toMap
    assert(stats == Map("image" -> 2L, "audio" -> 1L, "video" -> 1L))
  }
}
