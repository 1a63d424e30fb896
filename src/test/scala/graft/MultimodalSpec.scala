package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing specs: binary payload schema, partition-wise batch
  * kernels, 1→N frame sampling. Codec bodies are stubs (marked in
  * [[Multimodal]]); the shapes and determinism are the contract.
  */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asMediaTable(
    Tables.documents(spark, sf0001).limit(50), "doc_id", "text", kind = "image")

  test("asMediaTable: binary payload column with typed metadata") {
    val m = media
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.count() === 50)
  }

  test("extractFeatures: deterministic per-partition batch kernel") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 50)
    assert(f1.map(_.checksum).toSeq === f2.map(_.checksum).toSeq)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("resizeAll: shape-preserving payload transform") {
    val r = Multimodal.resizeAll(media, 16, 16).collect()
    assert(r.forall(_.payload.length === 256))
    assert(r.forall(x => x.width === 16 && x.height === 16))
  }

  test("sampleFrames: 1->N expansion with aligned offsets") {
    val frames = Multimodal.sampleFrames(media.limit(5), stride = 64, frameLen = 32).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(f => f.offset % 64 === 0 && f.frame.length <= 32))
    // frame count per media = ceil(len/stride)
    val byId = frames.groupBy(_.media_id)
    val lens = Multimodal.extractFeatures(media.limit(5)).collect()
      .map(f => f.media_id -> f.n_bytes).toMap
    byId.foreach { case (id, fs) =>
      assert(fs.length === math.ceil(lens(id).toDouble / 64).toInt)
    }
  }
}
