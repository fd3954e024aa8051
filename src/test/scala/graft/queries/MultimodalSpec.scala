package graft.queries

import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase {

  test("asset synthesis: media bytes round-trip, mime assignment") {
    val a = Multimodal.assets(spark, sf).filter(_.asset_id < 9).collect().sortBy(_.asset_id)
    assert(a.length == 9)
    assert(a.map(_.mime).toSeq == Seq(
      "image/png", "audio/wav", "video/mp4", "image/png", "audio/wav",
      "video/mp4", "image/png", "audio/wav", "video/mp4"))
    assert(a.forall(x => x.media.nonEmpty))
  }

  test("decode stub: deterministic features, byte counts match media") {
    val assets = Multimodal.assets(spark, sf).filter(_.asset_id < 50)
    val f1 = Multimodal.decodeStub(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.decodeStub(assets).collect().sortBy(_.asset_id)
    assert(f1.toSeq == f2.toSeq) // deterministic
    val raw = assets.collect().map(a => a.asset_id -> a.media.length.toLong).toMap
    f1.foreach { f => assert(f.n_bytes == raw(f.asset_id)) }
    f1.filter(_.mime.startsWith("video")).foreach(f => assert(f.frames >= 1 && f.frames <= 30))
    f1.filterNot(_.mime.startsWith("video")).foreach(f => assert(f.frames == 1))
    assert(f1.forall(_.head_hex.length == 16))
  }
}
