package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The audio and video persisted-index lifecycles — the pHash pattern
  * (write / append / bucketed probe / takedown reclaim / maintained
  * ingest) applied to the energy-profile audio fingerprint (banded,
  * hamming ≤ 6) and the exact video stream signature (remux-invariant
  * md5 key). Closes the "audio/video dedup is batch-only" gap: a crawl
  * probes new clips against history without recomputing the corpus
  * side. */
class AvIndexSpec extends SparkSpecBase {

  private def warehouse: String =
    new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath

  private def dropTables(names: String*): Unit =
    for (t <- names) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }

  test("audio index: twins gate in both regimes; append == rebuild over the union") {
    dropTables("ava_sig", "ava_keys", "avau_sig", "avau_keys", "ava_tomb", "avau_tomb")
    // base index over clips < 60; fold [60, 120) as a crawl; the union
    // rebuild is the ground truth the appended index must match
    Multimodal.writeAudioFpIndex(spark, sf, "ava", maxId = 60)
    Multimodal.appendAudioFpIndex(spark, "ava",
      Multimodal.assets(spark, sf, maxId = 120, onlyMime = Some("audio/wav"))
        .filter(_.asset_id >= 60))
    Multimodal.writeAudioFpIndex(spark, sf, "avau", maxId = 120)
    val twins = Multimodal.perturbedWavTwins(spark, sf, maxId = 120)
    def probe(prefix: String, bucketed: Boolean) = (if (bucketed)
        Multimodal.incrementalAudioFpDupsAgainstBucketedIndex(twins, prefix)
      else Multimodal.incrementalAudioFpDupsAgainstIndex(twins, prefix))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = probe("ava", bucketed = false)
    assert(got == probe("avau", bucketed = false),
      "appended-index probe must equal the union rebuild")
    assert(got == probe("ava", bucketed = true),
      "broadcast and bucketed regimes must emit identical verdicts")
    // every perturbed twin is caught against its base clip
    val twinIds = twins.collect().map(_.asset_id)
    assert(twinIds.nonEmpty)
    twinIds.foreach(t => assert(
      got.exists(v => v._1 == t && v._2 == t - Multimodal.AudioTwinIdOffset),
      s"twin $t not gated against its base"))
    dropTables("ava_sig", "ava_keys", "avau_sig", "avau_keys")
  }

  test("audio index: takedown drops exactly the victim's pairs; reclaim purges and clears") {
    import spark.implicits._
    dropTables("avt_sig", "avt_keys", "avt_tomb")
    Multimodal.writeAudioFpIndex(spark, sf, "avt", maxId = 120)
    val twins = Multimodal.perturbedWavTwins(spark, sf, maxId = 120)
    def probe() = Multimodal.incrementalAudioFpDupsAgainstIndex(twins, "avt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val baseline = probe()
    val victim = baseline.head._2
    // removing one clip removes exactly its pairs (banding is per-asset
    // independent) — the filtered expectation IS the rebuild
    val want = baseline.filterNot(_._2 == victim)
    graft.Takedown.add(spark, "avt", Seq(victim).toDF("id"))
    assert(probe() == want, "logical takedown must drop exactly the victim's pairs")
    Multimodal.reclaimAudioFpIndex(spark, "avt")
    assert(!graft.Takedown.pending(spark, "avt"))
    assert(spark.table("avt_keys").filter(col("asset_id") === victim).count() == 0L)
    assert(spark.table("avt_sig").filter(col("asset_id") === victim).count() == 0L)
    assert(probe() == want)
    dropTables("avt_sig", "avt_keys")
  }

  test("video index: remuxed twins gate by exact stream sig in both regimes; append == rebuild") {
    dropTables("avv_sig", "avvu_sig", "avv_tomb", "avvu_tomb")
    Multimodal.writeVideoSigIndex(spark, sf, "avv", maxId = 100)
    Multimodal.appendVideoSigIndex(spark, "avv",
      Multimodal.assets(spark, sf, maxId = 200, onlyMime = Some("video/mp4"))
        .filter(_.asset_id >= 100))
    Multimodal.writeVideoSigIndex(spark, sf, "avvu", maxId = 200)
    val twins = Multimodal.remuxedMp4Twins(spark, sf, maxId = 200)
    def probe(prefix: String, bucketed: Boolean) = (if (bucketed)
        Multimodal.incrementalVideoSigDupsAgainstBucketedIndex(twins, prefix)
      else Multimodal.incrementalVideoSigDupsAgainstIndex(twins, prefix))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = probe("avv", bucketed = false)
    assert(got == probe("avvu", bucketed = false),
      "appended-index probe must equal the union rebuild")
    assert(got == probe("avv", bucketed = true),
      "broadcast and bucketed regimes must emit identical verdicts")
    // every remux matches its source (streams identical, bytes not) —
    // and the payloads being byte-different is what makes this the
    // byte-level-dedup miss the stream signature exists to catch
    val twinIds = twins.collect().map(_.asset_id)
    assert(twinIds.nonEmpty)
    twinIds.foreach(t => assert(
      got.contains((t, t - Multimodal.VideoTwinIdOffset)),
      s"remuxed twin $t not matched to its source"))
    dropTables("avv_sig", "avvu_sig")
  }

  test("video index: takedown + reclaim — a removed source stops matching its remuxes") {
    import spark.implicits._
    dropTables("avvt_sig", "avvt_tomb")
    Multimodal.writeVideoSigIndex(spark, sf, "avvt", maxId = 200)
    val twins = Multimodal.remuxedMp4Twins(spark, sf, maxId = 200)
    def probe() = Multimodal.incrementalVideoSigDupsAgainstIndex(twins, "avvt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseline = probe()
    val victim = baseline.head._2
    val want = baseline.filterNot(_._2 == victim)
    graft.Takedown.add(spark, "avvt", Seq(victim).toDF("id"))
    assert(probe() == want)
    Multimodal.reclaimVideoSigIndex(spark, "avvt")
    assert(!graft.Takedown.pending(spark, "avvt"))
    assert(spark.table("avvt_sig").filter(col("asset_id") === victim).count() == 0L)
    assert(probe() == want)
    dropTables("avvt_sig")
  }

  test("maintained audio ingest: gate, fold keepers, audit-gated compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    dropTables("avm_sig", "avm_keys", "avm_tomb")
    Multimodal.writeAudioFpIndex(spark, sf, "avm", maxId = 120)
    val twins = Multimodal.perturbedWavTwins(spark, sf, maxId = 120).collect()
    val fresh1 = Multimodal.assets(spark, sf, maxId = 240, onlyMime = Some("audio/wav"))
      .collect().filter(_.asset_id >= 120)
    val fresh2 = Multimodal.assets(spark, sf, maxId = 360, onlyMime = Some("audio/wav"))
      .collect().filter(_.asset_id >= 240)
    assert(twins.nonEmpty && fresh1.nonEmpty && fresh2.nonEmpty)
    val in = MemoryStream[Multimodal.Asset]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val compactions = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val q = graft.streaming.Streams.audioIngestMaintained(in.toDS(), "avm", maxGroups = 1.5) {
      (verdicts, _, compacted) =>
        got.synchronized { got ++= verdicts.collect().map(r => (r.getLong(0), r.getLong(1))) }
        compactions.synchronized { compactions += compacted }
        ()
    }.start()
    try {
      for (b <- Seq(twins, fresh1, fresh2)) {
        in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    twins.foreach(t => assert(
      got.contains((t.asset_id, t.asset_id - Multimodal.AudioTwinIdOffset)),
      s"twin ${t.asset_id} not gated against its base"))
    assert(compactions.count(identity) >= 1,
      s"the audit must have fired a mid-stream compaction: $compactions")
    val audit = graft.Engine.bucketFileAudit(spark, "avm_keys", maxGroups = 1.5).head()
    assert(audit.getLong(3) <= 2, s"file hygiene not maintained: $audit")
    // keepers genuinely entered history: a twin of a folded clip hits
    val gated = got.map(_._1).toSet
    val folded = (fresh1 ++ fresh2).map(_.asset_id).filterNot(gated)
    assert(folded.nonEmpty, "at least some fresh clips should fold")
    val reprobe = Multimodal.incrementalAudioFpDupsAgainstIndex(
        Multimodal.perturbedWavTwins(spark, sf, maxId = 360), "avm")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(folded.forall(id => reprobe.contains((id + Multimodal.AudioTwinIdOffset, id))),
      "a twin of a folded clip must be reachable through the maintained index")
    dropTables("avm_sig", "avm_keys")
  }

  test("maintained video ingest: gate by stream sig, fold keepers, audit-gated compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    dropTables("avvm_sig", "avvm_tomb")
    Multimodal.writeVideoSigIndex(spark, sf, "avvm", maxId = 200)
    val twins = Multimodal.remuxedMp4Twins(spark, sf, maxId = 200).collect()
    val fresh1 = Multimodal.assets(spark, sf, maxId = 300, onlyMime = Some("video/mp4"))
      .collect().filter(_.asset_id >= 200)
    val fresh2 = Multimodal.assets(spark, sf, maxId = 400, onlyMime = Some("video/mp4"))
      .collect().filter(_.asset_id >= 300)
    assert(twins.nonEmpty && fresh1.nonEmpty && fresh2.nonEmpty)
    val in = MemoryStream[Multimodal.Asset]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val compactions = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val q = graft.streaming.Streams.videoIngestMaintained(in.toDS(), "avvm", maxGroups = 1.5) {
      (verdicts, _, compacted) =>
        got.synchronized { got ++= verdicts.collect().map(r => (r.getLong(0), r.getLong(1))) }
        compactions.synchronized { compactions += compacted }
        ()
    }.start()
    try {
      for (b <- Seq(twins, fresh1, fresh2)) {
        in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    twins.foreach(t => assert(
      got.contains((t.asset_id, t.asset_id - Multimodal.VideoTwinIdOffset)),
      s"remuxed twin ${t.asset_id} not gated against its source"))
    assert(compactions.count(identity) >= 1,
      s"the audit must have fired a mid-stream compaction: $compactions")
    val audit = graft.Engine.bucketFileAudit(spark, "avvm_sig", maxGroups = 1.5).head()
    assert(audit.getLong(3) <= 2, s"file hygiene not maintained: $audit")
    // keepers genuinely entered history: a remux of a folded video hits
    val gated = got.map(_._1).toSet
    val folded = (fresh1 ++ fresh2).map(_.asset_id).filterNot(gated)
    assert(folded.nonEmpty, "at least some fresh videos should fold")
    val reprobe = Multimodal.incrementalVideoSigDupsAgainstIndex(
        Multimodal.remuxedMp4Twins(spark, sf, maxId = 400), "avvm")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(folded.forall(id => reprobe.contains((id + Multimodal.VideoTwinIdOffset, id))),
      "a remux of a folded video must be reachable through the maintained index")
    dropTables("avvm_sig")
  }
}
