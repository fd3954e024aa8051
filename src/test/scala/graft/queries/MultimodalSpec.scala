package graft.queries

import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase {

  test("asset synthesis: real media payloads, mime assignment") {
    val a = Multimodal.assets(spark, sf, maxId = 9).collect().sortBy(_.asset_id)
    assert(a.length == 9)
    assert(a.map(_.mime).toSeq == Seq(
      "image/png", "audio/wav", "video/mp4", "image/png", "audio/wav",
      "video/mp4", "image/png", "audio/wav", "video/mp4"))
    assert(a.forall(x => x.media.nonEmpty))
    // real container formats: PNG magic + RIFF/WAVE header
    a.filter(_.mime == "image/png").foreach { x =>
      assert((x.media(0) & 0xff) == 0x89 && x.media(1) == 'P' && x.media(2) == 'N' && x.media(3) == 'G')
    }
    a.filter(_.mime == "audio/wav").foreach { x =>
      assert(new String(x.media.take(4), "US-ASCII") == "RIFF")
      assert(new String(x.media.slice(8, 12), "US-ASCII") == "WAVE")
    }
  }

  test("decode: real ImageIO/AudioSystem round trip, fixture-pinned features") {
    val assets = Multimodal.assets(spark, sf, maxId = 50)
    val f1 = Multimodal.decode(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.decode(assets).collect().sortBy(_.asset_id)
    assert(f1.toSeq == f2.toSeq) // deterministic

    // asset 0: 8×8 grayscale PNG, pixel (7x+13y)%256 never wraps →
    // sum = 8·7·(0+…+7) + 8·13·(0+…+7) = 8·28·20 = 4480
    val a0 = f1.find(_.asset_id == 0L).get
    assert(a0.width.contains(8L) && a0.height.contains(8L))
    assert(a0.n_units == 64L && a0.feat_sum.contains(4480L))

    // asset 1: 51-sample WAV, sample (17+5i)%256 wraps for i ≥ 48 →
    // sum = 51·17 + 5·(50·51/2) − 3·256 = 6474
    val a1 = f1.find(_.asset_id == 1L).get
    assert(a1.width.isEmpty && a1.height.isEmpty)
    assert(a1.n_units == 51L && a1.feat_sum.contains(6474L))

    // every png decodes to its generator dims; wav to its sample count
    f1.filter(_.mime == "image/png").foreach { f =>
      val (w, h) = Multimodal.pngDims(f.asset_id)
      assert(f.width.contains(w.toLong) && f.height.contains(h.toLong))
      assert(f.n_units == w.toLong * h)
    }
    f1.filter(_.mime == "audio/wav").foreach { f =>
      assert(f.n_units == Multimodal.wavSamples(f.asset_id).toLong)
    }
    // mp4: real container metadata round-trips the Mp4 writer's closed
    // forms — tkhd dims, stts/stsz frame count, total sample bytes
    f1.filter(_.mime == "video/mp4").foreach { f =>
      val (w, h) = Mp4.dims(f.asset_id)
      assert(f.width.contains(w.toLong) && f.height.contains(h.toLong))
      assert(f.n_units == Mp4.frames(f.asset_id).toLong)
      val bytes = (0 until Mp4.frames(f.asset_id)).map(i => Mp4.sampleSize(f.asset_id, i).toLong).sum
      assert(f.feat_sum.contains(bytes))
    }
    // n_bytes always matches the stored payload
    val raw = assets.collect().map(a => a.asset_id -> a.media.length.toLong).toMap
    f1.foreach { f => assert(f.n_bytes == raw(f.asset_id)) }
  }

  test("audio windows: real PCM decode framed into 32-sample windows") {
    val assets = Multimodal.assets(spark, sf, maxId = 40, onlyMime = Some("audio/wav"))
    val wins = Multimodal.audioWindows(assets).collect()
      .groupBy(_.asset_id).view.mapValues(_.sortBy(_.win_no)).toMap
    assert(wins.nonEmpty)
    wins.foreach { case (id, ws) =>
      val n = Multimodal.wavSamples(id)
      // window count, per-window sizes, contiguous numbering
      assert(ws.length == (n + 31) / 32, s"asset $id window count")
      assert(ws.map(_.win_no).toSeq == ws.indices.map(_.toLong))
      assert(ws.map(_.n_samples).sum == n.toLong)
      ws.init.foreach(w => assert(w.n_samples == 32L))
      // energies recompute from the PCM generator's closed form
      ws.foreach { w =>
        val lo = (w.win_no * 32).toInt
        val expect = (lo until math.min(lo + 32, n))
          .map(i => Multimodal.wavSample(id, i).toLong).sum
        assert(w.energy == expect, s"asset $id window ${w.win_no}")
      }
    }
    // asset 1: 51 samples → windows of 32 and 19
    assert(wins(1L).map(_.n_samples).toSeq == Seq(32L, 19L))
  }

  test("image patches: decoded 8x8 grid tiles each image exactly") {
    val assets = Multimodal.assets(spark, sf, maxId = 40, onlyMime = Some("image/png"))
    val patches = Multimodal.imagePatches(assets).collect()
      .groupBy(_.asset_id).view.mapValues(_.toSeq).toMap
    assert(patches.nonEmpty)
    patches.foreach { case (id, ps) =>
      val (w, h) = Multimodal.pngDims(id)
      // grid shape and exact tiling: pixel counts sum to the image area
      assert(ps.length == ((w + 7) / 8) * ((h + 7) / 8), s"asset $id grid")
      assert(ps.map(_.n_pixels).sum == w.toLong * h, s"asset $id tiling")
      // interior patches are full 8×8
      ps.filter(p => (p.px + 1) * 8 <= w && (p.py + 1) * 8 <= h)
        .foreach(p => assert(p.n_pixels == 64L))
      // each patch sum recomputes from the pixel generator
      ps.foreach { p =>
        val expect = (for {
          x <- (p.px * 8).toInt until math.min((p.px * 8 + 8).toInt, w)
          y <- (p.py * 8).toInt until math.min((p.py * 8 + 8).toInt, h)
        } yield Multimodal.pngPixel(id, x, y).toLong).sum
        assert(p.pix_sum == expect, s"asset $id patch (${p.px},${p.py})")
      }
    }
  }

  test("mp4 fixture: box layout and parsed container metadata (asset 2)") {
    val b = Mp4.bytes(2L)

    def u32(at: Int): Long =
      ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
        ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
    def tpe(at: Int): String = new String(b, at + 4, 4, "US-ASCII")

    // top-level box walk by size header: exactly ftyp, moov, mdat
    var at = 0
    val layout = Seq.newBuilder[(String, Int)]
    while (at < b.length) {
      val size = u32(at).toInt
      layout += ((tpe(at), at))
      at += size
    }
    val boxes = layout.result()
    assert(boxes.map(_._1) == Seq("ftyp", "moov", "mdat"))
    assert(at == b.length) // sizes tile the file exactly

    // mdat payload = sum of stsz sample sizes; asset 2 → 5 frames of
    // sizes 15,18,21,24,27 (closed form (2*7+3i)%64+1) = 105 bytes
    val mdatAt = boxes(2)._2
    assert(u32(mdatAt).toInt - 8 == 105)
    assert((b(mdatAt + 8) & 0xff) == 2) // first media byte = (id+0)%256

    // parse() recovers the writer's closed forms: tkhd 18×18, 5 samples,
    // 105 sample bytes, 5 frames × 40 ms = 200 ms
    assert(Mp4.parse(b) == Mp4.Meta(18L, 18L, 5L, 105L, 200L))
    assert(Mp4.frames(2L) == 5 && Mp4.dims(2L) == ((18, 18)))

    // the per-frame size table reads the same stsz entries the writer
    // emitted (asset 2: 15,18,21,24,27)
    assert(Mp4.sampleSizes(b).toSeq == Seq(15L, 18L, 21L, 24L, 27L))
  }

  test("scene cuts: real stsz deltas, integer verdicts recomputed, both classes") {
    val rows = Multimodal.queries("x_mm_scene_cuts")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, g) =>
      val n = Mp4.frames(id).toLong
      val sizes = (0 until n.toInt).map(i => Mp4.sampleSize(id, i).toLong)
      val total = sizes.sum
      assert(g.length == n - 1, s"asset $id: one delta per adjacent pair")
      g.foreach { case (_, frames, fno, sz, delta, cut) =>
        assert(frames == n && sz == sizes(fno.toInt))
        val want = math.abs(sizes(fno.toInt) - sizes(fno.toInt - 1))
        assert(delta == want, s"asset $id frame $fno delta")
        assert(cut == (want * n > total), s"asset $id frame $fno verdict")
      }
    }
    assert(rows.map(_._6).toSet == Set(true, false), "both verdict classes")
  }

  test("phash dedup: every planted twin pairs within hamming 6; unrelated images mostly don't") {
    import org.apache.spark.sql.functions._
    val rows = Multimodal.queries("x_mm_phash_dups")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // completeness on the planted near-dups: every PNG id under the
    // query's maxId must pair with its +2-brightness twin
    val pngIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 0 && col("doc_id") < 120)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val twinPairs = rows.collect {
      case (da, db, _) if db == da + Multimodal.PhashTwinIdOffset => da
    }.toSet
    assert(twinPairs == pngIds,
      s"missing twins: ${pngIds -- twinPairs}, phantom: ${twinPairs -- pngIds}")
    // discrimination: near-dup pairs must be rare relative to the
    // C(2n,2) pair space — a hash that pairs everything is no hash
    val n = pngIds.size * 2
    assert(rows.length < n * (n - 1) / 20, s"${rows.length} pairs of ${n * (n - 1) / 2}")
    // signatures stay in the positive 63-bit range (no sign-bit bits)
    val sigs = Multimodal.phash(
      Multimodal.assets(spark, sf, maxId = 120, onlyMime = Some("image/png")))
      .collect().map(_.getLong(1))
    assert(sigs.forall(_ >= 0L), "63-bit signatures must be non-negative")
  }

  test("phash clusters: twins co-cluster under the min-id label; labels are total") {
    val labels = Multimodal.queries("x_mm_phash_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // totality: every asset (base + twin) is labeled
    val ids = labels.keySet
    assert(ids.count(_ < Multimodal.PhashTwinIdOffset) ==
      ids.count(_ >= Multimodal.PhashTwinIdOffset), "base/twin populations")
    // each planted twin shares its base image's cluster, and the min-id
    // convention makes that label the base id (or smaller on collision)
    ids.filter(_ < Multimodal.PhashTwinIdOffset).foreach { base =>
      val twin = base + Multimodal.PhashTwinIdOffset
      assert(labels(twin) == labels(base), s"twin of $base split from its base")
      assert(labels(base) <= base, "min-id label convention")
    }
    assert(labels.values.toSet.size > 1, "clusters must discriminate")
  }

  test("audio fingerprint dedup: every gain-nudged twin pairs; profile bits discriminate") {
    import org.apache.spark.sql.functions._
    val rows = Multimodal.queries("x_mm_audio_fp_dups")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wavIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 1 && col("doc_id") < 120)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val twinPairs = rows.collect {
      case (da, db, _) if db == da + Multimodal.AudioTwinIdOffset => da
    }.toSet
    assert(twinPairs == wavIds,
      s"missing twins: ${wavIds -- twinPairs}, phantom: ${twinPairs -- wavIds}")
    // the global-mean profile must discriminate: collisions rare in the
    // C(2n,2) pair space (the adjacent-delta variant failed this)
    val n = wavIds.size * 2
    assert(rows.length < n * (n - 1) / 20, s"${rows.length} pairs of ${n * (n - 1) / 2}")
    // driver recompute of one fingerprint from the raw closed-form PCM
    val id = wavIds.min
    val clip = (0 until (id % 100 + 50).toInt).map(i => (id * 17 + 5 * i) % 256)
    val nn = clip.length
    val sums = new Array[Long](64); val cnts = new Array[Long](64)
    clip.zipWithIndex.foreach { case (v, i) =>
      val w = i * 64 / nn; sums(w) += v; cnts(w) += 1 }
    var want = 0L
    (1 until 64).foreach { w =>
      if (sums(w) * nn > clip.map(_.toLong).sum * cnts(w)) want |= (1L << (w - 1)) }
    val got = Multimodal.audioFingerprint(
      Multimodal.assets(spark, sf, maxId = id + 1, onlyMime = Some("audio/wav")))
      .filter(col("asset_id") === id).head().getLong(1)
    assert(got == want, s"fingerprint of clip $id: $got vs driver $want")
  }

  test("video remux dedup: stream signatures group the rewrapped twins byte-hashing misses") {
    import org.apache.spark.sql.functions._
    val groups = Multimodal.queries("x_mm_video_remux_dups")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val vidIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 2 && col("doc_id") < 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(groups.length == vidIds.size, "one group per planted remux pair")
    assert(groups.forall(_._2 == 2L), "each group is exactly {src, remux}")
    assert(groups.map(_._3).toSet == vidIds, "keeper = the original id (min)")
    // the remux is a genuine byte-level miss: same stream signature,
    // different container bytes — the case this operator exists for
    val id = vidIds.min
    val a = graft.queries.Mp4.bytes(id)
    val b = graft.queries.Mp4.bytesRemuxed(id)
    assert(!java.util.Arrays.equals(a, b), "remux must differ at byte level")
    assert(graft.queries.Mp4.sampleSizes(a).toSeq == graft.queries.Mp4.sampleSizes(b).toSeq,
      "remux must preserve the stream's stsz table")
    assert(graft.queries.Mp4.parse(a).width == graft.queries.Mp4.parse(b).width)
  }

  test("image cluster lifecycle: index probe + appendClusterLabels == full perceptual rebuild") {
    import org.apache.spark.sql.functions._
    // the text pipeline's incremental cluster maintenance is
    // modality-agnostic: fold an image batch's discovered pairs (from
    // the persisted perceptual index) into existing labels and land on
    // exactly the full-rebuild clustering — pure operator composition,
    // no image-specific clustering code
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("lif_ph_sig", "lif_ph_keys")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    Multimodal.writePhashIndex(spark, sf, "lif_ph", maxId = 120)
    val baseSig = Multimodal.phash(
      Multimodal.assets(spark, sf, maxId = 120, onlyMime = Some("image/png")))
      .select(col("asset_id").as("doc_id"), col("ph").as("sh"))
    val basePairs = Dedup.simhashCandidatesOf(baseSig, pairBlocks = true)
      .filter(expr("bit_count(sa ^ sb)") <= 6).select("da", "db")
    val baseLabels = Dedup.starClusters(baseSig.select("doc_id"), basePairs)._1
    // the increment: twins probed against the FROZEN index (new↔history)
    // plus banding within the increment itself (new↔new)
    val twins = Multimodal.perturbedPngTwins(spark, sf, maxId = 120)
    val newOld = Multimodal.incrementalPhashDupsAgainstIndex(twins, "lif_ph")
      .select(col("new_id").as("da"), col("dup_id").as("db"))
    val twinSig = Multimodal.phash(twins)
      .select(col("asset_id").as("doc_id"), col("ph").as("sh"))
    val newNew = Dedup.simhashCandidatesOf(twinSig, pairBlocks = true)
      .filter(expr("bit_count(sa ^ sb)") <= 6).select("da", "db")
    val appended = Dedup.appendClusterLabels(baseLabels,
      twinSig.select("doc_id"), newOld.unionByName(newNew))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Multimodal.queries("x_mm_phash_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(appended == full, "incremental fold must equal the full perceptual rebuild")
  }

  test("phash index lifecycle: ingest probe finds the indexed originals; append leaves history untouched") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("phidx_sig", "phidx_keys")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    Multimodal.writePhashIndex(spark, sf, "phidx", maxId = 120)
    // ingest-time check: the perturbed twins arrive as a NEW batch and
    // must each match their indexed original within hamming 6
    val twins = Multimodal.perturbedPngTwins(spark, sf, maxId = 120)
    val hits = Multimodal.incrementalPhashDupsAgainstIndex(twins, "phidx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pngIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 0 && col("doc_id") < 120)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    pngIds.foreach { base =>
      assert(hits.exists(h => h._1 == base + Multimodal.PhashTwinIdOffset && h._2 == base),
        s"twin of $base not matched against the index")
    }
    assert(hits.forall(_._3 <= 6))
    // append the twins; existing files must be byte-untouched and a
    // re-probe of the ORIGINALS must now find the appended twins
    def keyFiles(): Set[String] =
      new java.io.File(warehouse, "phidx_keys").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = keyFiles()
    Multimodal.appendPhashIndex(spark, "phidx", twins)
    val after = keyFiles()
    assert(before.subsetOf(after), "append rewrote existing key files")
    assert(after.size > before.size, "append must add key files")
    val reprobe = Multimodal.incrementalPhashDupsAgainstIndex(
      Multimodal.assets(spark, sf, maxId = 120, onlyMime = Some("image/png")), "phidx")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pngIds.foreach { base =>
      assert(reprobe.contains((base, base + Multimodal.PhashTwinIdOffset)),
        s"appended twin of $base not reachable")
    }
  }

  test("index compaction: appended file groups collapse to one per bucket, verdicts unchanged") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("phcmp_sig", "phcmp_keys")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    Multimodal.writePhashIndex(spark, sf, "phcmp", maxId = 120)
    // two daily-crawl appends: the twins, then a fresh id range — each
    // adds its own file group per bucket
    Multimodal.appendPhashIndex(spark, "phcmp",
      Multimodal.perturbedPngTwins(spark, sf, maxId = 120))
    Multimodal.appendPhashIndex(spark, "phcmp",
      Multimodal.assets(spark, sf, maxId = 240, onlyMime = Some("image/png"))
        .filter(_.asset_id >= 120))
    def files(t: String): Int =
      Option(new java.io.File(warehouse, t).listFiles()).map(
        _.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    def bucketSpec(t: String) = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t)).bucketSpec.get
    val probe = Multimodal.assets(spark, sf, maxId = 120, onlyMime = Some("image/png"))
    def verdicts(): Seq[(Long, Long, Long)] =
      Multimodal.incrementalPhashDupsAgainstBucketedIndex(probe, "phcmp")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val before = verdicts()
    assert(before.nonEmpty)
    val (filesBefore, specBefore) = (files("phcmp_keys"), bucketSpec("phcmp_keys"))
    assert(filesBefore > specBefore.numBuckets,
      s"appends must have produced extra file groups (got $filesBefore)")
    // the audit that gates the rewrite: after two appends the per-bucket
    // group count exceeds a tight threshold; after compaction it doesn't
    def audit() = graft.Engine.bucketFileAudit(spark, "phcmp_keys", maxGroups = 1.5)
      .head()
    assert(audit().getBoolean(4), "audit must recommend compaction after appends")
    graft.Engine.compactBucketedTable(spark, "phcmp_keys")
    graft.Engine.compactBucketedTable(spark, "phcmp_sig")
    assert(!audit().getBoolean(4), "audit must clear after compaction")
    // same rows under the same bucketing — only the file count changed
    assert(bucketSpec("phcmp_keys") == specBefore, "bucket spec must survive compaction")
    assert(files("phcmp_keys") < filesBefore, "compaction must reduce the file count")
    assert(files("phcmp_keys") <= specBefore.numBuckets,
      "compacted layout is at most one file per bucket")
    assert(verdicts() == before, "compaction changed probe verdicts")
    for (t <- Seq("phcmp_sig", "phcmp_keys")) spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("phash bucketed-increment probe: verdicts equal the broadcast path in both regimes") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("phbkt_sig", "phbkt_keys")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    Multimodal.writePhashIndex(spark, sf, "phbkt", maxId = 120)
    val twins = Multimodal.perturbedPngTwins(spark, sf, maxId = 120)
    val viaBroadcast = Multimodal.incrementalPhashDupsAgainstIndex(twins, "phbkt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaBucketing = Multimodal.incrementalPhashDupsAgainstBucketedIndex(twins, "phbkt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // the regime choice is an EXECUTION decision only — the verdict set
    // (including every hamming distance) must be identical
    assert(viaBucketing == viaBroadcast,
      s"bucketed-increment verdicts diverge from the broadcast path")
    assert(viaBroadcast.nonEmpty, "gate corpus must produce matches (else vacuous)")
    for (t <- Seq("phbkt_sig", "phbkt_keys")) spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
