package graft.queries

import java.nio.ByteBuffer

/** Minimal ISO BMFF (MP4) container writer + parser — pure JVM, box level.
  *
  * The JDK ships no MP4 video codec, so pixel decode is out of scope; the
  * CONTAINER format (ISO/IEC 14496-12) is public and fully parseable:
  * `moov → trak → {tkhd, mdia → {mdhd, minf → stbl}}` with the sample
  * tables `stts` (durations), `stsz` (per-sample byte sizes) and `stco`
  * (chunk offsets). Frame count, track dimensions, duration and sample
  * byte totals are REAL container metadata read back from those tables,
  * not fakes — the same metadata ffprobe reports without touching a
  * decoder.
  *
  * [[bytes]] writes a deterministic one-video-track MP4 (real ftyp/moov/
  * mdat layout, correct box sizes, stco pointing into mdat) whose sample
  * table content is an arithmetic function of the asset id, so the decoded
  * features have an exact closed-form oracle — the same design as
  * `Multimodal.pngBytes` / `wavBytes`. [[parse]] is a general reader: it
  * walks boxes by size header (including 64-bit `largesize`), tolerates
  * unknown siblings, handles tkhd/mdhd version 0 and 1, and cross-checks
  * stts against stsz (fail-fast on inconsistent tables).
  */
object Mp4 {

  /** Frames in asset `id`'s video: 3..30. */
  def frames(id: Long): Int = ((id % 28) + 3).toInt

  /** Track dimensions for asset `id` (tkhd 16.16 fixed-point, integral). */
  def dims(id: Long): (Int, Int) = (((id % 320) + 16).toInt, ((id % 240) + 16).toInt)

  /** Size in bytes of sample `i` of asset `id`: 1..64. */
  def sampleSize(id: Long, i: Int): Int = (((id * 7 + 3L * i) % 64) + 1).toInt

  /** Movie/media timescale (ticks per second). */
  val Timescale = 1000

  /** Per-sample duration in timescale ticks (25 fps at timescale 1000). */
  val SampleDelta = 40

  /** Container metadata recovered by [[parse]]. */
  final case class Meta(width: Long, height: Long, nSamples: Long,
      sampleBytes: Long, durationMs: Long)

  // ---- writer ----------------------------------------------------------

  private def be(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(n).array()

  private def be16(n: Int): Array[Byte] =
    ByteBuffer.allocate(2).putShort(n.toShort).array()

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val size = 8 + payload.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(size).put(tpe.getBytes("US-ASCII"))
    payload.foreach(bb.put)
    bb.array()
  }

  private def fullBox(tpe: String, version: Int, flags: Int, payload: Array[Byte]*): Array[Byte] =
    box(tpe, (Array((version << 24) | flags).flatMap(be) +: payload): _*)

  private val identityMatrix: Array[Byte] =
    Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).flatMap(be)

  /** A real, deterministic one-video-track MP4 for asset `id`. */
  def bytes(id: Long): Array[Byte] = bytesPadded(id, freePad = 0)

  /** The REMUXED form of asset `id`'s MP4: identical streams (same
    * stsd/stts/stsc/stsz tables, same mdat payload) repackaged with a
    * `free` box between ftyp and moov — what a passthrough
    * `ffmpeg -c copy` style rewrap produces. Byte-level hashing sees a
    * different file; stream-level identity holds, which is exactly what
    * the container-invariant dedup operator detects. */
  def bytesRemuxed(id: Long): Array[Byte] = bytesPadded(id, freePad = 64)

  private def bytesPadded(id: Long, freePad: Int): Array[Byte] = {
    val n = frames(id)
    val (w, h) = dims(id)
    val duration = n * SampleDelta
    val sizes = Array.tabulate(n)(i => sampleSize(id, i))

    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII"), be(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))

    val mvhd = fullBox("mvhd", 0, 0,
      be(0), be(0), be(Timescale), be(duration),          // created, modified, timescale, duration
      be(0x00010000), be16(0x0100), be16(0),              // rate 1.0, volume 1.0, reserved
      be(0), be(0), identityMatrix,                       // reserved ×2, matrix
      Array.fill(6)(be(0)).flatten, be(2))                // pre_defined ×6, next_track_ID

    val tkhd = fullBox("tkhd", 0, 0x7,                    // enabled | in_movie | in_preview
      be(0), be(0), be(1), be(0), be(duration),           // created, modified, track_ID, reserved, duration
      be(0), be(0), be16(0), be16(0), be16(0), be16(0),   // reserved ×2, layer, alt_group, volume, reserved
      identityMatrix, be(w << 16), be(h << 16))           // matrix, width/height 16.16

    val mdhd = fullBox("mdhd", 0, 0,
      be(0), be(0), be(Timescale), be(duration),
      be16(0x55c4), be16(0))                              // language 'und', pre_defined

    val hdlr = fullBox("hdlr", 0, 0,
      be(0), "vide".getBytes("US-ASCII"),
      be(0), be(0), be(0), Array[Byte](0))                // reserved ×3, empty name

    val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))

    val dinf = box("dinf",
      fullBox("dref", 0, 0, be(1), fullBox("url ", 0, 1))) // 1 entry, self-contained

    // Minimal 86-byte visual sample entry ('mp4v' shell, no codec config —
    // parsers read dims from tkhd; this box only needs to be well-formed).
    val sampleEntry = box("mp4v",
      Array.fill[Byte](6)(0), be16(1),                    // reserved, data_reference_index
      be16(0), be16(0), be(0), be(0), be(0),              // pre_defined/reserved block
      be16(w), be16(h),
      be(0x00480000), be(0x00480000), be(0),              // 72 dpi ×2, reserved
      be16(1), Array.fill[Byte](32)(0),                   // frame_count, compressorname
      be16(0x18), be16(0xffff))                           // depth 24, pre_defined -1

    val stsd = fullBox("stsd", 0, 0, be(1), sampleEntry)
    val stts = fullBox("stts", 0, 0, be(1), be(n), be(SampleDelta))
    val stsc = fullBox("stsc", 0, 0, be(1), be(1), be(n), be(1))
    val stsz = fullBox("stsz", 0, 0, be(0), be(n), sizes.flatMap(be))

    def moovOf(mdatPayloadAt: Int): Array[Byte] = {
      val stco = fullBox("stco", 0, 0, be(1), be(mdatPayloadAt))
      box("moov", mvhd,
        box("trak", tkhd,
          box("mdia", mdhd, hdlr,
            box("minf", vmhd, dinf,
              box("stbl", stsd, stts, stsc, stsz, stco)))))
    }

    // stco stores an absolute file offset; moov's length doesn't depend on
    // the offset VALUE (fixed 4-byte field), so probe once then rebuild.
    val free = if (freePad > 0) box("free", new Array[Byte](freePad)) else Array.emptyByteArray
    val moovLen = moovOf(0).length
    val moov = moovOf(ftyp.length + free.length + moovLen + 8)
    val media = new Array[Byte](sizes.sum)
    var j = 0
    while (j < media.length) { media(j) = ((id + j) % 256).toByte; j += 1 }
    ftyp ++ free ++ moov ++ box("mdat", media)
  }

  // ---- parser ----------------------------------------------------------

  private def u32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  private def u64(b: Array[Byte], at: Int): Long =
    (u32(b, at) << 32) | u32(b, at + 4)

  private def typeAt(b: Array[Byte], at: Int): String =
    new String(b, at, 4, "US-ASCII")

  /** (boxType, payloadStart, payloadEnd) for each child box in [from, to). */
  private def children(b: Array[Byte], from: Int, to: Int): List[(String, Int, Int)] = {
    var at = from
    val out = List.newBuilder[(String, Int, Int)]
    while (at + 8 <= to) {
      val size32 = u32(b, at)
      val tpe = typeAt(b, at + 4)
      val (payloadStart, end) =
        if (size32 == 1L && at + 16 <= to) (at + 16, at + u64(b, at + 8))
        else if (size32 == 0L) (at + 8, to.toLong) // box extends to end
        else (at + 8, at + size32)
      require(end >= payloadStart && end <= to, s"malformed box $tpe at $at (end=$end)")
      out += ((tpe, payloadStart, end.toInt))
      at = end.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], boxes: List[(String, Int, Int)], tpe: String): (Int, Int) =
    boxes.collectFirst { case (`tpe`, s, e) => (s, e) }
      .getOrElse(throw new IllegalArgumentException(s"no $tpe box"))

  /** Read real container metadata back out of an MP4's box tree. */
  /** The REAL per-frame size table: walk to stbl and read each stsz
    * entry (or expand the fixed-size form) — what a bitrate/scene-cut
    * analyzer consumes. Same fail-fast box-bound contract as [[parse]]. */
  def sampleSizes(b: Array[Byte]): Array[Long] = {
    val top = children(b, 0, b.length)
    require(top.headOption.exists(_._1 == "ftyp"), "not an MP4: no leading ftyp")
    val (moovS, moovE) = child(b, top, "moov")
    val (trakS, trakE) = child(b, children(b, moovS, moovE), "trak")
    val trak = children(b, trakS, trakE)
    val (mdiaS, mdiaE) = child(b, trak, "mdia")
    val (minfS, minfE) = child(b, children(b, mdiaS, mdiaE), "minf")
    val (stblS, stblE) = child(b, children(b, minfS, minfE), "stbl")
    val (stszS, stszE) = child(b, children(b, stblS, stblE), "stsz")
    val fixedSize = u32(b, stszS + 4)
    val nSamples = u32(b, stszS + 8)
    // Bound BOTH branches against the container: a malformed fixed-size stsz
    // declaring sample_count near 2^31 must not allocate a multi-GB array.
    // A real frame is ≥1 byte, so sample_count can never exceed file length.
    require(nSamples <= b.length,
      s"stsz declares $nSamples samples in a ${b.length}-byte container")
    if (fixedSize != 0L) Array.fill(nSamples.toInt)(fixedSize)
    else {
      require(stszS + 12L + nSamples * 4L <= stszE,
        s"stsz declares $nSamples samples beyond its box end")
      Array.tabulate(nSamples.toInt)(k => u32(b, stszS + 12 + k * 4))
    }
  }

  def parse(b: Array[Byte]): Meta = {
    val top = children(b, 0, b.length)
    require(top.headOption.exists(_._1 == "ftyp"), "not an MP4: no leading ftyp")
    val (moovS, moovE) = child(b, top, "moov")
    val moov = children(b, moovS, moovE)
    val (trakS, trakE) = child(b, moov, "trak")
    val trak = children(b, trakS, trakE)

    val (tkhdS, _) = child(b, trak, "tkhd")
    val tkhdV = b(tkhdS) & 0xff
    val whAt = tkhdS + 4 + (if (tkhdV == 1) 32 else 20) + 16 + 36
    val width = u32(b, whAt) >> 16
    val height = u32(b, whAt + 4) >> 16

    val (mdiaS, mdiaE) = child(b, trak, "mdia")
    val mdia = children(b, mdiaS, mdiaE)
    val (mdhdS, _) = child(b, mdia, "mdhd")
    val mdhdV = b(mdhdS) & 0xff
    val (timescale, duration) =
      if (mdhdV == 1) (u32(b, mdhdS + 20), u64(b, mdhdS + 24))
      else (u32(b, mdhdS + 12), u32(b, mdhdS + 16))
    require(timescale > 0, "mdhd timescale must be positive")

    val (minfS, minfE) = child(b, mdia, "minf")
    val (stblS, stblE) = child(b, children(b, minfS, minfE), "stbl")
    val stbl = children(b, stblS, stblE)

    val (sttsS, sttsE) = child(b, stbl, "stts")
    val sttsEntries = u32(b, sttsS + 4)
    // declared entry counts must fit their box: a malformed table would
    // otherwise walk into sibling boxes (silently wrong sums) or off the
    // buffer (raw AIOOBE instead of the fail-fast contract)
    require(sttsS + 8L + sttsEntries * 8L <= sttsE,
      s"stts declares $sttsEntries entries beyond its box end")
    var sttsCount = 0L
    var i = 0
    while (i < sttsEntries) {
      sttsCount += u32(b, sttsS + 8 + i * 8)
      i += 1
    }

    val (stszS, stszE) = child(b, stbl, "stsz")
    val fixedSize = u32(b, stszS + 4)
    val nSamples = u32(b, stszS + 8)
    val sampleBytes =
      if (fixedSize != 0L) {
        // two u32s can multiply past Long.MaxValue — fail fast instead of
        // publishing a wrapped-negative byte total
        require(nSamples <= Long.MaxValue / fixedSize,
          s"stsz fixed-size total overflows: $fixedSize * $nSamples")
        fixedSize * nSamples
      } else {
        require(stszS + 12L + nSamples * 4L <= stszE,
          s"stsz declares $nSamples samples beyond its box end")
        var sum = 0L
        var k = 0
        while (k < nSamples) { sum += u32(b, stszS + 12 + k * 4); k += 1 }
        sum
      }
    require(sttsCount == nSamples,
      s"inconsistent sample tables: stts=$sttsCount stsz=$nSamples")

    Meta(width, height, nSamples, sampleBytes, duration * 1000L / timescale)
  }
}
