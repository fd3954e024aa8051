package graft

/** Scratch diagnosis probe for the phash_index_build superlinear tail
  * (SCALE_r15/r16): times the build's stages separately at one scale
  * dir so the bend can be attributed — encode-only (pngBytes), encode+
  * decode+DCT (phash), and the full two-table write. Run:
  * `java -cp ... graft.PhashProbe /tmp/graft_scale/x64` */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val s = Engine.session()
    val d = args.headOption.getOrElse("/tmp/graft_scale/x64")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.Encoders
    val mm = graft.queries.Multimodal
    t("warm") { s.read.parquet(s"$d/documents.parquet").count() }
    t("encode_only") {
      mm.assets(s, d, onlyMime = Some("image/png"))
        .map(a => a.media.length.toLong)(Encoders.scalaLong)
        .reduce(_ + _)
    }
    t("phash_count") {
      mm.phash(mm.assets(s, d, onlyMime = Some("image/png"))).count()
    }
    t("full_write") { mm.writePhashIndex(s, d, "probe_ph") }
    s.stop()
  }
}
