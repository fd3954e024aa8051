package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** WordPiece family invariants: the likelihood-scored trainer and the
  * greedy longest-match server re-derived driver-side from raw word
  * counts (independent code path — no vocabulary chains, no SQL), plus
  * the real-WordPiece whole-word [UNK] semantics the gate corpus never
  * exercises. */
class WordpieceSpec extends SparkSpecBase {

  /** Driver-side reference: word counts → marked symbol lists. */
  private def wordCounts(): Map[String, Long] =
    graft.Engine.table(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def seed(w: String): Vector[String] =
    w.toVector.zipWithIndex.map { case (c, i) => if (i == 0) s"$c" else s"##$c" }

  /** Reference trainer: greedy likelihood argmax over explicit symbol
    * lists. Returns (merges, final per-word symbol lists). */
  private def refTrain(wc: Map[String, Long], steps: Int):
      (Seq[(String, String, Long, Long, Long, Double)], Map[String, Vector[String]]) = {
    var words: Map[String, Vector[String]] = wc.keys.map(w => w -> seed(w)).toMap
    val merges = Seq.newBuilder[(String, String, Long, Long, Long, Double)]
    for (_ <- 1 to steps) {
      val pairs = collection.mutable.Map[(String, String), Long]()
      val syms = collection.mutable.Map[String, Long]()
      for ((w, ss) <- words; nw = wc(w)) {
        ss.foreach(t => syms(t) = syms.getOrElse(t, 0L) + nw)
        ss.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); pairs(k) = pairs.getOrElse(k, 0L) + nw
        }
      }
      if (pairs.nonEmpty) {
        val ((a, b), cnt) = pairs.toSeq.minBy { case ((a, b), c) =>
          (-c.toDouble / (syms(a).toDouble * syms(b).toDouble), a, b)
        }
        val (ca, cb) = (syms(a), syms(b))
        merges += ((a, b, cnt, ca, cb, cnt.toDouble / (ca.toDouble * cb.toDouble)))
        val fused = a + b.stripPrefix("##")
        words = words.view.mapValues { ss =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) {
              out += fused; i += 2
            } else { out += ss(i); i += 1 }
          }
          out.result()
        }.toMap
      }
    }
    (merges.result(), words)
  }

  /** Reference greedy longest-match against an explicit vocab set. */
  private def refGreedy(w: String, vocab: Set[String]): Vector[String] = {
    val toks = Vector.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      val marked = (l: Int) =>
        if (pos == 0) w.substring(pos, pos + l)
        else "##" + w.substring(pos, pos + l)
      val best = (math.min(Wordpiece.MaxPieceLen, w.length - pos) to 1 by -1)
        .find(l => vocab(marked(l)))
      best match {
        case Some(l) => toks += marked(l); pos += l
        case None => return Vector("[UNK]")
      }
    }
    toks.result()
  }

  test("trainer: merges, counts and likelihood scores match the driver recompute") {
    val out = Wordpiece.queries("x_text_wordpiece_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val (ref, _) = refTrain(wordCounts(), Wordpiece.Steps)
    assert(out.length == ref.length)
    out.zip(ref).zipWithIndex.foreach { case (((st, a, b, cnt, ca, cb, sc),
        (ra, rb, rc, rca, rcb, rsc)), i) =>
      assert(st == i + 1L)
      assert((a, b, cnt, ca, cb) == (ra, rb, rc, rca, rcb), s"merge ${i + 1} diverges")
      assert(sc == rsc, s"merge ${i + 1} score diverges")
    }
    // the family is genuinely marked: every merge RHS is a continuation
    assert(out.forall(_._3.startsWith("##")), "a merge RHS lost its ## marking")
  }

  test("serving: greedy longest-match ids match the driver recompute per doc") {
    val outMap = Wordpiece.queries("x_text_wordpiece_ids")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val wc = wordCounts()
    val (_, finalWords) = refTrain(wc, Wordpiece.Steps)
    // vocab + frequency-ordered ids from the reference training
    val counts = collection.mutable.Map[String, Long]()
    for ((w, ss) <- finalWords; n = wc(w); t <- ss)
      counts(t) = counts.getOrElse(t, 0L) + n
    val ids = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> i.toLong }.toMap
    val vocab = counts.keySet.toSet
    val docs = graft.Engine.table(spark, sf, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(outMap.size == docs.length)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toVector.flatMap(w => refGreedy(w, vocab))
      val expIds = toks.map(t => ids.getOrElse(t, -1L))
      val (n, s) = outMap(id)
      assert(n == expIds.length && s == expIds.mkString(" "), s"doc $id ids diverge")
    }
    // greedy must actually fuse something: some doc uses a merged piece
    val mergedIds = ids.filter(_._1.stripPrefix("##").length > 1).values.toSet
    assert(docs.exists { case (id, _) =>
      outMap(id)._2.split(" ").exists(t => mergedIds(t.toLong)) },
      "vacuous: no document ever uses a merged piece")
  }

  test("deep training: checkpoint cadence changes no merge (depth 40)") {
    import spark.implicits._
    // structured synthetic vocab with enough pair mass for 40 merges
    val words = (for (a <- 'a' to 'f'; b <- 'a' to 'f'; c <- 'a' to 'f')
      yield s"$a$b$c$a$b").zipWithIndex
      .map { case (w, i) => (w, (i % 7 + 1).toLong) }
    val v0 = Wordpiece.wpVocabOf(words.toDF("w", "n")).persist()
    try {
      val plain = Wordpiece.wpMerges(v0, 40, checkpointEvery = Int.MaxValue)
      val ckpt = Wordpiece.wpMerges(v0, 40, checkpointEvery = 8)
      assert(plain.length == 40, s"corpus exhausted early: ${plain.length}")
      assert(ckpt == plain, "lineage checkpointing altered the merge sequence")
    } finally { v0.unpersist(blocking = false); () }
  }

  test("unk semantics: an unmatchable position fails the WHOLE word, not the symbol") {
    import spark.implicits._
    val model = Wordpiece.wordpieceFit(spark, sf)
    val tokens = model.collect().map(_.getString(0)).toSet
    // 'q' never appears in the corpus vocabulary in any marking
    assert(!tokens.contains("q") && !tokens.contains("##q"), "fixture drifted: q exists")
    val crafted = Seq((1L, "table q tableq qtable")).toDF("doc_id", "text")
    val out = Wordpiece.tokenizeOf(crafted, model).collect().head
    val ids = out.getString(2).split(" ").map(_.toLong)
    // 'table' segments cleanly (no -1); each q-word collapses to ONE -1
    val idOf = model.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val tableIds = refGreedy("table", tokens).map(idOf)
    assert(ids.take(tableIds.length).toSeq == tableIds.toSeq)
    assert(ids.count(_ == -1L) == 3, s"each unseen-char word must be one [UNK]: ${ids.toSeq}")
    assert(out.getLong(1) == tableIds.length + 3L)
  }
}
