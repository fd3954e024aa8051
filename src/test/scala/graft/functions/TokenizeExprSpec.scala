package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Native tokenizer-expression invariants that the corpus gates can't
  * exercise: the rank-heap BPE serving algorithm pinned against the
  * direct merge-chain replay (property-wise, including adversarial
  * overlap chains), and codepoint indexing — supplementary-plane
  * characters must tokenize as whole symbols under all three families,
  * never as unpaired surrogate halves (the gate corpus is pure ASCII,
  * so only these specs see that path). */
class TokenizeExprSpec extends SparkSpecBase {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  private def heap(w: String, merges: Seq[(String, String)]): Seq[String] = {
    val a = cps(w)
    BpeTokenize.heapWord(a, 0, a.length, BpeTokenize.rankMapOf(merges)).toSeq
  }
  private def replay(w: String, merges: Seq[(String, String)]): Seq[String] = {
    val a = cps(w)
    BpeTokenize.replayWord(a, 0, a.length, merges).toSeq
  }

  test("bpe: rank-heap equals chain replay on adversarial overlap chains") {
    val cases = Seq(
      ("aaa", Seq("a" -> "a")),
      ("aaaa", Seq("a" -> "a")),
      ("aaaaa", Seq("a" -> "a", "aa" -> "a")),
      ("aaaaaaaa", Seq("a" -> "a", "aa" -> "aa", "aaaa" -> "aaaa")),
      ("abab", Seq("b" -> "a", "a" -> "b")),
      ("abab", Seq("a" -> "b", "b" -> "a")),
      ("abcabc", Seq("a" -> "b", "ab" -> "c", "abc" -> "abc")),
      ("bbb", Seq("a" -> "a")),
      ("", Seq("a" -> "a")),
      ("a", Seq("a" -> "a")),
      // duplicate pair later in the list can never re-apply
      ("aaaa", Seq("a" -> "a", "a" -> "a")))
    for ((w, m) <- cases)
      assert(heap(w, m) == replay(w, m), s"word=$w merges=$m")
  }

  test("bpe: rank-heap equals chain replay property-wise (seeded random chains)") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 20) {
      val alphabet =
        if (round % 4 == 0) Vector("a", "b", "😀", "😁")
        else Vector("a", "b", "c")
      // realistic chain: later merges may consume earlier fusions
      var symbols = alphabet
      val merges = Vector.newBuilder[(String, String)]
      for (_ <- 1 to 64) {
        val a = symbols(rnd.nextInt(symbols.length))
        val b = symbols(rnd.nextInt(symbols.length))
        merges += (a -> b)
        symbols = symbols :+ (a + b)
      }
      val chain = merges.result()
      for (_ <- 1 to 200) {
        val w = Vector.fill(rnd.nextInt(13))(alphabet(rnd.nextInt(alphabet.length))).mkString
        assert(heap(w, chain) == replay(w, chain),
          s"round=$round word=$w")
      }
    }
  }

  test("bpe expression: supplementary-plane symbols stay whole codepoints") {
    import spark.implicits._
    val docs = Seq((1L, "😀😀a b😀")).toDF("doc_id", "text")
    val merges = Seq("😀" -> "😀")
    val ids = Map("😀😀" -> 0L, "a" -> 1L, "b" -> 2L, "😀" -> 3L)
    val out = docs.select(BpeTokenize.of(col("text"), merges, ids).as("ids"))
      .head().getSeq[Long](0)
    // word1 "😀😀a": merge fuses the emoji pair → [😀😀, a]; word2 "b😀" → [b, 😀]
    assert(out == Seq(0L, 1L, 2L, 3L))
  }

  test("wordpiece expression: supplementary-plane greedy match, maxPieceLen in codepoints") {
    import spark.implicits._
    val docs = Seq((1L, "😀😀a xa")).toDF("doc_id", "text")
    // vocab: word-initial 😀😀 (two codepoints — only reachable when the
    // probe length counts codepoints, not the four UTF-16 units), and
    // continuation ##a; 'x' unmatchable → whole-word [UNK]
    val vocab = Map("😀😀" -> 0L, "##a" -> 1L, "a" -> 2L)
    val out = docs.select(WordpieceTokenize.of(col("text"), vocab, 2).as("ids"))
      .head().getSeq[Long](0)
    assert(out == Seq(0L, 1L, -1L))
  }

  test("unigram expression: supplementary-plane pieces and the -1 unk fallback") {
    import spark.implicits._
    val docs = Seq((1L, "😀a Z")).toDF("doc_id", "text")
    // model: the two-codepoint word segments as one piece (lp -1.0 beats
    // the -1.2-1.2 single-char split); Z is outside the vocab → the DP's
    // saturated fallback tiles it to a single char → id -1
    val model = Map(
      "😀a" -> (-1.0, 0L),
      "😀" -> (-1.2, 1L),
      "a" -> (-1.2, 2L))
    val out = docs.select(UnigramTokenize.of(col("text"), model, 4).as("ids"))
      .head().getSeq[Long](0)
    assert(out == Seq(0L, -1L))
  }

  test("construction guards fail loud: duplicate BPE merge pairs, non-positive maxPieceLen") {
    // a duplicate trained pair would be silently re-ranked by the heap
    // while the replay oracle applies it in place (ADVICE r17) — reject
    // at plan construction, like the '<'/'>' delimiter assert
    val dup = intercept[IllegalArgumentException] {
      BpeTokenize.of(col("text"), Seq("a" -> "b", "c" -> "d", "a" -> "b"), Map.empty)
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    // maxPieceLen < 1 would spin the unigram walk-back forever on an
    // executor (bls stays 0) — fail at construction instead
    val bad = intercept[IllegalArgumentException] {
      UnigramTokenize.of(col("text"), Map("a" -> (-1.0, 0L)), 0)
    }
    assert(bad.getMessage.contains("maxPieceLen"), bad.getMessage)
  }

}
