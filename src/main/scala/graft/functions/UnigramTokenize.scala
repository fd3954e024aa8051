package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document unigram-LM tokenization as ONE native expression:
  * text → array of piece ids under a FROZEN trained model — the
  * [[WordpieceTokenize]] treatment applied to the third tokenizer
  * family, replacing the distinct-word join-gather serving plan (the
  * shape class measured at 16-18 GB of spill / OOM at 256× on the
  * tokenize_serve ScaleBench row; the expression form is a
  * ZERO-SHUFFLE narrow map with O(1) model lookups).
  *
  * Semantics are bit-identical to the relational Viterbi the trainer
  * uses and the DuckDB oracle replays (graft.queries.Unigram.segment):
  * per word, dp[p] = greatest over piece lengths l = 1..maxPieceLen of
  * (dp[p−l] + lp(piece ending at p), or −1.0e18 when out of range or
  * out of vocab); the chosen length at p is the FIRST l ascending
  * whose candidate equals dp[p] exactly (ties to the SHORTEST piece —
  * safe exact-double comparison because the winner is compared against
  * its own value, and every candidate here is the same fixed-order
  * IEEE double chain both engines compute). A word with no vocabulary
  * piece anywhere still segments: every position's no-candidate
  * fallback is the saturated −1.0e18 score, which the l = 1 candidate
  * always ties, so the word tiles into single characters and each
  * unseen character maps to the conventional −1 unk id. Kept pieces
  * map to ids through the same frozen model; a chosen piece outside
  * the id table (only possible via that fallback) is −1.
  *
  * Indexing is by CODEPOINT, not UTF-16 unit: the trainer's substring
  * arithmetic (Spark SQL substring/length) and the oracle's both count
  * codepoints, so the expression walks a codepoint array and
  * maxPieceLen bounds codepoints — supplementary-plane characters
  * (emoji) segment as single symbols, never as surrogate halves.
  *
  * CodegenFallback: the per-doc DP loop IS the work; there is no
  * surrounding expression chain to fuse. The model rides the plan as
  * driver-built hash maps, vocabulary-sized — the same distribution
  * contract as a broadcast. */
case class UnigramTokenize(child: Expression,
    model: Map[String, (Double, Long)], maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  // maxPieceLen < 1 would leave every bls(p) at 0 and the walk-back
  // (pos -= bls(pos)) spinning forever on an executor — fail loud at
  // plan construction instead (Unigram.MaxLen is always ≥ 1; this
  // guards direct callers of UnigramTokenize.of).
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_tokenize"
  override protected def withNewChildInternal(newChild: Expression): UnigramTokenize =
    copy(child = newChild)

  /** Saturation score for an unavailable candidate — the exact literal
    * the relational DP coalesces NULL to (Unigram.bestScoreSql). */
  private final val NoCand = -1.0e18

  @transient private lazy val lpMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    model.foreach { case (p, (lp, _)) => m.put(p, lp) }
    m
  }
  @transient private lazy val idMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    model.foreach { case (p, (_, id)) => m.put(p, id) }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / 3 + 4)
    var ws = 0
    var i = 0
    while (i <= n) {
      if (i == n || cps(i) == ' ') {
        tokenizeWord(cps, ws, i, out)
        ws = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** Viterbi DP over cps[s, e) — the in-row restatement of the
    * relational fold (dp, best-length, walk-back, id lookup). */
  private def tokenizeWord(cps: Array[Int], s: Int, e: Int,
      out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    val n = e - s
    if (n == 0) return
    val dp = new Array[Double](n + 1)
    val bls = new Array[Int](n + 1)
    var p = 1
    while (p <= n) {
      // dp[p] = greatest over l of the coalesced candidates — the same
      // left-to-right max chain as the SQL greatest(...)
      var best = NoCand
      var l = 1
      while (l <= maxPieceLen && l <= p) {
        val lp = lpMap.get(new String(cps, s + p - l, l))
        if (lp != null) {
          val cand = dp(p - l) + lp.doubleValue()
          if (cand > best) best = cand
        }
        l += 1
      }
      dp(p) = best
      // chosen length: first l ascending whose candidate EQUALS dp[p]
      // (candidates recomputed exactly as above, so the winner always
      // matches; the all-fallback case ties at l = 1)
      var bl = 0
      l = 1
      while (bl == 0 && l <= maxPieceLen) {
        val cand =
          if (l > p) NoCand
          else {
            val lp = lpMap.get(new String(cps, s + p - l, l))
            if (lp == null) NoCand else dp(p - l) + lp.doubleValue()
          }
        if (cand == dp(p)) bl = l
        l += 1
      }
      bls(p) = bl
      p += 1
    }
    // walk back from the end, then emit ids in order
    val lens = new Array[Int](n)
    var np = 0
    var pos = n
    while (pos > 0) {
      lens(np) = bls(pos)
      np += 1
      pos -= bls(pos)
    }
    var k = np - 1
    pos = 0
    while (k >= 0) {
      val id = idMap.get(new String(cps, s + pos, lens(k)))
      out += (if (id == null) -1L else id.longValue())
      pos += lens(k)
      k -= 1
    }
  }
}

object UnigramTokenize {
  def of(text: Column, model: Map[String, (Double, Long)], maxPieceLen: Int): Column =
    org.apache.spark.sql.GraftColumn.of(
      UnigramTokenize(org.apache.spark.sql.GraftColumn.exprOf(text), model, maxPieceLen))
}
