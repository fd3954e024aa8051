package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document BPE tokenization as ONE native expression: text →
  * array of token ids under a frozen merge list + id table — the
  * [[WordpieceTokenize]] treatment applied to the BPE family, replacing
  * the distinct-word join-gather serving plan (measured on the
  * tokenize_serve ScaleBench row: the gather class spills 16-18 GB at
  * 256×; the expression form is a ZERO-SHUFFLE narrow map).
  *
  * Semantics are bit-identical to the relational replace-chain the
  * DuckDB oracle replays: each word seeds as single characters and
  * every merge (a, b), in training order, fuses non-overlapping
  * adjacent (a, b) occurrences LEFT TO RIGHT — exactly what
  * `replace(v, '<a><b>', '<ab>')` does on the delimiter encoding
  * (after a fusion the scan resumes AFTER the fused symbol). Unseen
  * symbols map to the conventional -1 unk id; unlike WordPiece an OOV
  * word still decomposes symbol by symbol.
  *
  * Depth note: the per-word chain replay is O(merges × word length) —
  * the faithful restatement of the gated semantics. A 32k-merge
  * production serve would swap in the rank-heap formulation; the
  * expression seam (merge list + id map carried in the plan) is where
  * that lands. */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)],
    ids: Map[String, Long]) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_tokenize"
  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)

  @transient private lazy val idMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    ids.foreach { case (t, id) => m.put(t, id) }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](text.length / 3 + 4)
    var ws = 0
    val n = text.length
    while (ws <= n) {
      var we = text.indexOf(' ', ws)
      if (we < 0) we = n
      tokenizeWord(text, ws, we, out)
      ws = we + 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  private def tokenizeWord(text: String, s: Int, e: Int,
      out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    if (s >= e) return
    var syms = new scala.collection.mutable.ArrayBuffer[String](e - s)
    var i = s
    while (i < e) { syms += text.substring(i, i + 1); i += 1 }
    merges.foreach { case (a, b) =>
      if (syms.length >= 2) {
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            next += a + b; j += 2
          } else { next += syms(j); j += 1 }
        }
        syms = next
      }
    }
    syms.foreach { t =>
      val id = idMap.get(t)
      out += (if (id == null) -1L else id.longValue())
    }
  }
}

object BpeTokenize {
  def of(text: Column, merges: Seq[(String, String)], ids: Map[String, Long]): Column =
    org.apache.spark.sql.GraftColumn.of(
      BpeTokenize(org.apache.spark.sql.GraftColumn.exprOf(text), merges, ids))
}
