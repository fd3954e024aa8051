package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, xxhash64_value)`: point-frequency estimate from
  * a serialized CountMinSketch (the output of Spark's built-in
  * `count_min_sketch` aggregate, which IS publicly registered — unlike
  * the Bloom pair — but ships with no SQL-reachable way to QUERY the
  * sketch; estimation exists only on the Java sketch object). This
  * expression closes that gap so heavy-hitter queries can stay one
  * declarative plan: aggregate → broadcast the one-row sketch → estimate
  * per candidate.
  *
  * The deserialized sketch is cached per expression instance keyed on
  * the binary's reference (the broadcast hands every row the same byte
  * array), so a candidate relation of any size pays ONE deserialization
  * per task, not per row. CodegenFallback: the estimate path is
  * candidate-sized (vocabulary-bounded), never the corpus-sized side.
  *
  * CMS guarantees estimate >= true count (never under), and
  * overestimates by at most eps·N with the aggregate's configured
  * confidence — the spec pins both sides against the exact counts.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires (binary, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType

  @transient private var bytesRef: Array[Byte] = _
  @transient private var sketch: CountMinSketch = _

  override protected def nullSafeEval(bin: Any, v: Any): Any = {
    val bytes = bin.asInstanceOf[Array[Byte]]
    if (!(bytes eq bytesRef)) {
      sketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      bytesRef = bytes
    }
    sketch.estimateCount(v.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

object Cms {

  val estimateBuilder: FunctionBuilder = {
    case Seq(sk, v) => CmsEstimate(sk, v)
    case other => throw new IllegalArgumentException(
      s"cms_estimate expects (sketch, value), got ${other.length} args")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      estimateBuilder)
}
