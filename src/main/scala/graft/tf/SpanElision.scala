package graft.tf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GetStructField, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import scala.collection.mutable

/** Span-elision optimizer rule (SURVEY §4): `start_line`/`end_line`/
  * `source` are computed during parse, but a query that prunes them away
  * (`SELECT name, type FROM terraform_resource`) should not pay for span
  * recovery, source slicing, or the unformatted-JSON fallback regex —
  * per-block source strings are the widest thing the parse emits.
  *
  * The parse UDF is named ([[ParseName]]); after Catalyst's column
  * pruning has collapsed the query to `GetStructField` accesses on the
  * generator output, the rule checks which TfRow fields are actually
  * consumed anywhere in the plan. If no span field survives (and the
  * struct is never referenced whole — e.g. by a typed deserializer),
  * the UDF is swapped for [[parseNoSpans]], which skips all span/source
  * work. Installed via `spark.experimental.extraOptimizations`, which
  * runs after the main optimizer batches — pruning is already final.
  */
object SpanElision {

  val ParseName = "tf_parse"
  val ParseNoSpanName = "tf_parse_nospan"

  /** The full parse (spans + source), shipped to executors by the UDF.
    * `path` is re-attached from the scan column (keeps it pushable). */
  val parseWithSpans: (String, String, Array[Byte]) => Seq[TfRow] =
    (path, kind, bytes) =>
      Builders.rowsForFile(Terraform.stripScheme(path), kind,
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        .map(_.copy(path = ""))

  /** Same rows, spans/source elided (all other fields byte-identical). */
  val parseNoSpans: (String, String, Array[Byte]) => Seq[TfRow] =
    (path, kind, bytes) =>
      Builders.rowsForFile(Terraform.stripScheme(path), kind,
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8), withSpans = false)
        .map(_.copy(path = ""))

  /** Ordinals of the span-DERIVED fields in the TfRow struct — taken
    * from the ENCODER schema (the same source of truth GetStructField
    * ordinals come from), not JVM reflection field order, which is
    * unspecified. `validation` is included: it is regex-extracted from
    * the block SOURCE (extractValidationBlock), so eliding span work
    * under a query that selects validation would silently null it. */
  private val spanOrdinals: Set[Int] = {
    val schema = org.apache.spark.sql.Encoders.product[TfRow].schema
    Set("startLine", "endLine", "source", "validation").map(schema.fieldIndex)
  }

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[Elide.type]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Elide
  }

  object Elide extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      // one pass over every expression: which attributes are referenced
      // whole, and which struct ordinals are extracted per attribute
      val fieldRefs = mutable.Map.empty[Long, mutable.Set[Int]]
      val wholeRefs = mutable.Set.empty[Long]
      def visit(e: Expression): Unit = e match {
        case GetStructField(a: AttributeReference, ord, _) =>
          fieldRefs.getOrElseUpdate(a.exprId.id, mutable.Set.empty) += ord
        case a: AttributeReference => wholeRefs += a.exprId.id
        case other => other.children.foreach(visit)
      }
      plan.foreach {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          // generatorOutput entries are definitions, not references
          visit(g.generator)
          g.requiredChildOutput.foreach(visit)
        case node => node.expressions.foreach(visit)
      }

      plan.transform {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          val outIds = g.generatorOutput.map(_.exprId.id)
          val spanFree = outIds.forall { id =>
            !wholeRefs.contains(id) &&
              fieldRefs.get(id).forall(_.intersect(spanOrdinals).isEmpty)
          }
          if (!spanFree) g
          else g.copy(generator = g.generator.transform {
            case u: ScalaUDF if u.udfName.contains(ParseName) =>
              u.copy(function = parseNoSpans, udfName = Some(ParseNoSpanName))
          }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Generator])
      }
    }
  }
}
