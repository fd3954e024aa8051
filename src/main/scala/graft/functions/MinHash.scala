package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native MinHash signature: `minhash_sig(shingles, numPerms)` over an
  * `array<string>` shingle set returns the `array<long>` of per-permutation
  * minimum hashes.
  *
  * Why a custom Expression (SURVEY §7.5 promotion rule): the composable
  * formulation
  * `transform(sequence(0, n-1), p -> array_min(transform(shs, t -> xxhash64(p, t))))`
  * interprets two nested lambdas and allocates an intermediate hash array
  * per permutation — numPerms × |shingles| boxed closure calls per
  * document. At 100 TB the signature pass IS the MinHash+LSH dedup cost
  * (everything after it shuffles only (doc, band, hash) rows). This
  * expression computes the whole signature in one fused primitive loop
  * inside whole-stage codegen.
  *
  * Bit-parity: permutation p's hash of shingle t equals Spark's
  * `xxhash64(p, t)` exactly — seed 42, the int arg hashed first
  * (XXH64.hashInt), the resulting value seeding the string hash
  * (XXH64.hashUTF8String) — so signatures match the round-1 lambda
  * formulation value-for-value (pinned in MinHashSpec).
  *
  * Empty input arrays yield Long.MaxValue per slot (the SQL form's
  * array_min(empty) is NULL); callers feed shingle sets built by
  * explode+collect_set, which never produces an empty set.
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numPerms > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires (array<string>, positive literal int), got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      val seeded = XXH64.hashInt(p, 42L)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), seeded)
        if (h < mn) mn = h
        i += 1
      }
      out(p) = mn
      p += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val sd = ctx.freshName("sd")
      val mn = ctx.freshName("mn")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $x.numElements();
         |long[] $out = new long[$numPerms];
         |for (int $p = 0; $p < $numPerms; $p++) {
         |  long $sd = $xxh.hashInt($p, 42L);
         |  long $mn = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $xxh.hashUTF8String($x.getUTF8String($i), $sd);
         |    if ($h < $mn) $mn = $h;
         |  }
         |  $out[$p] = $mn;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Register `minhash_sig(arr, numPerms)`; numPerms must be a literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(arr, Literal(np: Int, IntegerType)) => MinHashSignature(arr, np)
        case _ => throw new IllegalArgumentException(
          "minhash_sig expects (array<string>, literal int)")
      })
}
