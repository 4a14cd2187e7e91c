package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer dot product over two
  * `array<bigint>` columns, with `doGenCode` so it runs inside
  * whole-stage codegen (builder brief's preferred extension tier —
  * a native `Expression` beats both a Scala UDF and an interpreted
  * higher-order `aggregate(zip_with(...))`, and unlike a typed
  * mapPartitions kernel it needs no encoder boundary, so the
  * surrounding join/filter pipeline stays in one codegen stage).
  *
  * Null elements contribute 0; length mismatch uses the shorter array
  * (embedding tables are fixed-width, so neither occurs in practice).
  */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i64 requires array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) sum += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Idempotently register graft's native expressions as SQL functions
    * (usable via `expr("dot_i64(a, b)")` and in `spark.sql`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_i64", exprs => DotI64(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_cos", TopKCos.fromArgs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_bucket16", exprs => Md5Bucket16(exprs(0)), "built-in")
  }
}

/** SparkSessionExtensions hook — the deployment-grade registration path:
  * `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * engine's native functions into every session built on the config
  * (survives `newSession()`, no imperative register call needed).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_i64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotI64].getName, "dot_i64"),
      (exprs: Seq[Expression]) => DotI64(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("topk_cos"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TopKCos].getName, "topk_cos"),
      TopKCos.fromArgs))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("md5_bucket16"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Md5Bucket16].getName, "md5_bucket16"),
      (exprs: Seq[Expression]) => Md5Bucket16(exprs(0))))
  }
}
