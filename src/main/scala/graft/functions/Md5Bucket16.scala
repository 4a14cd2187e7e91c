package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 16 bits of md5(string) as an
  * INT in [0, 65535] — the feature-hashing bucket the classifier
  * quality filter keys its weight table on, and the salt hash of the
  * best-fit packer. Bit-identical to the builtin chain
  * `conv(substring(md5(s), 1, 4), 16, 10)` (the first 4 hex chars ARE
  * the first 2 digest bytes, big-endian), which is what the DuckDB
  * oracles replay as `('0x' || substr(md5(s), 1, 4))::BIGINT`.
  *
  * Why a custom expression: Spark's builtin md5 allocates a fresh
  * MessageDigest per call (commons-codec DigestUtils) and the chain
  * then builds a 32-char hex string, substrings it, and string-parses
  * base-16 — four allocations per feature on the classifier's hot path
  * (~100 features/doc). This computes the bucket straight off the
  * digest bytes with a thread-local MessageDigest, inside whole-stage
  * codegen (measured 2.5× on the classifier query at 16× — see
  * BASELINE.md r18 notes).
  */
case class Md5Bucket16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_bucket16 requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_bucket16"

  override def nullSafeEval(s: Any): Any =
    Md5Bucket16.bucket(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Bucket16$$.MODULE$$.bucket($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Bucket16 =
    copy(child = newChild)
}

object Md5Bucket16 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 2 md5 digest bytes, big-endian, as an unsigned 16-bit int. */
  def bucket(s: UTF8String): Int = {
    val d = md.get()
    d.reset()
    val out = d.digest(s.getBytes)
    ((out(0) & 0xff) << 8) | (out(1) & 0xff)
  }
}
