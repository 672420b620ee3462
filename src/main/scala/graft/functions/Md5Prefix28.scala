package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd portable 28-bit hash: the first 28 bits (= first 7
  * hex digits) of `md5(input)` as a long in [0, 2^28).
  *
  * Value-identical to `conv(substring(md5(c), 1, 7), 16, 10)` — the
  * formulation DuckDB mirrors for the oracle (see
  * [[graft.engine.PortableHash.duckH28]]) — but reads the digest bytes
  * directly instead of materializing a 32-char hex UTF8String, slicing
  * it, and re-parsing base-16: three allocations and a string parse per
  * row removed from the dedup/fingerprint/sampling hot paths.
  */
case class Md5Prefix28(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix28 expects string or binary, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix28"

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].getBytes
      case _ => v.asInstanceOf[Array[Byte]]
    }
    Md5Prefix28.digest28(bytes)
  }

  // The packing arithmetic lives in a static helper (not inline Java):
  // Janino mis-parses the inline form `(($digest[0] & 0xffL) << 20) | ...`
  // as a cast-to-type and fails to compile, which silently dropped every
  // h28 stage to interpreted eval. A plain static call sidesteps the
  // parser ambiguity and keeps the stage inside whole-stage codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val toBytes = child.dataType match {
        case StringType => s"$in.getBytes()"
        case _ => in
      }
      s"""
         |byte[] $bytes = $toBytes;
         |${ev.value} = graft.functions.Md5Prefix28.digest28($bytes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix28 =
    copy(child = newChild)
}

object Md5Prefix28 {
  def h28(c: Column): Column = Bridge.column(Md5Prefix28(Bridge.expression(c)))

  // per-thread reused MessageDigest: DigestUtils.md5 did a JCA provider
  // lookup + MessageDigest allocation PER ROW — the dominant remaining
  // per-row allocation in the hash hot path after the hex-string
  // round-trip was removed. digest() leaves the instance reset.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 28 bits of md5(bytes) as a long. Called from generated code
    * via this static forwarder. */
  def digest28(bytes: Array[Byte]): Long = pack(md.get().digest(bytes))

  /** First 28 bits of an md5 digest as a long. */
  def pack(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
}
