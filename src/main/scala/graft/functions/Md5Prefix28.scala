package graft.functions

import org.apache.commons.codec.digest.DigestUtils
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

  @inline private def pack(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].getBytes
      case _ => v.asInstanceOf[Array[Byte]]
    }
    pack(DigestUtils.md5(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val digest = ctx.freshName("digest")
      val toBytes = child.dataType match {
        case StringType => s"$in.getBytes()"
        case _ => in
      }
      s"""
         |byte[] $bytes = $toBytes;
         |byte[] $digest =
         |  org.apache.commons.codec.digest.DigestUtils.md5($bytes);
         |${ev.value} = (($digest[0] & 0xffL) << 20)
         |  | (($digest[1] & 0xffL) << 12)
         |  | (($digest[2] & 0xffL) << 4)
         |  | (($digest[3] & 0xf0L) >> 4);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix28 =
    copy(child = newChild)
}

object Md5Prefix28 {
  def h28(c: Column): Column = Bridge.column(Md5Prefix28(Bridge.expression(c)))
}
