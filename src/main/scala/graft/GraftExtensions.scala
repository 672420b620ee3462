package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Md5Prefix28}

/** Session extension installing graft's native SQL functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   SELECT dot_product(embedding_a, embedding_b) FROM pairs
  * }}}
  *
  * (In-process callers can equally use
  * `graft.functions.DotProduct.dot(colA, colB)` or register through the
  * session function registry — see DotProductSpec.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix28"),
      new ExpressionInfo(classOf[Md5Prefix28].getName, "md5_prefix28"),
      (exprs: Seq[Expression]) => Md5Prefix28(exprs.head)))
  }
}
