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
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_product requires 2 arguments, got ${exprs.length}")
        // cast here so SQL over the raw float-array embeddings column
        // works (the expression itself requires array<double>)
        val target = org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)
        DotProduct(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), target),
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), target))
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix28"),
      new ExpressionInfo(classOf[Md5Prefix28].getName, "md5_prefix28"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"md5_prefix28 requires 1 argument, got ${exprs.length}")
        Md5Prefix28(exprs.head)
      }))
  }
}
