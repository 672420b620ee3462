package graft

import org.apache.spark.sql.functions._
import graft.engine.{Similarity, Sources}
import graft.functions.DotProduct

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot matches hand-computed values") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(DotProduct.dot(col("a"), col("b"))).as[Double].head() == 32.0)
  }

  test("native expression is bit-identical to the HOF fold on real embeddings") {
    val vs = Sources.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = vs.select(
      Similarity.dot(col("v"), col("v")).as("native"),
      Similarity.dotHof(col("v"), col("v")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null array yields null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(DotProduct.dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("length mismatch and null elements yield null, matching the HOF fold") {
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val m = mismatch.select(
      DotProduct.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()(0)
    assert(m.isNullAt(0) && m.isNullAt(1))
    val withNull = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(Some(4.0), Some(5.0), Some(6.0))))
      .toDF("a", "b")
    val n = withNull.select(
      DotProduct.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("registers as a SQL function via the session function registry") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => graft.functions.DotProduct(exprs.head, exprs(1)),
      "scala_udf")
    val out = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(out == 11.0)
  }
}
