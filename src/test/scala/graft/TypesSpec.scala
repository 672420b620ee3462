package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Types

class TypesSpec extends SparkSpec {
  import spark.implicits._

  test("coerce casts named columns to named types (documented intent of sql.py:122-130)") {
    val df = Seq((1, "true", "0.5", "cat")).toDF("id", "b", "f", "c")
    val out = Types.coerce(df, Types.CoercionSpec(
      categoryColumns = Seq("c"), boolColumns = Seq("b"), floatColumns = Seq("f")))
    assert(out.schema("b").dataType == BooleanType)
    assert(out.schema("f").dataType == DoubleType)
    assert(out.schema("c").dataType == StringType) // category → string
    val r = out.collect()(0)
    assert(r.getBoolean(1) && r.getDouble(2) == 0.5 && r.getString(3) == "cat")
  }

  test("normalizeDecimals casts every decimal column to (38,20), leaves others") {
    val df = Seq((1, BigDecimal("1.50"), 2.5)).toDF("id", "d", "f")
    val out = Types.normalizeDecimals(df)
    assert(out.schema("d").dataType == DecimalType(38, 20))
    assert(out.schema("f").dataType == DoubleType)
    assert(out.select(col("d").cast("string")).as[String].head
      == "1.50000000000000000000")
  }

  test("money cast is exact for 2-decimal doubles") {
    val df = Seq(0.04, 112946.26, -13.37).toDF("x")
    val got = df.select(Types.money(col("x")).cast("string")).as[String].collect()
    assert(got.sameElements(Array("0.04", "112946.26", "-13.37")))
  }
}
