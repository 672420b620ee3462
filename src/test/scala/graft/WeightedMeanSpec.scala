package graft

import org.apache.spark.sql.functions._
import graft.functions.WeightedMean

class WeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator computes discount-weighted quantity over Dataset[T]") {
    // hand case: values 10, 20 with weights 1, 3 → (10·1+20·3)/4 = 17.5
    val ds = Seq((10.0, 1.0), (20.0, 3.0)).toDS()
    assert(ds.select(WeightedMean.toColumn).head() == 17.5)
  }

  test("order-independent: repartitioned input yields identical result") {
    val li = graft.engine.Sources.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"))
      .as[(Double, Double)]
    val a = li.repartition(1).select(WeightedMean.toColumn).head()
    val b = li.repartition(7).select(WeightedMean.toColumn).head()
    assert(a == b) // exact integer accumulator → bit-equal across plans
  }

  test("empty input yields NaN, zero weights yield NaN") {
    val ds = spark.emptyDataset[(Double, Double)]
    assert(ds.select(WeightedMean.toColumn).head().isNaN)
  }

  test("non-finite inputs and cents-squared overflow fail loudly") {
    // math.round(NaN) is 0 — without the guard a NaN row would silently
    // contribute value 0 at full weight
    intercept[ArithmeticException] {
      WeightedMean.reduce(WeightedMean.zero, (Double.NaN, 2.0))
    }
    intercept[ArithmeticException] {
      WeightedMean.reduce(WeightedMean.zero, (Double.PositiveInfinity, 1.0))
    }
    // cents² product past Long.MaxValue would wrap negative
    intercept[ArithmeticException] {
      WeightedMean.reduce(WeightedMean.zero, (1e8, 1e8))
    }
  }

  test("usable as a grouped typed aggregation") {
    val li = graft.engine.Sources.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[(String, Double, Double)]
    val out = li.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(WeightedMean.toColumn)
      .collect().toMap
    assert(out.keySet == Set("A", "N", "R"))
    assert(out.values.forall(v => v > 0 && v < 100))
  }
}
