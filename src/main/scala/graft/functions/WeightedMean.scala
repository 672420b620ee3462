package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` — the user-facing typed-aggregation
  * rung (below it: DeclarativeAggregate / TypedImperativeAggregate for
  * engine-internal sketches). Computes a weighted mean with an exact
  * integer-cents accumulator so partial aggregation (map-side combine)
  * is order-independent: merge(a, b) is plain integer addition.
  *
  * CONTRACT: inputs are 2-decimal "money" values and weights (the
  * quantization unit is the cent — finer fractions round). Inputs must
  * be finite, and |value·weight| must stay under ~9.2e14 (cents² fits a
  * long); violations throw ArithmeticException rather than silently
  * contributing wrong partial sums — `math.round(NaN)` is 0 and a
  * cents² overflow wraps negative, both of which would otherwise
  * produce a plausible-looking wrong mean.
  */
object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {

  /** (Σ value·weight in cents², Σ weight in cents) */
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (v, w) = in
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v) ||
        java.lang.Double.isNaN(w) || java.lang.Double.isInfinite(w))
      throw new ArithmeticException(s"weighted_mean: non-finite input ($v, $w)")
    // math.round SATURATES at Long.MaxValue rather than throwing, so a
    // huge-but-finite input would silently poison the sum (9.2e18 cents
    // with a tiny weight passes multiplyExact) — reject before rounding
    if (math.abs(v) * 100 >= Long.MaxValue.toDouble ||
        math.abs(w) * 100 >= Long.MaxValue.toDouble)
      throw new ArithmeticException(
        s"weighted_mean: input exceeds the cents range ($v, $w)")
    (Math.addExact(b._1, Math.multiplyExact(math.round(v * 100), math.round(w * 100))),
      Math.addExact(b._2, math.round(w * 100)))
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (Math.addExact(a._1, b._1), Math.addExact(a._2, b._2))

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.toDouble / r._2 / 100.0

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
