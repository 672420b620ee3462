package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` — the user-facing typed-aggregation
  * rung (below it: DeclarativeAggregate / TypedImperativeAggregate for
  * engine-internal sketches). Computes a weighted mean with an exact
  * integer-cents accumulator so partial aggregation (map-side combine)
  * is order-independent: merge(a, b) is plain integer addition.
  */
object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {

  /** (Σ value·weight in cents², Σ weight in cents) */
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (v, w) = in
    (b._1 + math.round(v * 100) * math.round(w * 100),
      b._2 + math.round(w * 100))
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.toDouble / r._2 / 100.0

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
