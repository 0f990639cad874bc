package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: geometric mean as an `Aggregator` (the public
  * custom-aggregate API — mergeable partial state, so it runs as
  * partial+final aggregation at any scale). exp(mean(ln x)) over
  * positive inputs; zero/negative rows are ignored. */
object GeoMeanAggregator extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0.0) (b._1 + math.log(x), b._2 + 1) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
