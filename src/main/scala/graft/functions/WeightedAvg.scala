package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (UDAF surface): weighted average with an exact
  * integer-cents accumulator, so results stay order-independent across
  * partitions — the same determinism discipline as `Portable.centsSum`.
  * Usable as `WeightedAvg.toColumn` on a typed Dataset or registered via
  * `functions.udaf`.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {

  // (Σ value*weight in 1e-4 units, Σ weight in 1e-2 units)
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(acc: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (value, weight) = in
    (acc._1 + math.round(value * weight * 10000.0), acc._2 + math.round(weight * 100.0))
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(acc: (Long, Long)): Double =
    if (acc._2 == 0) Double.NaN else (acc._1.toDouble / 100.0) / acc._2

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
