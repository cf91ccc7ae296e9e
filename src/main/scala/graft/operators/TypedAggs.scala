package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface — the Dataset-API twin of the Catalyst
  * expressions: user-defined, mergeable aggregation state that Spark
  * partial-aggregates map-side like any built-in (the property that
  * matters at shuffle scale).
  */
object TypedAggs {

  /** Weighted mean with exact long accumulation (values scaled to
    * cents), merge-associative by construction.
    */
  case class WSum(sum4: Long, w100: Long)

  class WeightedMeanCents extends Aggregator[(Double, Double), WSum, Double] {
    // half-AWAY-FROM-ZERO, matching SQL round() in the oracle replay:
    // math.round alone is half-toward-+inf and diverges on negative
    // exact-half cents (-0.5 -> 0 vs SQL -1)
    private def cents(x: Double): Long =
      if (x < 0) -math.round(-x * 100) else math.round(x * 100)
    override def zero: WSum = WSum(0L, 0L)
    override def reduce(b: WSum, a: (Double, Double)): WSum =
      WSum(b.sum4 + cents(a._1) * cents(a._2), b.w100 + cents(a._2))
    override def merge(x: WSum, y: WSum): WSum =
      WSum(x.sum4 + y.sum4, x.w100 + y.w100)
    override def finish(r: WSum): Double =
      if (r.w100 == 0) 0.0 else r.sum4.toDouble / 100.0 / r.w100.toDouble
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Streaming-mergeable min/max/count digest of a double column. */
  case class Digest(n: Long, min: Double, max: Double)

  class RangeDigest extends Aggregator[Double, Digest, Digest] {
    override def zero: Digest = Digest(0L, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: Digest, a: Double): Digest =
      Digest(b.n + 1, math.min(b.min, a), math.max(b.max, a))
    override def merge(x: Digest, y: Digest): Digest =
      Digest(x.n + y.n, math.min(x.min, y.min), math.max(x.max, y.max))
    override def finish(r: Digest): Digest = r
    override def bufferEncoder: Encoder[Digest] = Encoders.product[Digest]
    override def outputEncoder: Encoder[Digest] = Encoders.product[Digest]
  }
}
