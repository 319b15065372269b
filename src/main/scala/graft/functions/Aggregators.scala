package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (the user-facing custom-aggregate API).
  *
  * Buffers use exact integer arithmetic (cents as longs) so the merge
  * tree's shape cannot change the result — the same determinism rule
  * the decimal-sum queries follow.
  */
object Aggregators {

  final case class PriceRow(l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double)

  final case class WSum(numCents: Long, den: Long)

  /** Quantity-weighted average price: sum(qty * price) / sum(qty),
    * carried as exact cents. Finish = (cents/100.0)/qty — the same
    * expression shape the DuckDB oracle uses, so doubles match. */
  object WeightedAvgPrice extends Aggregator[PriceRow, WSum, Double] {
    override def zero: WSum = WSum(0L, 0L)
    override def reduce(b: WSum, r: PriceRow): WSum = WSum(
      b.numCents + math.round(r.l_extendedprice * 100) * r.l_quantity.toLong,
      b.den + r.l_quantity.toLong)
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.numCents + b.numCents, a.den + b.den)
    override def finish(b: WSum): Double =
      if (b.den == 0) 0.0 else (b.numCents / 100.0) / b.den
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
