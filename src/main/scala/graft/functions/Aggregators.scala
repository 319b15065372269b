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

  final case class MinKBuf(hs: Seq[Long])

  /** The KMV (k-minimum-values) sketch accumulator: the k smallest
    * DISTINCT hash values seen. distinct(group) is then estimated as
    * (k-1) * 2^60 / h_k — the classic bottom-k estimator over the
    * pmd5 hash space [0, 2^60).
    *
    * The buffer is BOUNDED at k longs with duplicates dropped on
    * insert, so partial (map-side) aggregation ships at most k values
    * per partition per group — the scale-correct shape for distinct
    * estimation. The exact alternative (row_number over the full
    * distinct set) sorts every distinct value per group: fine as a
    * small-scale oracle, a full-corpus sort at 100 TB. Min-k of a set
    * is order-insensitive, so the result (and the DuckDB oracle match)
    * is deterministic under any partitioning or merge-tree shape.
    *
    * finish returns h_k, or 0 when the group had fewer than k distinct
    * values (callers null it out — mirrors the oracle's CASE rn = k).
    */
  final class MinKHash(k: Int) extends Aggregator[Long, MinKBuf, Long] {
    override def zero: MinKBuf = MinKBuf(Vector.empty)
    override def reduce(b: MinKBuf, h: Long): MinKBuf =
      if (b.hs.contains(h) || (b.hs.size == k && h > b.hs.last)) b
      else MinKBuf((b.hs :+ h).sorted.take(k))
    override def merge(a: MinKBuf, b: MinKBuf): MinKBuf =
      MinKBuf((a.hs ++ b.hs).distinct.sorted.take(k))
    override def finish(b: MinKBuf): Long =
      if (b.hs.size == k) b.hs.last else 0L
    override def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  final case class KeyedPrice(key: Long, price: Double)
  final case class TopKBuf(rows: Seq[KeyedPrice])

  /** Bounded top-k-per-group accumulator: the k largest rows by
    * (price DESC, key ASC) — a total order, so ranks are deterministic
    * under ties. The buffer never exceeds k rows, so partial (map-side)
    * aggregation ships at most k rows per group per partition where the
    * window-function formulation (row_number over the full group)
    * shuffles EVERY row of every group to one task — the difference
    * between a bounded combine and a full-group sort at corpus scale.
    * Top-k of a set is order-insensitive, so the result is identical
    * under any partitioning or merge-tree shape. k is query-small here
    * (sorted-insert is fine); a large-k variant would swap the Vector
    * for a bounded heap, same semantics.
    */
  final class TopKByPrice(k: Int) extends Aggregator[KeyedPrice, TopKBuf, Seq[KeyedPrice]] {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    /** Best-first order matching Spark SQL's `price DESC, key ASC`
      * EXACTLY: NaN ranks as the LARGEST price (Spark semantics; a
      * negated java-compare tuple would rank it smallest) and
      * -0.0 == 0.0 (normalized by adding +0.0). */
    private val ord: Ordering[KeyedPrice] = new Ordering[KeyedPrice] {
      override def compare(x: KeyedPrice, y: KeyedPrice): Int = {
        val px = x.price + 0.0
        val py = y.price + 0.0
        val c =
          if (px.isNaN && py.isNaN) 0
          else if (px.isNaN) -1 // NaN = largest price -> best -> first
          else if (py.isNaN) 1
          else java.lang.Double.compare(py, px) // descending
        if (c != 0) c else java.lang.Long.compare(x.key, y.key)
      }
    }
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    override def reduce(b: TopKBuf, r: KeyedPrice): TopKBuf =
      if (b.rows.size == k && ord.gteq(r, b.rows.last)) b
      else TopKBuf((b.rows :+ r).sorted(ord).take(k))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.rows ++ b.rows).sorted(ord).take(k))
    override def finish(b: TopKBuf): Seq[KeyedPrice] = b.rows.sorted(ord)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[KeyedPrice]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Upper-triangle second-moment sum over integer code vectors: for
    * input rows c (long arrays of length `dim`), accumulates
    * A_ij = sum_rows c_i * c_j for j >= i as a flat row-major
    * triangle of dim*(dim+1)/2 BIGINTs (index walks i ascending,
    * then j = i..dim-1). Every entry is a sum of Int64 products —
    * commutative and associative, so the result is EXACT and
    * partitioning-independent, the same guarantee the q127 explode
    * spelling had. The buffer is mutated in place (a long[] per
    * partial aggregation, not per row), so the corpus-sized stage
    * does dim*(dim+1)/2 fused multiply-adds per row in one tight
    * loop instead of generating that many rows through two
    * generators into a hash aggregation (guide "expressions and
    * codegen": the explode was the hot path's non-codegen row
    * machinery). */
  final class TriangleMomentSum(dim: Int)
      extends Aggregator[Array[Long], Array[Long], Seq[Long]] {
    private val len = dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(b: Array[Long], c: Array[Long]): Array[Long] = {
      var idx = 0
      var i = 0
      while (i < dim) {
        val ci = c(i)
        var j = i
        while (j < dim) { b(idx) += ci * c(j); idx += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
