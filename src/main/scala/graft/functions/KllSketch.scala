package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic KLL-style one-pass quantile sketch over longs.
  *
  * The exact-rank quantile queries (q85, and its two-pass scale path
  * q95) pay either a per-stratum sort or two full scans. This sketch is
  * the one-pass alternative: a mergeable bounded buffer whose partial
  * (map-side) state never exceeds O(k * log(n/k)) values per group per
  * partition, so a 100 TB corpus gets per-stratum quantiles from a
  * single scan with ~1% rank error at k=4096.
  *
  * Mechanics (Karnin-Lang-Liberty shape, deterministic variant): level
  * i holds items of weight 2^i. When a level exceeds k items it is
  * sorted and every second item of an EVEN-count slice is promoted to
  * level i+1 (each survivor inherits its dropped neighbor's weight —
  * pairs conserve total weight exactly; an odd item out stays at its
  * level, so weight(sketch) == n always); the parity alternates with a
  * compaction counter carried in the state instead of the random coin
  * the paper uses, so the sketch is REPRODUCIBLE: the same inputs
  * through the same merge tree give bit-identical state.
  * Rank queries walk the weighted items in value order and return the
  * smallest value whose cumulative weight reaches ceil(W*p/100) — the
  * same type-1 definition as q85's oracle, in the same integer
  * arithmetic.
  *
  * Exactness gate (the q94 Misra-Gries pattern): with capacity >= n no
  * compaction ever fires, every item keeps weight 1, and the answer is
  * the exact type-1 quantile under ANY partitioning or merge order —
  * which is what lets q101 carry a bit-exact DuckDB oracle at test
  * scale while the spec separately proves the bounded-memory compaction
  * regime's error bound.
  */
object Kll {

  /** Sketch state: `levels(i)` holds items of weight `1 << i` (unsorted
    * between compactions); `compactions` drives the deterministic
    * alternating parity (sums under merge). */
  final case class KllBuf(levels: Seq[Seq[Long]], compactions: Long)

  val empty: KllBuf = KllBuf(Vector(Vector.empty), 0L)

  def insert(b: KllBuf, v: Long, k: Int): KllBuf = {
    val l0 = b.levels.head :+ v
    compact(KllBuf(l0 +: b.levels.tail, b.compactions), k)
  }

  def merge(a: KllBuf, b: KllBuf, k: Int): KllBuf = {
    val h = math.max(a.levels.length, b.levels.length)
    val levels = Vector.tabulate(h) { i =>
      val xs = if (i < a.levels.length) a.levels(i) else Vector.empty[Long]
      val ys = if (i < b.levels.length) b.levels(i) else Vector.empty[Long]
      xs ++ ys
    }
    compact(KllBuf(levels, a.compactions + b.compactions), k)
  }

  /** Cascade: any level over capacity promotes one level up and
    * (nearly) empties. Weight is conserved EXACTLY: only an even count
    * of items promotes — each promoted item doubles its weight, so
    * pairs conserve total weight — and an odd one out STAYS at its
    * level, the alternating parity bit choosing which end survives
    * (the same bit picks odd- or even-indexed items within the pairs,
    * cancelling the keep-low/keep-high rank bias across rounds). Rank
    * error therefore comes only from promotion displacement (a
    * promoted item stands for its dropped pair partner), never from
    * lost mass — `weight(sketch) == n` is an exact invariant under any
    * insert/merge tree (PropertySpec, KllSketchSpec). */
  private def compact(b: KllBuf, k: Int): KllBuf = {
    if (b.levels.forall(_.lengthCompare(k) <= 0)) return b
    val levels = collection.mutable.ArrayBuffer(b.levels.map(_.toVector): _*)
    var comps = b.compactions
    var i = 0
    while (i < levels.length) {
      if (levels(i).length > k) {
        val sorted = levels(i).sorted
        val offset = (comps % 2).toInt
        comps += 1
        val (pairs, keep) =
          if (sorted.length % 2 == 0) (sorted, Vector.empty[Long])
          else if (offset == 0) (sorted.init, Vector(sorted.last))
          else (sorted.tail, Vector(sorted.head))
        val promoted = Vector.range(offset, pairs.length, 2).map(pairs)
        levels(i) = keep
        if (i + 1 == levels.length) levels += promoted
        else levels(i + 1) = levels(i + 1) ++ promoted
      }
      i += 1
    }
    KllBuf(levels.toVector, comps)
  }

  /** Total weight represented — exactly the number of inserted items,
    * in EVERY regime: compaction promotes only even counts (pairs
    * conserve weight) and parks the odd one out at its level, so no
    * mass is ever created or lost (see [[compact]]). */
  def weight(b: KllBuf): Long =
    b.levels.zipWithIndex.map { case (vs, i) => vs.length.toLong << i }.sum

  /** Type-1 quantiles at integer percents: smallest value whose
    * cumulative weight (in value order) reaches ceil(W*p/100). */
  def quantiles(b: KllBuf, percents: Seq[Int]): Seq[Long] = {
    val weighted = b.levels.zipWithIndex
      .flatMap { case (vs, i) => vs.map(v => (v, 1L << i)) }
      .sortBy(_._1)
    val total = weighted.iterator.map(_._2).sum
    if (total == 0L) return percents.map(_ => 0L)
    percents.map { p =>
      val target = math.max(1L, (total * p + 99) / 100)
      var cum = 0L
      var idx = 0
      while (cum < target && idx < weighted.length) {
        cum += weighted(idx)._2
        idx += 1
      }
      weighted(math.min(idx, weighted.length) - 1)._1
    }
  }

  /** Number of values held (the bounded-memory claim: <= k per level,
    * levels <= log2(n/k) + 2). */
  def stateSize(b: KllBuf): Int = b.levels.map(_.length).sum

  /** Typed one-pass quantile aggregate. With `k` >= the group size the
    * result is the exact type-1 quantile vector (q101's oracle-able
    * configuration); smaller `k` trades rank error (~log^2(n/k)/k) for
    * O(k log(n/k)) state — the 100 TB configuration. */
  final class QuantileSketchLong(k: Int, percents: Seq[Int])
      extends Aggregator[Long, KllBuf, Seq[Long]] {
    require(k >= 2, s"sketch capacity must be >= 2, got $k")
    override def zero: KllBuf = Kll.empty
    override def reduce(b: KllBuf, v: Long): KllBuf = insert(b, v, k)
    override def merge(a: KllBuf, b: KllBuf): KllBuf = Kll.merge(a, b, k)
    override def finish(b: KllBuf): Seq[Long] = quantiles(b, percents)
    override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }
}
