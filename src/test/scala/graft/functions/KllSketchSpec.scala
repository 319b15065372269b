package graft.functions

import scala.util.Random

import graft.SparkSpec
import graft.functions.Kll.KllBuf

class KllSketchSpec extends SparkSpec {

  import spark.implicits._

  /** Exact type-1 quantile: value at rank ceil(n*p/100) of the sorted
    * data — the definition q85/q95/q101 and their oracles share. */
  private def exactQ(data: Seq[Long], p: Int): Long = {
    val s = data.sorted
    s((math.max(1L, (s.length.toLong * p + 99) / 100) - 1).toInt)
  }

  /** Rank error of value v against percent p over data: distance from
    * the target rank to the nearest rank v actually occupies. */
  private def rankError(data: Seq[Long], p: Int, v: Long): Long = {
    val s = data.sorted
    val target = math.max(1L, (s.length.toLong * p + 99) / 100)
    val lo = s.indexWhere(_ >= v) + 1      // first rank of v (1-based)
    val hi = s.lastIndexWhere(_ <= v) + 1  // last rank <= v
    if (lo <= target && target <= hi) 0L
    else math.min(math.abs(target - lo), math.abs(target - hi))
  }

  test("capacity >= n: exact type-1 quantiles under any insertion or merge order") {
    val rnd = new Random(7)
    val data = Seq.fill(3000)(rnd.nextLong() % 100000)
    val k = 4096 // > n: no compaction can fire
    for (seed <- 1 to 3) {
      val shuffled = new Random(seed).shuffle(data)
      val chunks = shuffled.grouped(500).toSeq
      val partials = chunks.map(_.foldLeft(Kll.empty)((b, v) => Kll.insert(b, v, k)))
      val merged = partials.reduce((a, b) => Kll.merge(a, b, k))
      assert(Kll.weight(merged) == data.length.toLong)
      for (p <- Seq(1, 25, 50, 75, 99, 100))
        assert(Kll.quantiles(merged, Seq(p)).head == exactQ(data, p),
          s"seed=$seed p=$p")
    }
  }

  test("compaction regime: bounded state, bounded rank error, any partitioning") {
    val n = 50000
    val k = 256
    val rnd = new Random(42)
    // mixed distribution: uniform + a heavy spike (quantile stress)
    val data = Seq.fill(n)(if (rnd.nextInt(4) == 0) 5000L else rnd.nextInt(1000000).toLong)
    for (parts <- Seq(1, 7, 32)) {
      val chunks = data.grouped((n + parts - 1) / parts).toSeq
      val partials = chunks.map(_.foldLeft(Kll.empty)((b, v) => Kll.insert(b, v, k)))
      // every partial is bounded: <= k per level, levels <= log2(n/k)+2
      val maxLevels = (math.log(n.toDouble / k) / math.log(2)).toInt + 2
      partials.foreach { b =>
        assert(b.levels.forall(_.size <= k), "level over capacity")
        assert(b.levels.size <= maxLevels, s"${b.levels.size} levels > $maxLevels")
        assert(Kll.stateSize(b) <= k * maxLevels)
      }
      val merged = partials.reduce((a, b) => Kll.merge(a, b, k))
      // weight is conserved EXACTLY: compaction promotes only pairs
      // and parks the odd one out at its level
      assert(Kll.weight(merged) == n.toLong,
        s"weight ${Kll.weight(merged)} != $n")
      // observed eps at k=256 is ~0.4%; assert a 2% ceiling
      for (p <- Seq(25, 50, 75, 99)) {
        val est = Kll.quantiles(merged, Seq(p)).head
        val err = rankError(data, p, est)
        assert(err <= n / 50, s"parts=$parts p=$p rank error $err > ${n / 50}")
      }
    }
  }

  test("deterministic: same inputs, same merge tree, bit-identical state") {
    val data = (1L to 10000L).map(v => v * 2654435761L % 999983L)
    def build(): KllBuf = {
      val partials = data.grouped(1000).toSeq
        .map(_.foldLeft(Kll.empty)((b, v) => Kll.insert(b, v, 64)))
      partials.reduce((a, b) => Kll.merge(a, b, 64))
    }
    assert(build() == build())
  }

  test("QuantileSketchLong aggregator: exact capacity == window ranks, any partitioning") {
    val rnd = new Random(3)
    val rows = (1L to 4000L).map(i => (s"s${i % 3}", rnd.nextInt(10000).toLong))
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val data = vs.map(_._2)
      (g, exactQ(data, 50), exactQ(data, 99))
    }.toSet
    for (parts <- Seq(1, 8, 32)) {
      val got = spark.createDataset(rows).repartition(parts)
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new Kll.QuantileSketchLong(1 << 13, Seq(50, 99)).toColumn)
        .map { case (g, qs) => (g, qs(0), qs(1)) }
        .collect().toSet
      assert(got == expected, s"parts=$parts diverged")
    }
  }

  test("QuantileSketchLong rejects degenerate capacity; empty group yields zeros") {
    intercept[IllegalArgumentException] { new Kll.QuantileSketchLong(1, Seq(50)) }
    assert(Kll.quantiles(Kll.empty, Seq(50)) == Seq(0L))
  }
}
