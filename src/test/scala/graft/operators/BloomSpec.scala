package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The three guarantees q126 leans on: zero false negatives (every
  * inserted key probes true), exact shard mergeability
  * (bloom(A) | bloom(B) == bloom(A u B) bit-for-bit), and a false
  * positive rate in line with the (1 - e^(-kn/m))^k theory — present
  * (so the exact-verify stage is doing real work) but small (so the
  * prefilter is doing real work too). */
class BloomSpec extends SparkSpec {

  private val M = 1 << 12 // 4096 bits: small enough for measurable FPs
  private val K = 4

  private def keys(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).toDF("key")
  }

  private def bitmap(lo: Long, hi: Long): Seq[Long] =
    Sketches.bloomBuild(keys(lo, hi), "key", M, K)
      .collect()(0).getSeq[Long](0)

  test("no false negatives: every inserted key probes true") {
    val bloom = Sketches.bloomBuild(keys(0, 500), "key", M, K)
    val misses = keys(0, 500).crossJoin(broadcast(bloom))
      .filter(!Sketches.bloomMightContain(col("bloom"), col("key"), M, K))
      .count()
    assert(misses == 0, s"$misses inserted keys probed false")
  }

  test("element-wise OR of shard bitmaps equals the union's bitmap") {
    val a = bitmap(0, 300)
    val b = bitmap(300, 500)
    val union = bitmap(0, 500)
    val orred = a.zip(b).map { case (x, y) => x | y }
    assert(orred == union, "bloom(A) | bloom(B) != bloom(A u B)")
    // and through the Column-level merge helper too
    val merged = Sketches.bloomBuild(keys(0, 300), "key", M, K)
      .crossJoin(Sketches.bloomBuild(keys(300, 500), "key", M, K)
        .withColumnRenamed("bloom", "bloom_b"))
      .select(Sketches.orBitmaps(col("bloom"), col("bloom_b")).as("bloom"))
      .collect()(0).getSeq[Long](0)
    assert(merged == union, "orBitmaps != bloom(A u B)")
  }

  test("false positive rate: nonzero, near theory, well under 6%") {
    val bloom = Sketches.bloomBuild(keys(0, 500), "key", M, K)
    val probes = 4000L
    val fp = keys(10000, 10000 + probes).crossJoin(broadcast(bloom))
      .filter(Sketches.bloomMightContain(col("bloom"), col("key"), M, K))
      .count()
    val rate = fp.toDouble / probes
    val theory = math.pow(1 - math.exp(-K * 500.0 / M), K)
    info(f"measured FP rate $rate%.4f vs theory $theory%.4f (n=500, m=$M, k=$K)")
    assert(fp > 0, "zero false positives: the exact-verify stage is untested")
    assert(rate < 0.06, f"FP rate $rate%.4f out of band vs theory $theory%.4f")
  }
}
