package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

/** Invariants + recall characterization of the approximate ANN paths
  * against the exact baseline. */
class AnnRecallSpec extends SparkSpec {

  private lazy val e = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val q = e.filter(col("vec_id") < 8)

  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq)
      .toMap

  private def recallAgainst(exact: Map[Long, Seq[Long]], nq: Int)(
      approx: Map[Long, Seq[Long]]): Double =
    (0L until nq.toLong).map(id =>
      approx.getOrElse(id, Nil).toSet.intersect(exact(id).toSet).size / 5.0).sum / nq

  test("both approximate paths rank the query itself first (cos=1 in its own bucket/cell)") {
    val lsh = neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 5, 64, 8))
    val ivf = neighbors(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 3))
    (0L until 8L).foreach { id =>
      assert(lsh(id).head == id, s"LSH query $id lost itself")
      assert(ivf(id).head == id, s"IVF query $id lost itself")
    }
  }

  test("recall@5: production configs (8x5-bit SRP, multiprobe, trained IVF nprobe=3) " +
      "hold their measured figures") {
    val exact = neighbors(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    def recall(a: Map[Long, Seq[Long]]): Double = recallAgainst(exact, 8)(a)
    val lshOld = recall(neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 8, 64, 4)))
    val lshN = neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 5, 64, 8))
    val lshNew = recall(lshN)
    val lshMp = recall(neighbors(Similarity.lshTopKMultiprobe(
      e, q, "vec_id", "embedding", 5, 5, 64, tables = 8, probes = 3)))
    val ivfSeed = recall(neighbors(
      Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 3, trainIters = 0)))
    val ivfTrained = recall(neighbors(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 3)))
    info(f"recall@5: srp 4x8bit=$lshOld%.2f srp 8x5bit=$lshNew%.2f " +
      f"srp 8x5bit+3probes=$lshMp%.2f ivf seed=$ivfSeed%.2f ivf trained(2 rounds)=$ivfTrained%.2f")
    // measured (sf0.001): srp 0.30 -> 0.63 -> 0.93 (multiprobe); ivf
    // trained 0.92 vs seed 0.98. On THIS corpus (near-uniform random
    // vectors) Lloyd rounds have no cluster structure to learn — they
    // balance cell boundaries, which at fixed nprobe slightly SHRINKS
    // probe coverage, so the seed's lopsided cells score higher here
    // (measured: the inversion persists at equal scanned fraction until
    // nprobe>=5, where trained reaches 1.0; farthest-point seeding
    // makes it WORSE, 0.68, by spreading centroids uniformly). The
    // trained-beats-seed property belongs to corpora WITH structure —
    // asserted in the clustered-corpus test below; this spec pins both
    // figures so a regression in either mechanism surfaces.
    assert(lshNew > lshOld + 0.2,
      f"wider SRP config must clearly beat 4x8bit: $lshNew%.2f vs $lshOld%.2f")
    assert(lshNew >= 0.5, f"8x5-bit SRP recall regressed: $lshNew%.2f")
    assert(lshMp >= 0.85,
      f"multiprobe production config must reach recall@5 0.85: $lshMp%.2f")
    assert(lshMp > lshNew + 0.1,
      f"3-probe expansion must clearly lift single-probe recall: $lshMp%.2f vs $lshNew%.2f")
    assert(ivfTrained >= 0.85, f"trained IVF nprobe=3 recall regressed: $ivfTrained%.2f")
    assert(ivfSeed >= 0.9, f"seed IVF sanity: $ivfSeed%.2f")
    // relative order among SHARED neighbors must agree with the exact
    // ranking (LSH may skip exact neighbors absent from its candidates,
    // but never reorder the ones it found)
    (0L until 8L).foreach { id =>
      val sharedSet = lshN(id).toSet.intersect(exact(id).toSet)
      val lshOrder = lshN(id).filter(sharedSet)
      val exactOrder = exact(id).filter(sharedSet)
      assert(lshOrder == exactOrder,
        s"LSH reorders shared neighbors for query $id: $lshOrder vs $exactOrder")
    }
  }

  test("trained IVF cells beat the seed where cluster structure exists") {
    import spark.implicits._
    // Deterministic clustered corpus: 16 hash-derived centers in 64-d,
    // 400 points in CLUSTER-MAJOR id order (point t belongs to cluster
    // t / 25) — so the first-16 seed lands every centroid inside ONE
    // cluster, the worst case first-k seeding admits. Training must
    // recover: Lloyd rounds pull the coincident centroids apart toward
    // the true clusters (sum-centroids, drop-empty-cell semantics).
    def u(s: String): Double = (Portable.pmd5Local(s) % 2000 - 1000) / 1000.0
    val k = 16; val dim = 64
    val centers = Array.tabulate(k, dim)((j, i) => u(s"c$j,$i"))
    val rows = (0 until 400).map { t =>
      val c = centers(t / 25)
      (t.toLong, (0 until dim).map(i => c(i) + 0.25 * u(s"n$t,$i")))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)
    val exact = neighbors(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    def recall(a: Map[Long, Seq[Long]]): Double = recallAgainst(exact, 8)(a)
    val seed = recall(neighbors(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, k, 3, trainIters = 0, dim = dim)))
    val trained = recall(neighbors(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, k, 3, trainIters = 2, dim = dim)))
    info(f"clustered corpus recall@5 nprobe=3: seed=$seed%.2f trained=$trained%.2f")
    // measured: seed 0.68, trained 1.00 — training earns its keep
    // exactly where the seed misses clusters
    assert(trained >= seed, f"trained cells must not lose to the seed: $trained%.2f vs $seed%.2f")
    assert(trained >= seed + 0.2,
      f"training must clearly recover from a one-cluster seed: $trained%.2f vs $seed%.2f")
    assert(trained >= 0.95, f"trained recall on clustered data regressed: $trained%.2f")
  }
}
