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
    val ivfSeedFp = recall(neighbors(Similarity.ivfTopK(
      e, q, "vec_id", "embedding", 5, 16, 3, trainIters = 0, seed = Similarity.SeedFarthest)))
    val ivfTrainedFp = recall(neighbors(Similarity.ivfTopK(
      e, q, "vec_id", "embedding", 5, 16, 3, seed = Similarity.SeedFarthest)))
    info(f"recall@5: srp 4x8bit=$lshOld%.2f srp 8x5bit=$lshNew%.2f " +
      f"srp 8x5bit+3probes=$lshMp%.2f ivf race seed=$ivfSeed%.2f " +
      f"trained=$ivfTrained%.2f ivf fp seed=$ivfSeedFp%.2f trained=$ivfTrainedFp%.2f")
    // measured (sf0.001, nprobe=3): srp 0.30 -> 0.63 -> 0.93
    // (multiprobe); ivf hash-race farthest-point seed 0.65 -> trained
    // 0.70 (nprobe 4/5: 0.675/0.725 seed, 0.75/0.775 trained); pure
    // farthest-point seed 0.55 -> trained 0.70. Both farthest modes
    // hold trained >= seed — the property the legacy first-k seed
    // VIOLATED on this corpus (its 0.975 seed vs 0.925 trained was an
    // equal-nprobe artifact: lopsided first-k cells scan a larger
    // corpus fraction, which is exactly what bounded-cell IVF exists
    // to avoid at scale). This spec pins the figures so a regression
    // in either mechanism surfaces.
    assert(lshNew > lshOld + 0.2,
      f"wider SRP config must clearly beat 4x8bit: $lshNew%.2f vs $lshOld%.2f")
    assert(lshNew >= 0.5, f"8x5-bit SRP recall regressed: $lshNew%.2f")
    assert(lshMp >= 0.85,
      f"multiprobe production config must reach recall@5 0.85: $lshMp%.2f")
    assert(lshMp > lshNew + 0.1,
      f"3-probe expansion must clearly lift single-probe recall: $lshMp%.2f vs $lshNew%.2f")
    assert(ivfTrained >= ivfSeed,
      f"trained IVF must not lose to its seed (uniform corpus): $ivfTrained%.2f vs $ivfSeed%.2f")
    assert(ivfTrainedFp >= ivfSeedFp,
      f"trained IVF must not lose to its seed (pure fp): $ivfTrainedFp%.2f vs $ivfSeedFp%.2f")
    assert(ivfTrained >= 0.70 - 1e-9, f"trained IVF nprobe=3 recall regressed: $ivfTrained%.2f")
    assert(ivfSeed >= 0.65 - 1e-9, f"race-seed IVF recall regressed: $ivfSeed%.2f")
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

  test("RRF fusion (q151) beats both of its input rankings on recall") {
    val exact = neighbors(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    def recall(a: Map[Long, Seq[Long]]): Double = recallAgainst(exact, 8)(a)
    val lsh = recall(neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 5, 64, 8)))
    val ivf = recall(neighbors(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 3)))
    val rrf = recall(neighbors(graft.queries.SimilarityQueries.all
      .find(_.name == "q151_hybrid_rrf").get
      .run(spark, "/root/testdata/sf0.001")))
    info(f"recall@5: srp-only=$lsh%.2f ivf-only=$ivf%.2f rrf-fused=$rrf%.2f")
    // measured 0.63 / 0.70 / 0.80: the two families miss DIFFERENT
    // exact neighbors (bucket geometry vs cell geometry), so the
    // union-then-re-rank recovers what each alone drops — the whole
    // case for rank-level fusion. Pinned so a regression in either
    // input silently degrading the fusion surfaces here.
    assert(rrf >= lsh && rrf >= ivf,
      f"fusion must not lose to an input: rrf=$rrf%.2f lsh=$lsh%.2f ivf=$ivf%.2f")
    assert(rrf >= 0.79, f"fused recall regressed: $rrf%.2f")
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
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, k, 3,
        trainIters = 0, dim = dim, seed = Similarity.SeedFirstK)))
    val trained = recall(neighbors(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, k, 3,
        trainIters = 2, dim = dim, seed = Similarity.SeedFirstK)))
    val raceSeed = recall(neighbors(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, k, 3,
        trainIters = 0, dim = dim)))
    val raceTrained = recall(neighbors(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5, k, 3,
        trainIters = 2, dim = dim)))
    info(f"clustered corpus recall@5 nprobe=3: firstk seed=$seed%.2f trained=$trained%.2f " +
      f"race seed=$raceSeed%.2f trained=$raceTrained%.2f")
    // measured: first-k seed 0.68, trained 1.00 — training earns its
    // keep exactly where a bad seed misses clusters. The hash-race
    // farthest-point default seeds every cluster up front (seed 1.00,
    // trained 1.00): trained >= seed holds on this corpus AND the
    // uniform one above — the default seeding's defining property.
    assert(trained >= seed, f"trained cells must not lose to the seed: $trained%.2f vs $seed%.2f")
    assert(trained >= seed + 0.2,
      f"training must clearly recover from a one-cluster seed: $trained%.2f vs $seed%.2f")
    assert(trained >= 0.95, f"trained recall on clustered data regressed: $trained%.2f")
    assert(raceTrained >= raceSeed,
      f"trained must not lose to the race seed (clustered): $raceTrained%.2f vs $raceSeed%.2f")
    assert(raceSeed >= 0.95, f"race seed must cover every cluster: $raceSeed%.2f")
    assert(raceTrained >= 0.95, f"race trained recall regressed: $raceTrained%.2f")
  }
}
