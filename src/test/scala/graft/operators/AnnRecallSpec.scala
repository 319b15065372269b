package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

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

  test("both approximate paths rank the query itself first (cos=1 in its own bucket/cell)") {
    val lsh = neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 5, 64, 8))
    val ivf = neighbors(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 3))
    (0L until 8L).foreach { id =>
      assert(lsh(id).head == id, s"LSH query $id lost itself")
      assert(ivf(id).head == id, s"IVF query $id lost itself")
    }
  }

  test("recall@5: production configs (8x5-bit SRP, trained IVF nprobe=3) " +
      "hold their measured figures") {
    val exact = neighbors(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    def recall(approx: Map[Long, Seq[Long]]): Double =
      (0L until 8L).map(id => approx(id).toSet.intersect(exact(id).toSet).size / 5.0).sum / 8.0
    val lshOld = recall(neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 8, 64, 4)))
    val lshN = neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 5, 64, 8))
    val lshNew = recall(lshN)
    val ivfSeed = recall(neighbors(
      Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 3, trainIters = 0)))
    val ivfTrained = recall(neighbors(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 3)))
    info(f"recall@5: srp 4x8bit=$lshOld%.2f srp 8x5bit=$lshNew%.2f " +
      f"ivf seed=$ivfSeed%.2f ivf trained(2 rounds)=$ivfTrained%.2f")
    // measured round 4 (sf0.001): srp 0.30 -> 0.63; ivf trained 0.92 vs
    // seed 0.98. On THIS corpus (near-uniform random vectors) Lloyd
    // rounds have no cluster structure to learn, so training is
    // recall-neutral; the probe width is the recall lever. Trained
    // cells stay the production path because clustered real corpora
    // are where IVF earns its keep — the spec pins both figures so a
    // regression in either mechanism surfaces.
    assert(lshNew > lshOld + 0.2,
      f"wider SRP config must clearly beat 4x8bit: $lshNew%.2f vs $lshOld%.2f")
    assert(lshNew >= 0.5, f"8x5-bit SRP recall regressed: $lshNew%.2f")
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
}
