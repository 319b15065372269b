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
    val lsh = neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 8, 64, 4))
    val ivf = neighbors(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 2))
    (0L until 8L).foreach { id =>
      assert(lsh(id).head == id, s"LSH query $id lost itself")
      assert(ivf(id).head == id, s"IVF query $id lost itself")
    }
  }

  test("recall@5 vs the exact baseline is measurable and self-consistent") {
    val exact = neighbors(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val lsh = neighbors(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 8, 64, 4))
    val ivf = neighbors(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, 16, 2))
    def recall(approx: Map[Long, Seq[Long]]): Double =
      (0L until 8L).map(id => approx(id).toSet.intersect(exact(id).toSet).size / 5.0).sum / 8.0
    val (rl, ri) = (recall(lsh), recall(ivf))
    info(f"recall@5: srp-lsh(4 tables)=$rl%.2f ivf(nprobe=2)=$ri%.2f")
    // approximate results are always drawn from the true corpus and
    // include the self-match, so recall is bounded below by 1/5
    assert(rl >= 0.2 - 1e-9 && rl <= 1.0)
    assert(ri >= 0.2 - 1e-9 && ri <= 1.0)
    // relative order among SHARED neighbors must agree with the exact
    // ranking (LSH may skip exact neighbors absent from its candidates,
    // but never reorder the ones it found)
    (0L until 8L).foreach { id =>
      val sharedSet = lsh(id).toSet.intersect(exact(id).toSet)
      val lshOrder = lsh(id).filter(sharedSet)
      val exactOrder = exact(id).filter(sharedSet)
      assert(lshOrder == exactOrder,
        s"LSH reorders shared neighbors for query $id: $lshOrder vs $exactOrder")
    }
  }
}
