package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Characterization of the PQ-ADC path (q125) against the exact
  * baseline: measured recall, the self-retrieval bound (a query's own
  * code attains the minimum possible ADC distance — per-subspace argmin
  * — so the query can never fall out of its own top-k unless > k-1
  * vectors tie it), and that the Lloyd round does not hurt recall on
  * the harness corpus. */
class PqSpec extends SparkSpec {

  private lazy val e = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val q = e.filter(col("vec_id") < 8)

  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq)
      .toMap

  test("PQ-ADC recall@5 vs exact: measured figures hold; self never lost") {
    val exact = neighbors(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    def recall(a: Map[Long, Seq[Long]]): Double =
      (0L until 8L).map(id =>
        a.getOrElse(id, Nil).toSet.intersect(exact(id).toSet).size / 5.0).sum / 8
    val pq0 = neighbors(Similarity.pqTopK(e, q, "vec_id", "embedding", 5, 4, 8, 64, lloydIters = 0))
    val pq1 = neighbors(Similarity.pqTopK(e, q, "vec_id", "embedding", 5, 4, 8, 64, lloydIters = 1))
    val pqa = neighbors(Similarity.pqTopK(e, q, "vec_id", "embedding", 5, 8, 16, 64, lloydIters = 1))
    val pqb = neighbors(Similarity.pqTopK(e, q, "vec_id", "embedding", 5, 16, 16, 64, lloydIters = 1))
    val pqd = neighbors(Similarity.pqTopK(e, q, "vec_id", "embedding", 5, 8, 64, 64, lloydIters = 1))
    // the q125 production config: ADC shortlist@50 + exact re-rank
    val rr = neighbors(Similarity.pqTopK(e, q, "vec_id", "embedding", 5, 16, 16, 64,
      lloydIters = 1, rerankPool = 50))
    val (r0, r1) = (recall(pq0), recall(pq1))
    info(f"recall@5: pq m=4 ksub=8 seed=$r0%.2f 1-lloyd=$r1%.2f")
    info(f"recall@5: pq m=8 ksub=16=${recall(pqa)}%.2f m=16 ksub=16=${recall(pqb)}%.2f m=8 ksub=64=${recall(pqd)}%.2f")
    info(f"recall@5: q125 config (m=16 ksub=16, rerank pool 50) = ${recall(rr)}%.2f")
    // measured: raw ADC plateaus at 0.25-0.40 on this uniform corpus
    // (no cluster structure for codebooks to learn — the same floor
    // trained IVF hits, AnnRecallSpec), while the re-ranked pipeline
    // reaches 0.90: shortlist coverage, not code resolution, is what
    // the pool size buys.
    assert(recall(rr) >= 0.89, f"re-ranked PQ recall regressed: ${recall(rr)}%.2f")
    (0L until 8L).foreach { id =>
      assert(rr(id).head == id, s"re-ranked PQ must put query $id first (cos=1)")
    }
    // a query's own code attains the minimum possible ADC distance
    // (per-subspace argmin), so raw ADC can never lose the query itself
    (0L until 8L).foreach { id =>
      assert(pq1(id).contains(id), s"PQ query $id fell out of its own top-5")
    }
  }

  test("PQ recall is high where cluster structure exists") {
    import spark.implicits._
    // same deterministic clustered corpus as AnnRecallSpec: 16
    // hash-derived centers, 400 points in cluster-major order
    def u(s: String): Double = (graft.functions.Portable.pmd5Local(s) % 2000 - 1000) / 1000.0
    val k = 16; val dim = 64
    val centers = Array.tabulate(k, dim)((j, i) => u(s"c$j,$i"))
    val rows = (0 until 400).map { t =>
      val c = centers(t / 25)
      (t.toLong, (0 until dim).map(i => c(i) + 0.25 * u(s"n$t,$i")))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)
    val exact = neighbors(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    def recall(a: Map[Long, Seq[Long]]): Double =
      (0L until 8L).map(id =>
        a.getOrElse(id, Nil).toSet.intersect(exact(id).toSet).size / 5.0).sum / 8
    val r = recall(neighbors(
      Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5, 4, 8, dim, lloydIters = 1)))
    val rr = recall(neighbors(
      Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5, 16, 16, dim,
        lloydIters = 1, rerankPool = 50)))
    info(f"clustered corpus: raw ADC m=4 ksub=8 = $r%.2f; q125 config (rerank) = $rr%.2f")
    // measured: raw ADC 0.33 — whole clusters collapse to one code and
    // tie (PQ cannot rank inside a Voronoi cell); the re-rank resolves
    // every tie exactly: 1.00
    assert(rr >= 0.95, f"re-ranked PQ recall on clustered data regressed: $rr%.2f")
  }

  test("IVF-PQ: coarse pruning costs bounded recall; self never lost") {
    val exact = neighbors(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    def recall(a: Map[Long, Seq[Long]]): Double =
      (0L until 8L).map(id =>
        a.getOrElse(id, Nil).toSet.intersect(exact(id).toSet).size / 5.0).sum / 8
    // the q150 production config vs the same PQ without coarse pruning
    val full = neighbors(Similarity.pqTopK(e, q, "vec_id", "embedding",
      5, 16, 16, 64, lloydIters = 1, rerankPool = 50))
    val ivfpq = neighbors(Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      5, 16, 3, 16, 16, 64, trainIters = 2, lloydIters = 1, rerankPool = 50))
    val (rFull, rIvf) = (recall(full), recall(ivfpq))
    info(f"recall@5: full-corpus PQ+rerank = $rFull%.2f; IVF(3/16 cells)+PQ+rerank = $rIvf%.2f")
    // pruning can only shrink the candidate set, never reorder survivors
    // (the re-rank is exact): IVF-PQ recall is bounded by the full scan's
    assert(rIvf <= rFull + 1e-9, "pruned recall cannot exceed the full ADC scan")
    // measured: 0.70 vs 0.90 full — the uniform corpus again (no cell
    // structure to learn, the documented q44/PqSpec floor; scanning
    // 3/16 of the corpus keeps 78% of the full pipeline's recall).
    // A regression below this means the composition broke, not noise:
    // every stage is deterministic.
    assert(rIvf >= 0.69, f"IVF-PQ recall regressed: $rIvf%.2f")
    // a query is always assigned to one of its own probed cells
    // (crank 1 of nProbe), so it is always its own candidate, and the
    // exact re-rank puts it first (cos = 1)
    (0L until 8L).foreach { id =>
      assert(ivfpq(id).head == id, s"IVF-PQ must put query $id first (cos=1)")
    }
  }
}
