package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The full training-data path across modules: opaque payloads ->
  * batched embedding at the codec seam -> ANN over the vectors. */
class MultimodalAnnSpec extends SparkSpec {
  import spark.implicits._

  test("payload -> embedding -> brute-force ANN finds the planted duplicate") {
    val base = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    // plant an exact duplicate of doc 0's text under a fresh id
    val dupId = 100000L
    val planted = base.select("doc_id", "text").unionByName(
      base.filter(col("doc_id") === 0).select(lit(dupId).as("doc_id"), col("text")))

    val withPayload = Multimodal.attachPayload(planted, "doc_id", "text")
    val vecs = Multimodal.embedPayload(withPayload, "doc_id", dim = 64)
    assert(vecs.count() == 51)

    // unit vectors: |v| == 1
    val norms = vecs.select(
      Similarity.dotD(Similarity.toDouble(col("embedding")),
        Similarity.toDouble(col("embedding"))).as("n2")).collect()
    assert(norms.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-5))

    val top = Similarity.bruteForceTopK(
      vecs, vecs.filter(col("id") === 0), "id", "embedding", k = 2)
      .orderBy("rank").collect()
    // rank 1 = self (cos 1), rank 2 = the planted duplicate (cos 1)
    assert(top(0).getAs[Long]("neighbor_id") == 0L)
    assert(top(1).getAs[Long]("neighbor_id") == dupId)
    assert(math.abs(top(1).getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("embedding is deterministic and content-sensitive") {
    val df = Seq((1L, "abcabc"), (2L, "abcabc"), (3L, "zzzzzz"))
      .toDF("doc_id", "text")
    val vecs = Multimodal.embedPayload(
      Multimodal.attachPayload(df, "doc_id", "text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L) == vecs(2L))
    assert(vecs(1L) != vecs(3L))
  }
}
