package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val built: Unit = Similarity.buildIvfIndex(
    emb, "vec_id", "embedding", nCells = 16, trainIters = 2, dim = 64,
    centTable = "ivf_cent", assignTable = "ivf_assign")

  test("persisted index probe == in-memory ivfTopK, both probe paths") {
    built
    val queries = emb.filter(col("vec_id") < 8)
    val want = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 3, trainIters = 2, dim = 64)
      .collect().toSet
    for (bc <- Seq(true, false)) {
      val got = Similarity.probeIvfIndex(spark, "ivf_cent", "ivf_assign",
        queries, "vec_id", "embedding", k = 5, nProbe = 3,
        broadcastProbes = bc).collect().toSet
      assert(got == want, s"broadcastProbes=$bc diverged")
    }
  }

  test("batch probe path: assignment scan joins in place, probe side shuffles") {
    built
    val queries = emb.filter(col("vec_id") < 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Similarity.probeIvfIndex(spark, "ivf_cent", "ivf_assign",
        queries, "vec_id", "embedding", k = 5, nProbe = 3,
        broadcastProbes = false).queryExecution.executedPlan.toString
      val cellExchanges = "Exchange hashpartitioning\\(cell".r
        .findAllIn(plan).size
      assert(cellExchanges == 1,
        s"only the probe side may exchange on cell (found $cellExchanges):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rebuilding the index is idempotent (frozen centroid table)") {
    built
    val before = spark.table("ivf_assign")
      .select("neighbor_id", "cell").collect().toSet
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nCells = 16, trainIters = 2, dim = 64,
      centTable = "ivf_cent", assignTable = "ivf_assign")
    val after = spark.table("ivf_assign")
      .select("neighbor_id", "cell").collect().toSet
    assert(before == after)
  }
}
