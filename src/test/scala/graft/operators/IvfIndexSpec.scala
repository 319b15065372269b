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

  // ------------------------------------------------------------------
  // Incremental maintenance (round-7 ask): appends assign to the frozen
  // centroids and land in the bucketed table — no retrain, no rescan of
  // the existing corpus — and a probe over the appended index must
  // equal a probe over a frozen-centroid rebuild of the union corpus.
  // ------------------------------------------------------------------

  private lazy val appended: Unit = {
    built // trains ivf_cent on the full corpus; we rebuild assignments
    // base = first ~3/4 of the corpus, then two appended batches
    Similarity.rebuildIvfAssignments(spark, "ivf_cent", "ivf_assign_inc",
      emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding")
    Similarity.appendIvfIndex(spark, "ivf_cent", "ivf_assign_inc",
      emb.filter(col("vec_id") % 8 === 0), "vec_id", "embedding", gen = 1)
    Similarity.appendIvfIndex(spark, "ivf_cent", "ivf_assign_inc",
      emb.filter(col("vec_id") % 8 === 4), "vec_id", "embedding", gen = 2)
  }

  test("probe after N appended batches == frozen-centroid rebuild probe") {
    appended
    Similarity.rebuildIvfAssignments(spark, "ivf_cent", "ivf_assign_full",
      emb, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 8)
    val got = Similarity.probeIvfIndex(spark, "ivf_cent", "ivf_assign_inc",
      queries, "vec_id", "embedding", k = 5, nProbe = 3).collect().toSet
    val want = Similarity.probeIvfIndex(spark, "ivf_cent", "ivf_assign_full",
      queries, "vec_id", "embedding", k = 5, nProbe = 3).collect().toSet
    assert(got == want, "appends must converge to the rebuilt index")
  }

  test("an append reads only the batch and the centroid table — never the index") {
    appended
    // the no-full-corpus-rescan guarantee, pinned on the plan: the
    // assignment frame an append writes scans NOTHING but the batch
    // rows and the tiny centroid table
    val plan = Similarity.assignToFrozenCells(spark, "ivf_cent",
      emb.filter(col("vec_id") % 8 === 0), "vec_id", "embedding", gen = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ivf_assign"),
      s"append path must not read the assignment table:\n$plan")
  }

  test("appends preserve the bucketed-scan probe property") {
    appended
    val queries = emb.filter(col("vec_id") < 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Similarity.probeIvfIndex(spark, "ivf_cent", "ivf_assign_inc",
        queries, "vec_id", "embedding", k = 5, nProbe = 3,
        broadcastProbes = false).queryExecution.executedPlan.toString
      val cellExchanges = "Exchange hashpartitioning\\(cell".r
        .findAllIn(plan).size
      assert(cellExchanges == 1,
        s"appended index must still join in place (found $cellExchanges):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compaction: file count drops to nBuckets, rows/gens/probes identical") {
    appended
    val before = spark.table("ivf_assign_inc").inputFiles.length
    val rowsBefore = spark.table("ivf_assign_inc")
      .select("neighbor_id", "cell", "gen").collect().toSet
    val queries = emb.filter(col("vec_id") < 8)
    val probeBefore = Similarity.probeIvfIndex(spark, "ivf_cent",
      "ivf_assign_inc", queries, "vec_id", "embedding", k = 5, nProbe = 3)
      .collect().toSet
    val after = Similarity.compactIvfIndex(spark, "ivf_assign_inc")
    // writerTasks=1 -> one file per NON-EMPTY bucket (16 cells hashed
    // into 8 buckets can leave a bucket empty)
    val nonEmptyBuckets = spark.table("ivf_assign_inc")
      .selectExpr("pmod(hash(cell), 8) AS b").distinct().count()
    assert(after == nonEmptyBuckets,
      s"one file per non-empty bucket: files=$after buckets=$nonEmptyBuckets")
    assert(after <= 8L && after < before,
      s"compaction must shrink the file count ($before -> $after)")
    assert(spark.table("ivf_assign_inc")
      .select("neighbor_id", "cell", "gen").collect().toSet == rowsBefore)
    assert(Similarity.probeIvfIndex(spark, "ivf_cent", "ivf_assign_inc",
      queries, "vec_id", "embedding", k = 5, nProbe = 3)
      .collect().toSet == probeBefore)
  }

  test("staleness metric: integer bp share of post-training rows") {
    appended
    val base = emb.filter(col("vec_id") % 4 =!= 0).count()
    val b1 = emb.filter(col("vec_id") % 8 === 0).count()
    val b2 = emb.filter(col("vec_id") % 8 === 4).count()
    val row = Similarity.ivfIndexStaleness(spark, "ivf_assign_inc").head()
    assert(row.getLong(0) == base + b1 + b2)
    assert(row.getLong(1) == b1 + b2)
    assert(row.getLong(2) == 2L) // latest generation
    assert(row.getLong(3) == (b1 + b2) * 10000 / (base + b1 + b2))
  }
}
