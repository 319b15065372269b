package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Streaming IVF maintenance: arriving embedding batches append to the
  * persisted index against frozen centroids, converge to the
  * frozen-centroid rebuild, survive a full checkpoint-loss replay
  * without duplicating rows, and keep the incremental staleness log
  * exact. */
class AnnIndexStreamSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Stage each batch as its own file so maxFilesPerTrigger=1 yields
    * one micro-batch per staged file. */
  private def stage(root: Path, name: String,
      rows: org.apache.spark.sql.DataFrame): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    rows.coalesce(1).write.parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve("in").resolve(s"$name.parquet"))
  }

  private def runOnce(root: Path, cp: String): Unit = {
    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root.resolve("in").toString)
    val q = AnnIndexStream.start(stream, "vec_id", "embedding",
      "anncent", "annassign", cp)
    assert(q.awaitTermination(120000), "append stream did not finish")
  }

  private lazy val streamed: Path = {
    val root = Files.createTempDirectory("ann-index-stream")
    Files.createDirectories(root.resolve("in"))
    // offline: train centroids on the full corpus, build the index over
    // the base 3/4 — the stream then appends the remaining quarter
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nCells = 16, trainIters = 2, dim = 64,
      centTable = "anncent", assignTable = "annassign")
    Similarity.rebuildIvfAssignments(spark, "anncent", "annassign",
      emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding")
    stage(root, "b0", emb.filter(col("vec_id") % 8 === 0))
    stage(root, "b1", emb.filter(col("vec_id") % 8 === 4))
    runOnce(root, root.resolve("cp").toString)
    root
  }

  test("streamed appends converge to the frozen-centroid rebuild") {
    streamed
    Similarity.rebuildIvfAssignments(spark, "anncent", "annassign_ref",
      emb, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 8)
    val got = Similarity.probeIvfIndex(spark, "anncent", "annassign",
      queries, "vec_id", "embedding", k = 5, nProbe = 3).collect().toSet
    val want = Similarity.probeIvfIndex(spark, "anncent", "annassign_ref",
      queries, "vec_id", "embedding", k = 5, nProbe = 3).collect().toSet
    assert(got == want)
  }

  test("staleness log is incremental, integer-exact and monotone") {
    streamed
    val base = emb.filter(col("vec_id") % 4 =!= 0).count()
    val b0 = emb.filter(col("vec_id") % 8 === 0).count()
    val b1 = emb.filter(col("vec_id") % 8 === 4).count()
    val rows = spark.table(AnnIndexStream.stalenessTable("annassign"))
      .orderBy("batch_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == base + b0 && rows(0).getLong(2) == b0)
    assert(rows(1).getLong(1) == base + b0 + b1 && rows(1).getLong(2) == b0 + b1)
    assert(rows(1).getLong(3) == (b0 + b1) * 10000 / (base + b0 + b1))
  }

  test("full checkpoint-loss replay appends nothing (gen-slice anti-join)") {
    streamed
    val before = spark.table("annassign").count()
    val beforeSet = spark.table("annassign")
      .select("neighbor_id", "cell", "gen").collect().toSet
    // lose the checkpoint: every input file replays from batch 0, in
    // whatever grouping the fresh run picks — the guard must hold
    // regardless because every replayed row's gen is >= the new gen
    runOnce(streamed, streamed.resolve("cp2").toString)
    val after = spark.table("annassign")
      .select("neighbor_id", "cell", "gen").collect().toSet
    assert(spark.table("annassign").count() == before)
    assert(after == beforeSet)
    // and the staleness log did not double-count (batch_id idempotence)
    val st = spark.table(AnnIndexStream.stalenessTable("annassign"))
    assert(st.count() == st.select("batch_id").distinct().count())
  }
}
