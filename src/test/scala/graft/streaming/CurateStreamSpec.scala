package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Curate

/** Streaming curation over arriving document files: per-batch gating +
  * dedup, cross-batch/cross-restart content idempotence via the sink
  * anti-join. */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on a warm mat near the door of the house"
  private val other =
    "a completely different long document describing how the spark engine shuffles data between partitions during a wide transformation of the corpus"
  private val third =
    "yet another unique piece of text that talks at length about how a streaming query lands curated batches into the corpus sink over time"

  test("per-batch curation + cross-batch exact dedup across a restart") {
    val root = java.nio.file.Files.createTempDirectory("curate-stream")
    val in = root.resolve("in"); java.nio.file.Files.createDirectories(in)
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    val cfg = Curate.Config(minQuality = 0.4, nearDupThreshold = 0.7)

    def stage(name: String, rows: Seq[(Long, String)]): Unit = {
      val scratch = root.resolve(s"scratch_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, in.resolve(s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in.toString)
      val q = CurateStream.start(stream, "text", "doc_id", out, cp, cfg)
      assert(q.awaitTermination(120000), "curation stream did not finish")
    }

    // batch 1: exact dup pair, a near-dup, a junk doc, one clean doc
    stage("a", Seq(
      (0L, good), (1L, good),                    // exact dup inside the batch
      (2L, good.replace("warm", "cold")),        // near dup inside the batch
      (3L, "the a the a the a"),                 // quality-gated
      (4L, other)))
    runOnce()
    val afterA = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(afterA == Set(0L, 4L), s"batch A curation wrong: $afterA")

    // batch 2 (separate stream run = restart): a cross-batch exact dup
    // of doc 0, an in-batch dup pair, and a fresh doc
    stage("b", Seq(
      (7L, good),                                // exact dup of landed doc 0
      (8L, third), (9L, third),                  // in-batch exact dup pair
      (10L, other)))                             // exact dup of landed doc 4
    runOnce()

    val landed = spark.read.parquet(out)
    val ids = landed.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 4L, 8L), s"cross-batch dedup wrong: $ids")
    // content idempotence: no text hash lands twice
    val dupHashes = landed
      .groupBy(graft.functions.Portable.pmd5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupHashes == 0, "duplicate content in the sink")
    // and the landed set equals batch curation of all distinct content
    val batchAll = Curate(
      Seq((0L, good), (2L, good.replace("warm", "cold")),
        (3L, "the a the a the a"), (4L, other), (8L, third))
        .toDF("doc_id", "text"),
      "text", "doc_id", cfg)
      .select("text").as[String].collect().toSet
    assert(landed.select("text").as[String].collect().toSet == batchAll)
  }
}
