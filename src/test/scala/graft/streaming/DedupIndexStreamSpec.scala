package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming LSH band index vs its batch twin: after any prefix of the
  * stream, the index-recovered candidate pairs must equal batch
  * lshCandidates over every document seen — intra-batch AND
  * cross-batch pairs (the point of the index: a new batch dedups
  * against everything seen without re-reading old text). Band rows
  * are set facts, so duplicate appends must be absorbed, and
  * compaction must not change the pair universe. */
class DedupIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  // q28's published family, restated for the twin
  private val K = 16
  private val RPB = 4
  private val NB = K / RPB
  private val SHINGLE = 3

  /** Docs 0..499 and 500..999: ids with base % 7 == 0 share a full
    * template with their +500 partner (guaranteed near-dup across the
    * batch split); everything else is unique noise. */
  private def rows(ids: Range): Seq[(Long, String)] =
    ids.map { i =>
      val base = i % 500
      val words =
        if (base % 7 == 0) (0 until 12).map(w => s"tpl${base}w$w")
        else (0 until 12).map(w => s"doc${i}w$w")
      (i.toLong, words.mkString(" "))
    }

  private def toDf(rs: Seq[(Long, String)]): DataFrame =
    rs.toDF("doc_id", "text")

  private def stage(root: Path, name: String, rs: Seq[(Long, String)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    toDf(rs).coalesce(1).write.parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve("in").resolve(s"$name.parquet"))
  }

  private def runOnce(root: Path, out: String, cp: String): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(root.resolve("in").toString)
    val q = DedupIndexStream.start(stream, out, cp)
    assert(q.awaitTermination(120000), "dedup index stream did not finish")
  }

  private def batchTwin(rs: Seq[(Long, String)]): Set[(Long, Long)] = {
    val got = Dedup.lshCandidates(
      Dedup.bandKeys(Dedup.minhashSignature(toDf(rs), "text", K, SHINGLE),
        K, RPB), "doc_id", NB)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    got
  }

  private def streamed(out: String): Set[(Long, Long)] = {
    val got = DedupIndexStream.candidates(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    got
  }

  test("index candidates == batch twin after each prefix; cross-batch dups surface; compaction and replay preserve them") {
    val root = Files.createTempDirectory("dedup-index-stream")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString

    // before the first commit: empty candidates, 0-file compaction
    assert(DedupIndexStream.candidates(spark, out).collect().isEmpty)
    assert(DedupIndexStream.compactLog(spark, out) == 0L)

    val b1 = rows(0 until 500)
    val b2 = rows(500 until 1000)

    stage(root, "a", b1)
    runOnce(root, out, cp)
    assert(streamed(out) == batchTwin(b1), "prefix 1 diverged")

    stage(root, "b", b2)
    runOnce(root, out, cp)
    val full = batchTwin(b1 ++ b2)
    assert(streamed(out) == full, "full stream diverged")
    // the planted CROSS-BATCH template pairs are found without any
    // re-banding of batch 1's text
    assert((0 until 500 by 7).forall(b => full.contains((b.toLong, (b + 500).toLong))),
      "planted cross-batch near-dups missing from the twin")
    assert(streamed(out).contains((0L, 500L)),
      "index failed to pair a batch-1 doc with its batch-2 duplicate")

    // duplicate append (at-least-once replay of epoch 0): set facts
    // collapse under the reader's distinct
    DedupIndexStream.bandRows(toDf(b1))
      .withColumn("__batch", lit(0L))
      .write.mode("append").parquet(DedupIndexStream.logDir(out))
    assert(streamed(out) == full, "replayed epoch changed the pair universe")

    // compaction rewrites to one generation; pairs unchanged; a batch
    // after compaction still lands. The rewrite is PARTITIONED — file
    // count scales with pre-compaction byte size (max(1, bytes/128MB)),
    // never a hardcoded single file (the index is corpus-sized).
    val logPath = new java.io.File(DedupIndexStream.logDir(out))
    def logFiles() = logPath.listFiles().filter(_.getName.endsWith(".parquet"))
    val expectFiles = math.max(1L, logFiles().map(_.length).sum / (128L << 20))
    val removed = DedupIndexStream.compactLog(spark, out)
    assert(removed >= 2, s"expected multiple log files compacted, got $removed")
    assert(logFiles().length == expectFiles,
      s"compacted file count ${logFiles().length} != size-scaled $expectFiles")
    assert(streamed(out) == full, "compaction changed the pair universe")

    val b3 = rows(1000 until 1100).map { case (id, t) => (id, t) }
    stage(root, "c", b3)
    runOnce(root, out, cp)
    assert(streamed(out) == batchTwin(b1 ++ b2 ++ b3),
      "post-compaction append diverged")
  }

  test("template flood: capped read bounds the candidate join, equals the capped batch twin, and reports the excluded buckets") {
    val root = Files.createTempDirectory("dedup-index-flood")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString

    // 200 docs of ONE template (every band bucket they touch holds all
    // 200 — the training-ingest saturation shape), 90 unique-noise
    // docs, and 10 planted near-dup pairs that must SURVIVE the cap
    val flood = (0 until 200).map(i =>
      (i.toLong, (0 until 12).map(w => s"boilerplate$w").mkString(" ")))
    val noise = (200 until 290).map(i =>
      (i.toLong, (0 until 12).map(w => s"doc${i}w$w").mkString(" ")))
    val planted = (300 until 310).flatMap { i =>
      val t = (0 until 12).map(w => s"pair${i}w$w").mkString(" ")
      Seq((i.toLong, t), ((i + 100).toLong, t))
    }
    val all = flood ++ noise ++ planted
    stage(root, "flood", all)
    val q = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(root.resolve("in").toString)
    val sq = DedupIndexStream.start(q, out, cp)
    assert(sq.awaitTermination(120000), "flood index stream did not finish")

    val cap = 50
    // capped stream read == capped batch twin over the same corpus
    val cappedBatch = Dedup.lshCandidatesCapped(
      Dedup.bandKeys(Dedup.minhashSignature(toDf(all), "text", K, SHINGLE),
        K, RPB), "doc_id", NB, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    graft.operators.ObservedWarn.clearFired("dedup_index_hot_buckets")
    val cappedStream = DedupIndexStream.candidates(spark, out, Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(cappedStream == cappedBatch, "capped stream != capped batch twin")
    // bounded: the 200-doc flood contributes NO pairs; planted pairs survive
    assert(cappedStream.size < 200,
      s"flood pairs leaked through the cap (${cappedStream.size})")
    assert((300 until 310).forall(i =>
      cappedStream.contains((i.toLong, (i + 100).toLong))),
      "planted near-dup pairs lost to the cap")

    // no silent caps: the excluded-bucket count fired via ObservedWarn
    // with exactly the independently-counted hot-bucket population
    val expectedHot = spark.read.parquet(DedupIndexStream.logDir(out))
      .select(col("doc_id"), col("band"), col("key")).distinct()
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("p"))
      .filter(col("p") > cap).count()
    assert(expectedHot > 0, "fixture failed to saturate any bucket")
    val deadline = System.nanoTime() + 10_000_000_000L
    var firedN = graft.operators.ObservedWarn.lastFired("dedup_index_hot_buckets")
    while (firedN.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      firedN = graft.operators.ObservedWarn.lastFired("dedup_index_hot_buckets")
    }
    assert(firedN.contains(expectedHot),
      s"hot-bucket metric fired $firedN, expected Some($expectedHot)")

    // and the UNCAPPED read still equals the exact batch twin (the
    // default stays exact; the cap is an explicit opt-in)
    assert(streamed(out) == batchTwin(all), "uncapped flood read diverged")

    // cross-table decontamination read: an eval set (one planted-pair
    // twin, one flood clone, one fresh doc) probed against the
    // standing index — equals batch lshCandidatesAcross over
    // (everything indexed, eval); the training text is never re-read
    val evalRows = Seq(
      (9000L, (0 until 12).map(w => s"pair300w$w").mkString(" ")),
      (9001L, (0 until 12).map(w => s"boilerplate$w").mkString(" ")),
      (9002L, (0 until 12).map(w => s"fresh${"x"}w$w").mkString(" ")))
    def banded(rs: Seq[(Long, String)]) =
      Dedup.bandKeys(Dedup.minhashSignature(toDf(rs), "text", K, SHINGLE),
        K, RPB)
    val acrossBatch = Dedup.lshCandidatesAcross(
      banded(all), banded(evalRows), "doc_id", NB)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val acrossStream = DedupIndexStream.candidatesAcross(
      spark, out, toDf(evalRows))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(acrossStream == acrossBatch, "cross-table read != batch twin")
    assert(acrossStream.contains((300L, 9000L)) &&
      acrossStream.contains((400L, 9000L)),
      "eval twin must hit both planted training docs")
    assert(!acrossStream.exists(_._2 == 9002L), "fresh eval doc must miss")

    // capped: the flood buckets drop, the planted hit survives
    graft.operators.ObservedWarn.clearFired("dedup_index_hot_buckets_across")
    val acrossCapped = DedupIndexStream.candidatesAcross(
      spark, out, toDf(evalRows), Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(acrossCapped.contains((300L, 9000L)),
      "planted decon hit lost to the cap")
    assert(!acrossCapped.exists(_._2 == 9001L),
      "flood-clone eval doc must produce no pairs under the cap")
    val deadline2 = System.nanoTime() + 10_000_000_000L
    var fired2 = graft.operators.ObservedWarn
      .lastFired("dedup_index_hot_buckets_across")
    while (fired2.isEmpty && System.nanoTime() < deadline2) {
      Thread.sleep(50)
      fired2 = graft.operators.ObservedWarn
        .lastFired("dedup_index_hot_buckets_across")
    }
    assert(fired2.contains(expectedHot),
      s"across cap metric fired $fired2, expected Some($expectedHot)")
  }
}
