package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DriftStat

/** Streaming drift monitor vs its batch twin: after any prefix of the
  * stream, merging the logged histogram deltas must equal running the
  * batch statistics over every event seen (histograms add; both norms
  * are exact functions of the merged histogram) — and because the
  * summary is ADDITIVE, the replay and compaction-crash cases are the
  * ones that matter: a duplicate that survives double-counts. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, day-of-jan-2024, type, value) slices with purchases
    * and clicks drifting apart over the weeks, plus noise types. */
  private def rows(ids: Range): Seq[(Long, Int, String, Double)] =
    ids.map { i =>
      val day = 1 + (i % 21) // weeks 0..2
      val kind = i % 4 match {
        case 0 => "purchase"
        case 1 => "click"
        case 2 => "view"
        case _ => if (i % 8 == 3) "purchase" else "click"
      }
      val v = kind match {
        case "purchase" => 1.0 + (i % 13) + day * 0.25
        case "click" => 2.0 + (i % 17) + day * 0.75
        case _ => 99.99
      }
      (i.toLong, day, kind, v)
    }

  private def toDf(rs: Seq[(Long, Int, String, Double)]): DataFrame =
    rs.toDF("event_id", "day", "event_type", "value")
      .withColumn("ts", to_timestamp(
        concat(lit("2024-01-"), lpad(col("day").cast("string"), 2, "0"),
          lit(" 12:00:00"))))
      .select("event_id", "ts", "event_type", "value")

  private def stage(root: Path, name: String, rs: Seq[(Long, Int, String, Double)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    toDf(rs).coalesce(1).write.parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve("in").resolve(s"$name.parquet"))
  }

  private def runOnce(root: Path, out: String, cp: String): Unit = {
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(root.resolve("in").toString)
    val q = DriftStream.start(stream, out, cp)
    assert(q.awaitTermination(120000), "drift stream did not finish")
  }

  private def batchTwin(rs: Seq[(Long, Int, String, Double)]): Set[(Long, Long, Long, Long, Long)] =
    DriftStat.stats(DriftStat.histogram(toDf(rs))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  private def streamed(out: String): Set[(Long, Long, Long, Long, Long)] =
    DriftStream.stats(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("monitor == batch twin after each streamed prefix; compaction preserves it") {
    val root = Files.createTempDirectory("drift-stream")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString

    val b1 = rows(0 until 120)
    val b2 = rows(120 until 260)
    val b3 = rows(260 until 400)

    stage(root, "a", b1)
    runOnce(root, out, cp)
    assert(streamed(out) == batchTwin(b1), "prefix 1 diverged")

    stage(root, "b", b2)
    stage(root, "c", b3)
    runOnce(root, out, cp)
    val full = batchTwin(b1 ++ b2 ++ b3)
    assert(streamed(out) == full, "full stream diverged")

    val removed = DriftStream.compactLog(spark, out)
    assert(removed >= 2, s"expected multiple log files compacted, got $removed")
    assert(streamed(out) == full, "compaction changed the statistics")

    // the stream continues AFTER a compaction: new deltas ride on top
    // of the snapshot
    val b4 = rows(400 until 520)
    stage(root, "d", b4)
    runOnce(root, out, cp)
    assert(streamed(out) == batchTwin(b1 ++ b2 ++ b3 ++ b4),
      "post-compaction append diverged")
  }

  test("additive log idempotence: epoch replay and a crashed compaction cannot double-count") {
    val root = Files.createTempDirectory("drift-replay")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString

    val b1 = rows(0 until 150)
    stage(root, "a", b1)
    runOnce(root, out, cp)
    val before = streamed(out)

    // at-least-once replay: foreachBatch re-runs the SAME epoch (id 0)
    // after a crash — the delta rows are byte-identical recomputations
    DriftStat.histogram(toDf(b1))
      .withColumn("__batch", lit(0L))
      .withColumn("__covers", lit(null).cast("long"))
      .write.mode("append").parquet(DriftStream.logDir(out))
    assert(streamed(out) == before, "replayed epoch double-counted")

    // crashed compaction: the snapshot LANDS but the GC never runs —
    // readers must switch to the snapshot and ignore the raw deltas it
    // covers, with no dependence on the delete step
    spark.read.parquet(DriftStream.logDir(out)).distinct()
      .groupBy(col("week"), col("cents"))
      .agg(sum(col("cp")).as("cp"), sum(col("cc")).as("cc"))
      .withColumn("__batch", lit(0L))
      .withColumn("__covers", lit(0L))
      .write.mode("append").parquet(DriftStream.logDir(out))
    assert(streamed(out) == before, "half-finished compaction double-counted")

    // and a RE-RUN of the crashed compaction (now folding the snapshot)
    // still converges to the same statistics
    DriftStream.compactLog(spark, out)
    assert(streamed(out) == before, "compaction re-run diverged")

    // the re-run left a SNAPSHOT-ONLY log (every raw delta folded) —
    // the exact state where a covers computed from a raw-row sentinel
    // would overflow to Long.MaxValue and hide every future batch.
    // Stream one more batch and demand the stats absorb it.
    val b2 = rows(150 until 300)
    stage(root, "b", b2)
    runOnce(root, out, cp)
    assert(streamed(out) == batchTwin(b1 ++ b2),
      "batch after a snapshot-only compaction vanished from the stats")
    // ... and a further compaction of that mixed snapshot+delta log
    // still folds, still preserves the statistics
    DriftStream.compactLog(spark, out)
    assert(streamed(out) == batchTwin(b1 ++ b2),
      "post-overflow-state compaction changed the statistics")
  }

  test("read and compact before the first commit: empty stats, zero files, no throw") {
    val root = Files.createTempDirectory("drift-empty")
    val out = root.resolve("out").toString
    assert(DriftStream.stats(spark, out).collect().isEmpty)
    assert(DriftStream.compactLog(spark, out) == 0L)
  }
}
