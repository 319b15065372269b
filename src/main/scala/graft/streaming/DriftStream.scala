package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.DriftStat

/** Streaming twin of q251/q252's drift statistics
  * ([[graft.operators.DriftStat]]): a continuous KS + Wasserstein-1
  * drift monitor over an UNBOUNDED event stream, maintained as an
  * append-only log of mergeable histogram deltas.
  *
  * Per micro-batch the stream appends ONLY the batch's own
  * (week, cents) count deltas — bounded by the batch's value support,
  * whatever the batch size — and the statistics are recovered at READ
  * time by merging: histograms add, and both drift norms are exact
  * functions of the merged histogram, so the stream result after any
  * prefix equals the batch queries over every event seen. Nothing
  * ever rescans the event history.
  *
  * An ADDITIVE summary is less forgiving than [[SampleStream]]'s
  * order statistics — a stray duplicate is not absorbed, it
  * double-counts — so the log carries an explicit idempotence
  * protocol:
  *
  *  - raw delta rows are deterministic functions of (batchId, its
  *    events) tagged `__batch` (`__covers` null): an at-least-once
  *    replay (foreachBatch re-runs the SAME epoch after a crash)
  *    appends byte-identical rows that [[stats]]' full-row distinct
  *    collapses;
  *  - compaction never mutates in place: it appends a SNAPSHOT
  *    (merged histogram tagged `__covers = C`, the largest batch it
  *    folds in) and only then garbage-collects older files. Readers
  *    take the max-covers snapshot plus raw deltas with
  *    `__batch > C` — so a crash ANYWHERE in compaction (snapshot
  *    landed / delete half-done / compact re-run) changes nothing: a
  *    re-run recomputes the identical snapshot (distinct collapses
  *    it) and superseded rows are ignored whether or not the GC
  *    finished. Correctness never depends on the delete step.
  */
object DriftStream {

  /** Append-only histogram-delta log for a monitor rooted at
    * `outDir`. */
  def logDir(outDir: String): String = outDir + "_driftlog"

  /** Start the monitor: per micro-batch, append the batch-local
    * (week, cents) histogram tagged with the epoch id. */
  def start(events: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      DriftStat.histogram(batch.toDF())
        .withColumn("__batch", lit(batchId))
        .withColumn("__covers", lit(null).cast("long"))
        .write.mode("append").parquet(logDir(outDir))
    }
    events.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The live slice of the log — max-covers snapshot (if any) plus
    * raw deltas past it — collapsed against replays. */
  private def active(spark: SparkSession, outDir: String): DataFrame = {
    val log = spark.read.parquet(logDir(outDir)).distinct()
    // the single scalar the reader needs: how far snapshots reach
    val covers = log.agg(max(col("__covers"))).head() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    log.filter(
      (col("__covers").isNotNull && col("__covers") === covers)
        || (col("__covers").isNull && col("__batch") > covers))
  }

  /** Current drift statistics: merge the live histogram by addition,
    * finish with the exact one-pass stats. Reads the log only —
    * bounded by batches x weeks x value support, never the event
    * history. */
  def stats(spark: SparkSession, outDir: String): DataFrame =
    DriftStat.stats(
      active(spark, outDir)
        .groupBy(col("week"), col("cents"))
        .agg(sum(col("cp")).as("cp"), sum(col("cc")).as("cc")))

  /** Fold the live slice into one snapshot, then garbage-collect the
    * superseded files. Returns the number of files collected. */
  def compactLog(spark: SparkSession, outDir: String): Long = {
    val dir = new Path(logDir(outDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
    val live = active(spark, outDir)
    // monotone: the largest batch (raw or already-snapshotted) folded in
    val covers = live.agg(max(coalesce(col("__covers"), col("__batch"))))
      .head().getLong(0)
    live
      .groupBy(col("week"), col("cents"))
      .agg(sum(col("cp")).as("cp"), sum(col("cc")).as("cc"))
      .withColumn("__batch", lit(covers))
      .withColumn("__covers", lit(covers))
      .coalesce(1)
      .write.mode("append").parquet(logDir(outDir))
    before.foreach(f => fs.delete(f.getPath, false))
    before.length.toLong
  }
}
