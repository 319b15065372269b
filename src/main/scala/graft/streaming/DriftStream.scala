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

  /** The log's schema — needed to answer reads that arrive BEFORE the
    * first micro-batch commits (no parquet directory yet): the monitor
    * is simply empty, not broken. Derived from [[DriftStat.histogram]]
    * itself (plus the two tag columns [[start]] appends), so a
    * histogram schema change cannot silently diverge empty-log reads
    * from real-log reads. */
  private def logSchema(spark: SparkSession): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("ts", TimestampType),
        StructField("event_type", StringType),
        StructField("value", DoubleType))))
    DriftStat.histogram(emptyEvents).schema
      .add(StructField("__batch", LongType))
      .add(StructField("__covers", LongType))
  }

  private def logExists(spark: SparkSession, outDir: String): Boolean = {
    val dir = new Path(logDir(outDir))
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dir)
  }

  /** The live slice of the log — max-covers snapshot (if any) plus
    * raw deltas past it — collapsed against replays. A monitor whose
    * first batch has not committed yet reads as EMPTY (no log dir ->
    * empty frame), not as an AnalysisException. */
  private def active(spark: SparkSession, outDir: String): DataFrame = {
    if (!logExists(spark, outDir))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], logSchema(spark))
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

  /** Fold the fully-committed prefix of the live slice into one
    * snapshot, then garbage-collect the superseded files. Returns the
    * number of files collected (0 when there is nothing safe to fold).
    *
    * SAFE CONCURRENTLY WITH A RUNNING STREAM: the max observed raw
    * batch N may be MID-COMMIT — some of its part files visible, some
    * still landing — so folding it as covered would permanently hide
    * the late files (their rows carry `__batch = N`, not `> N`). The
    * snapshot therefore covers only `max(N - 1, max snapshot covers)`
    * — every batch below the max observed is fully committed, because
    * foreachBatch epochs commit in order — and batch N's visible rows
    * are CARRIED FORWARD verbatim: late-landing files stay additive,
    * and an at-least-once replay of batch N appends rows byte-equal
    * to the carried copies, which [[active]]'s distinct collapses. */
  def compactLog(spark: SparkSession, outDir: String): Long = {
    if (!logExists(spark, outDir)) return 0L
    val dir = new Path(logDir(outDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
    if (before.isEmpty) return 0L
    val live = active(spark, outDir)
    val bounds = live.agg(max(col("__covers")),
      max(when(col("__covers").isNull, col("__batch")))).head()
    val snapC = if (bounds.isNullAt(0)) -1L else bounds.getLong(0)
    // no raw rows (e.g. a freshly-compacted log holds only the
    // snapshot): the snapshot's reach IS the fold bound — subtracting
    // from a sentinel here would wrap to Long.MaxValue and poison
    // __covers, permanently hiding every future micro-batch
    val covers =
      if (bounds.isNullAt(1)) snapC
      else math.max(snapC, bounds.getLong(1) - 1L)
    if (covers < 0) return 0L // nothing provably fully committed yet
    val fold = live.filter(col("__covers").isNotNull || col("__batch") <= covers)
      .groupBy(col("week"), col("cents"))
      .agg(sum(col("cp")).as("cp"), sum(col("cc")).as("cc"))
      .withColumn("__batch", lit(covers))
      .withColumn("__covers", lit(covers))
    val carry = live.filter(col("__covers").isNull && col("__batch") > covers)
    fold.unionByName(carry)
      .coalesce(1)
      .write.mode("append").parquet(logDir(outDir))
    before.foreach(f => fs.delete(f.getPath, false))
    before.length.toLong
  }
}
