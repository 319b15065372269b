package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The append-only ADDITIVE-summary log protocol — the shared core of
  * [[DriftStream]] (per-(week, cents) count deltas) and
  * [[CusumStream]] (per-(type, day) cent-sum deltas), generic over
  * any summary whose rows are (keys..., sums...) and MERGE BY
  * ADDITION.
  *
  * Per micro-batch the stream appends ONLY the batch's own summary
  * deltas — bounded by the batch's key support, whatever the batch
  * size — and the exact statistic is recovered at READ time by
  * summing per key. Nothing ever rescans the event history. Because
  * an additive summary is unforgiving (a stray duplicate
  * double-counts), the log carries an explicit idempotence protocol:
  *
  *  - raw delta rows are deterministic functions of (batchId, its
  *    rows) tagged `__batch` (`__covers` null): an at-least-once
  *    replay (foreachBatch re-runs the SAME epoch after a crash)
  *    appends byte-identical rows that [[merged]]'s full-row distinct
  *    collapses;
  *  - compaction never mutates in place: it appends a SNAPSHOT
  *    (summed rows tagged `__covers = C`, the largest batch it folds
  *    in) and only then garbage-collects older files. Readers take
  *    the max-covers snapshot plus raw deltas with `__batch > C` — a
  *    crash ANYWHERE in compaction (snapshot landed / delete
  *    half-done / compact re-run) changes nothing. Correctness never
  *    depends on the delete step;
  *  - the max observed raw batch N may be MID-COMMIT (part files
  *    still landing), so a fold covers only `max(N - 1, snapshot
  *    covers)` — epochs commit in order, so everything below the max
  *    observed is fully committed — and batch N's visible rows are
  *    CARRIED FORWARD verbatim. A snapshot-only log (no raw rows)
  *    folds to its own snapshot reach, never a sentinel arithmetic
  *    overflow;
  *  - a log whose first micro-batch has not committed reads as EMPTY
  *    (callers supply the summary schema), and compaction of it is a
  *    0-file no-op.
  */
object AdditiveLog {

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The log's on-disk schema: the summary plus the two tag columns. */
  def logSchema(summarySchema: StructType): StructType =
    summarySchema
      .add(StructField("__batch", LongType))
      .add(StructField("__covers", LongType))

  /** Start the maintainer: per micro-batch, append the batch-local
    * summary tagged with the epoch id. */
  def start(rows: DataFrame, summarize: DataFrame => DataFrame,
      dir: String, checkpointDir: String, trigger: Trigger): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      summarize(batch.toDF())
        .withColumn("__batch", lit(batchId))
        .withColumn("__covers", lit(null).cast("long"))
        .write.mode("append").parquet(dir)
    }
    rows.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The live slice of the log — max-covers snapshot (if any) plus raw
    * deltas past it — collapsed against replays. An uncommitted
    * monitor reads as EMPTY with the caller's summary schema. */
  private def active(spark: SparkSession, dir: String,
      summarySchema: StructType): DataFrame = {
    if (!exists(spark, dir))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], logSchema(summarySchema))
    val log = spark.read.parquet(dir).distinct()
    val covers = log.agg(max(col("__covers"))).head() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    log.filter(
      (col("__covers").isNotNull && col("__covers") === covers)
        || (col("__covers").isNull && col("__batch") > covers))
  }

  /** The exact merged summary after any stream prefix: live slice
    * summed per key. Reads the log only — bounded by batches x key
    * support, never the event history. */
  def merged(spark: SparkSession, dir: String, summarySchema: StructType,
      keys: Seq[String], sums: Seq[String]): DataFrame = {
    val aggs = sums.map(c => sum(col(c)).as(c))
    active(spark, dir, summarySchema)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fold the fully-committed prefix of the live slice into one
    * snapshot, then garbage-collect the superseded files. Returns the
    * number of files collected (0 when there is nothing safe to
    * fold). Safe concurrently with a running stream and with crashed
    * prior compactions — see the object doc. */
  def compactLog(spark: SparkSession, dir: String,
      summarySchema: StructType, keys: Seq[String],
      sums: Seq[String]): Long = {
    if (!exists(spark, dir)) return 0L
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    if (before.isEmpty) return 0L
    val live = active(spark, dir, summarySchema)
    val bounds = live.agg(max(col("__covers")),
      max(when(col("__covers").isNull, col("__batch")))).head()
    val snapC = if (bounds.isNullAt(0)) -1L else bounds.getLong(0)
    // no raw rows (e.g. a freshly-compacted log holds only the
    // snapshot): the snapshot's reach IS the fold bound — subtracting
    // from a sentinel would wrap and poison __covers forever
    val covers =
      if (bounds.isNullAt(1)) snapC
      else math.max(snapC, bounds.getLong(1) - 1L)
    if (covers < 0) return 0L // nothing provably fully committed yet
    val aggs = sums.map(c => sum(col(c)).as(c))
    val fold = live.filter(col("__covers").isNotNull || col("__batch") <= covers)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__batch", lit(covers))
      .withColumn("__covers", lit(covers))
    val carry: DataFrame =
      live.filter(col("__covers").isNull && col("__batch") > covers)
    fold.unionByName(carry)
      .coalesce(1)
      .write.mode("append").parquet(dir)
    before.foreach(f => fs.delete(f.getPath, false))
    before.length.toLong
  }
}
