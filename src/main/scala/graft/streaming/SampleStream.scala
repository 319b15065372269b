package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.PrioritySample

/** Streaming twin of q247's priority sampling
  * ([[graft.operators.PrioritySample]]): a weighted-sample reservoir
  * over an UNBOUNDED document stream, maintained as an append-only log
  * of mergeable summaries.
  *
  * Per micro-batch the stream appends ONLY the batch's own top-(k+1)
  * priorities per group — bounded rows per batch whatever the batch
  * size — and the reservoir is recovered at READ time by merging
  * summaries: order statistics of a union equal order statistics over
  * concatenated per-part summaries, the same mergeability KMV/KLL
  * lean on. Nothing ever rescans the corpus, and the log is
  * crash/replay-safe by construction:
  *
  *  - priorities are deterministic functions of (id, weight), so a
  *    replayed batch appends byte-identical summary rows;
  *  - [[sample]] deduplicates on (group, id) before the final merge,
  *    so duplicate appends (a crashed attempt that half-landed, an
  *    at-least-once replay) cannot displace distinct members;
  *  - the log grows one summary per (batch, group) — [[compactLog]]
  *    rewrites it back to a single current summary (itself just
  *    `sample`'s merge, persisted) when accretion matters.
  *
  * The final sample after any prefix of the stream equals the batch
  * operator run over every document seen — SampleStreamSpec proves
  * equality batch-for-batch and under duplicate-append replay.
  */
object SampleStream {

  /** Append-only summary log directory for a reservoir rooted at
    * `outDir`. */
  def logDir(outDir: String): String = outDir + "_prilog"

  private def logExists(spark: SparkSession, outDir: String): Boolean = {
    val dir = new Path(logDir(outDir))
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dir)
  }

  /** Start the reservoir maintainer: per micro-batch, append the
    * batch-local top-(k+1) summary per group to the log. */
  def start(docs: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val pri = PrioritySample.withPriority(batch.toDF(), groupCol, idCol,
        weightCol)
      PrioritySample.topSummary(pri, groupCol, idCol, k)
        .withColumn("__batch", lit(batchId))
        .write.mode("append").parquet(logDir(outDir))
    }
    docs.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Current reservoir: merge every logged summary and finish with the
    * DLT rank/tau/estimator pass. Reads the log only — bounded by
    * batches x groups x (k+1) rows, never the corpus.
    *
    * `schemaFrom`: a (possibly non-empty) frame with the caller's
    * (groupCol, idCol, weightCol) types — ONLY consulted when the
    * reservoir has never committed, to derive the empty result's
    * schema from the REAL pipeline ([[PrioritySample.withPriority]] →
    * topSummary → estimate over zero rows of the caller's types): the
    * one-source-of-truth rule the sibling streams follow, so an
    * integer-grouped reservoir reads with the same schema before and
    * after its first commit. Without it the empty frame falls back to
    * the historical convention (STRING group, BIGINT id). */
  def sample(spark: SparkSession, outDir: String, groupCol: String,
      idCol: String, k: Int,
      schemaFrom: Option[(DataFrame, String)] = None): DataFrame = {
    // a reservoir whose first micro-batch has not committed yet is
    // simply EMPTY, not broken (the DriftStream rule)
    if (!logExists(spark, outDir)) {
      schemaFrom match {
        case Some((docs, weightCol)) =>
          // the committed path reads the LOG (parquet: every column
          // nullable) and finishes with topSummary+estimate — mirror
          // it exactly: derive the log row types from the caller's
          // frame via withPriority, normalize to parquet nullability,
          // then run the same finishing pass over zero rows
          import org.apache.spark.sql.types.StructType
          val logShaped = PrioritySample.withPriority(
              docs.select(col(groupCol), col(idCol), col(weightCol))
                .limit(0),
              groupCol, idCol, weightCol)
            .select(col(groupCol), col(idCol), col("w"), col("priority"))
          val emptyLog = spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row],
            StructType(logShaped.schema.map(_.copy(nullable = true))))
          return PrioritySample.estimate(
            PrioritySample.topSummary(emptyLog, groupCol, idCol, k),
            groupCol, idCol, k)
        case None =>
          import org.apache.spark.sql.types._
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row],
            StructType(Seq(StructField(groupCol, StringType),
              StructField(idCol, LongType), StructField("w", LongType),
              StructField("priority", DoubleType),
              StructField("est_w", DoubleType))))
      }
    }
    val log = spark.read.parquet(logDir(outDir))
      .select(col(groupCol), col(idCol), col("w"), col("priority"))
      // replay/crash guard: duplicate appends of the same member merge
      // to one row (all its columns are deterministic recomputations)
      .distinct()
    PrioritySample.estimate(
      PrioritySample.topSummary(log, groupCol, idCol, k),
      groupCol, idCol, k)
  }

  /** Rewrite the accreted log back to one current summary per group.
    * Crash-safe: the compacted summary lands under a fresh `__batch`
    * generation BEFORE the old files are removed; a crash between the
    * two leaves duplicates that [[sample]]'s distinct already
    * tolerates. */
  def compactLog(spark: SparkSession, outDir: String, groupCol: String,
      idCol: String, k: Int): Long = {
    if (!logExists(spark, outDir)) return 0L // nothing committed yet
    val dir = new Path(logDir(outDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
    if (before.isEmpty) return 0L
    val gen = spark.read.parquet(logDir(outDir))
      .agg(max(col("__batch"))).head() match {
        case r if r.isNullAt(0) => 1L // a log of empty files: still generation-safe
        case r => r.getLong(0) + 1L
      }
    val merged = PrioritySample.topSummary(
      spark.read.parquet(logDir(outDir))
        .select(col(groupCol), col(idCol), col("w"), col("priority"))
        .distinct(),
      groupCol, idCol, k)
      .withColumn("__batch", lit(gen))
      .coalesce(1)
    merged.write.mode("append").parquet(logDir(outDir))
    before.foreach(f => fs.delete(f.getPath, false))
    before.length.toLong
  }
}
