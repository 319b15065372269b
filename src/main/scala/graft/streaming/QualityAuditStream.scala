package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.GopherRules

/** Streaming twin of q273's Gopher rule AUDIT (the 24th stream==batch
  * twin): a pipeline owner watching WHICH rule is eating their corpus
  * wants the per-source violation table maintained as batches land,
  * not recomputed from raw text per look. Every q273 statistic is an
  * ADDITIVE per-source count (docs, per-rule violations, all-rules
  * passes), so the monitor rides [[AdditiveLog]]'s protocol verbatim:
  * each micro-batch appends its own source-bounded count deltas (the
  * rule arithmetic is [[GopherRules]] — the SAME statement q273 and
  * the CurateStream rule gate run, so the monitor cannot drift from
  * the audit it mirrors), replays collapse under the log's full-row
  * distinct, and [[audit]] merges by addition then derives the one
  * non-additive column (pass_bp) at read time from the merged counts
  * — never stored, so it is always consistent with them.
  *
  * SCALE SHAPE: per-batch work is one pure projection + a
  * source-bounded aggregation (q273's shape on the batch); log growth
  * is sources x batches rows of longs; the read is bounded by the
  * live slice, never the document history. */
object QualityAuditStream {

  def logDir(outDir: String): String = outDir + "_qaudit"

  private val CountCols = Seq("n_docs", "v_wordcount", "v_meanlen",
    "v_stopword", "v_diversity", "n_pass")

  /** q273's per-source counts over one frame — the batch-local
    * summary AND the read-side merge target. */
  private[streaming] def summary(docs: DataFrame): DataFrame = {
    val (nw, wchars, stopw, ndist) = GopherRules.metrics(col("text"))
    val flagged = docs.select(col("source") +:
      GopherRules.rules(nw, wchars, stopw, ndist)
        .map { case (name, pred) => pred.as(name) }: _*)
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("r_wc"), 1L).otherwise(0L)).as("v_wordcount"),
        sum(when(!col("r_mwl"), 1L).otherwise(0L)).as("v_meanlen"),
        sum(when(!col("r_stop"), 1L).otherwise(0L)).as("v_stopword"),
        sum(when(!col("r_div"), 1L).otherwise(0L)).as("v_diversity"),
        sum(when(col("r_wc") && col("r_mwl") && col("r_stop") &&
          col("r_div"), 1L).otherwise(0L)).as("n_pass"))
  }

  private def summarySchema: StructType = StructType(
    StructField("source", StringType) +:
      CountCols.map(c => StructField(c, LongType)))

  /** Start the maintainer: per micro-batch, append the batch's
    * per-source count deltas under the epoch id. */
  def start(docs: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    AdditiveLog.start(docs, summary, logDir(outDir), checkpointDir, trigger)

  /** The current audit table — q273's exact output shape over
    * everything that has arrived: merged counts plus the read-derived
    * pass_bp. Empty (correct schema) before the first commit. */
  def audit(spark: SparkSession, outDir: String): DataFrame =
    AdditiveLog.merged(spark, logDir(outDir), summarySchema,
        Seq("source"), CountCols)
      .withColumn("pass_bp", expr("n_pass * 10000 div n_docs"))

  /** Fold the committed prefix into one snapshot (the AdditiveLog
    * compaction contract); returns files collected. */
  def compactLog(spark: SparkSession, outDir: String): Long =
    AdditiveLog.compactLog(spark, logDir(outDir), summarySchema,
      Seq("source"), CountCols)
}
