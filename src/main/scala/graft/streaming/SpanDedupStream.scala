package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.C4Rules

/** Streaming C4 span-dedup index — q284's keep-one three-sentence-span
  * dedup maintained over an UNBOUNDED ingest (the 27th stream==batch
  * twin): every arriving batch is segmented and span-hashed ONCE, and
  * the deduplicated corpus after any prefix equals batch
  * [[C4Rules.spanDedup]] over everything that has arrived.
  *
  * Two logs, both append-only parquet:
  *   - the PAGE log (doc_id, kept sentence array) — the structural
  *     survivors, appended once per document;
  *   - the SPAN log (doc_id, spos, sh) — each page's three-sentence
  *     span occurrences as 60-bit hashes. The expensive pass
  *     (segmentation + span hashing) happens once per document, EVER;
  *     reads fold hashes and never re-hash history.
  * Both are SET-FACT logs (the [[DedupIndexStream]] family, not
  * [[AdditiveLog]] counts): every row is a deterministic function of
  * its document alone, so the merge law holds trivially (multi-epoch
  * union == single-epoch union), an at-least-once replay re-appends
  * identical rows the reader's distinct absorbs, and an empty batch
  * appends nothing.
  *
  * WHY read-time resolution is the exact form: the winner of a span
  * hash is min (doc_id, spos) over ALL occurrences so far — a later
  * arrival with a smaller doc_id RETROACTIVELY demotes the standing
  * winner (its sentences become removed). Removal is monotone (a
  * min only ever decreases; a demoted occurrence can never win
  * again), so an incremental drop-fact log in the
  * [[SemDedupStream]] style would also be sound — but the fold here
  * is one hash-keyed aggregation over the span log (no text), so the
  * read-time form is both exact and already index-grain cheap; the
  * monotonicity note records the scale-out path if span cardinality
  * ever dwarfs the read budget.
  *
  * SCALE SHAPE: per-batch work is the batch's own scan-stage
  * segmentation plus two appends; the read folds (a) the span log
  * through the SAME groupBy-min resolution statement the batch
  * operator runs ([[C4Rules.rebuiltTextFrom]] — hashes travel, never
  * span text) and (b) reassembles only documents that actually lost
  * a span (the untouched-bypass shape). Compaction rewrites both
  * logs to distinct rows, file count scaled to input bytes. */
object SpanDedupStream {

  def pageDir(outDir: String): String = outDir + "_c4pages"
  def spanDir(outDir: String): String = outDir + "_c4spans"

  private val CompactBytesPerFile = 128L << 20

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def pageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kept", ArrayType(StringType))))
  private def spanSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("spos", LongType),
    StructField("sh", LongType)))

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Start the maintainer: per micro-batch, segment the batch's
    * documents (C4 line + page rules), append the surviving pages and
    * their span hashes. `docs` needs (doc_id, text). */
  def start(docs: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    Seq("doc_id", "text").foreach(c =>
      require(docs.columns.contains(c),
        s"SpanDedupStream needs a '$c' column; stream has " +
          docs.columns.mkString("[", ", ", "]")))
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      // persisted: the page frame feeds both appends; freed before the
      // batch returns (per-batch grain, never session-lifetime)
      val pg = C4Rules.pageRows(batch.toDF(), "doc_id", "text").persist()
      try {
        pg.withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(pageDir(outDir))
        C4Rules.spansOf(pg, "doc_id")
          .withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(spanDir(outDir))
      } finally { pg.unpersist(); () }
    }
    docs.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The standing page log, replay-collapsed. Empty (correct schema)
    * before the first commit. */
  def pages(spark: SparkSession, outDir: String): DataFrame =
    if (!exists(spark, pageDir(outDir))) emptyDf(spark, pageSchema)
    else spark.read.parquet(pageDir(outDir))
      .select(col("doc_id"), col("kept")).distinct()

  /** The standing span log, replay-collapsed. */
  def spanLog(spark: SparkSession, outDir: String): DataFrame =
    if (!exists(spark, spanDir(outDir))) emptyDf(spark, spanSchema)
    else spark.read.parquet(spanDir(outDir))
      .select(col("doc_id"), col("spos"), col("sh")).distinct()

  /** The deduplicated corpus over everything that has arrived:
    * (doc_id, text) — the SAME resolution + reassembly statement as
    * batch [[C4Rules.spanDedup]], fed from the standing logs. Equals
    * the batch operator over the union of all batches, after every
    * prefix (SpanDedupStreamSpec pins it, including a retroactive
    * winner theft).
    *
    * @note persists the page fold (it feeds the untouched bypass and
    *       the reassembly); call `spark.catalog.clearCache()` after
    *       the terminal action — the Dedup cache contract. */
  def dedupedCorpus(spark: SparkSession, outDir: String): DataFrame = {
    val pg = pages(spark, outDir).persist()
    C4Rules.rebuiltTextFrom(pg, spanLog(spark, outDir), "doc_id")
      .select(col("doc_id"), col("__txt").as("text"))
  }

  /** Rewrite both accreted logs back to one distinct generation each
    * (data first, delete after — a crash between the two leaves
    * duplicates the readers' distinct absorbs). Returns files
    * collected. */
  def compactLogs(spark: SparkSession, outDir: String): Long =
    compactOne(spark, pageDir(outDir), Seq("doc_id", "kept")) +
      compactOne(spark, spanDir(outDir), Seq("doc_id", "spos", "sh"))

  private def compactOne(spark: SparkSession, dir: String,
      cols: Seq[String]): Long = {
    if (!exists(spark, dir)) return 0L
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    if (before.isEmpty) return 0L
    val gen = spark.read.parquet(dir)
      .agg(max(col("__batch"))).head() match {
        case r if r.isNullAt(0) => 1L
        case r => r.getLong(0) + 1L
      }
    val nFiles = math.max(1L,
      before.map(_.getLen).sum / CompactBytesPerFile).toInt
    spark.read.parquet(dir)
      .select(cols.map(col): _*)
      .distinct()
      .withColumn("__batch", lit(gen))
      .repartition(nFiles, col("doc_id"))
      .write.mode("append").parquet(dir)
    before.foreach(f => fs.delete(f.getPath, false))
    before.length.toLong
  }
}
