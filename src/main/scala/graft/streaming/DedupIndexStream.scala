package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Streaming near-dup candidate index — q28's MinHash-LSH family
  * streamed (17th twin): a persisted band-key index over an UNBOUNDED
  * document stream, the training-ingest shape where every arriving
  * batch must be deduplicated against EVERYTHING seen without ever
  * re-reading old text.
  *
  * Per micro-batch the stream shingles, minhashes and bands ONLY the
  * batch's documents — the expensive text pass happens ONCE per
  * document, ever — and appends the exploded (doc_id, band, key)
  * rows: nBands 8-byte-key rows per document, text never stored. The
  * candidate set is recovered at READ time by the same band
  * self-equi-join the batch operator runs, against INDEX rows, so the
  * stream result after any prefix equals batch `lshCandidates` over
  * every document seen — intra-batch and cross-batch pairs alike.
  *
  * Unlike the ADDITIVE logs ([[AdditiveLog]]), band rows are SET
  * facts: priorities of the pair universe do not accumulate, they
  * exist or not — so a duplicate append (at-least-once replay, a
  * crashed attempt) is absorbed by the reader's distinct, the
  * [[SampleStream]] idempotence story. Compaction rewrites the
  * distinct rows under a fresh `__batch` generation BEFORE deleting
  * the old files; a crash between the two leaves duplicates the
  * reader already tolerates.
  */
object DedupIndexStream {

  // q28's published family: 16 minhashes, 4 rows/band -> 4 band keys
  private val K = 16
  private val RPB = 4
  private val NB = K / RPB
  private val SHINGLE = 3

  /** Append-only band-key log for an index rooted at `outDir`. */
  def logDir(outDir: String): String = outDir + "_bandlog"

  /** The per-document index rows: (doc_id, band, key) — the exploded
    * band table batch `lshCandidates` self-joins. `docs` needs
    * (doc_id, text). */
  def bandRows(docs: DataFrame): DataFrame =
    Dedup.bandExplode(
      Dedup.bandKeys(
        Dedup.minhashSignature(docs.select(col("doc_id"), col("text")),
          "text", K, SHINGLE), K, RPB)
        .select((col("doc_id") +: (0 until NB).map(b => col(s"b$b"))): _*),
      "doc_id", "doc_id", NB)

  private def logExists(spark: SparkSession, outDir: String): Boolean = {
    val dir = new Path(logDir(outDir))
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dir)
  }

  /** Schema for reads that arrive before the first commit — derived
    * from [[bandRows]] itself (one source of truth). */
  private def indexSchema(spark: SparkSession): StructType = {
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    bandRows(emptyDocs).schema
  }

  /** Start the index maintainer: per micro-batch, band the batch's
    * documents and append their index rows tagged with the epoch. */
  def start(docs: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      bandRows(batch.toDF())
        .withColumn("__batch", lit(batchId))
        .write.mode("append").parquet(logDir(outDir))
    }
    docs.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Current candidate pairs: docs sharing at least one band key among
    * EVERYTHING indexed so far — (id_a, id_b), id_a < id_b, distinct.
    * Reads the index only (nBands rows per document, 8-byte keys);
    * text is never revisited. An index whose first micro-batch has
    * not committed reads as EMPTY.
    *
    * @note persists the distinct index projection (it feeds both join
    *       sides); call `spark.catalog.clearCache()` after the
    *       terminal action — the Dedup cache contract. */
  def candidates(spark: SparkSession, outDir: String): DataFrame = {
    val idx =
      if (!logExists(spark, outDir))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], indexSchema(spark))
      else spark.read.parquet(logDir(outDir))
        .select(col("doc_id"), col("band"), col("key"))
        // replay/crash guard: duplicate appends collapse — band rows
        // are deterministic functions of (doc_id, text)
        .distinct()
        .persist()
    idx.as("l")
      .join(idx.as("r"), col("l.band") === col("r.band")
        && col("l.key") === col("r.key")
        && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
  }

  /** Rewrite the accreted log back to one distinct generation.
    * Crash-safe: the compacted rows land under a fresh `__batch`
    * generation BEFORE the old files are removed; a crash between the
    * two leaves duplicates [[candidates]]' distinct already
    * tolerates. Returns the number of files collected. */
  def compactLog(spark: SparkSession, outDir: String): Long = {
    if (!logExists(spark, outDir)) return 0L
    val dir = new Path(logDir(outDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
    if (before.isEmpty) return 0L
    val gen = spark.read.parquet(logDir(outDir))
      .agg(max(col("__batch"))).head() match {
        case r if r.isNullAt(0) => 1L
        case r => r.getLong(0) + 1L
      }
    spark.read.parquet(logDir(outDir))
      .select(col("doc_id"), col("band"), col("key"))
      .distinct()
      .withColumn("__batch", lit(gen))
      .coalesce(1)
      .write.mode("append").parquet(logDir(outDir))
    before.foreach(f => fs.delete(f.getPath, false))
    before.length.toLong
  }
}
