package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-maintenance utilities for long-lived corpus datasets.
  *
  * Small-files sprawl is the chronic failure mode of incremental
  * ingestion at scale: a 100 TB corpus appended in thousands of
  * micro-batches ends up as millions of KB-sized parquet files, and
  * every downstream scan pays listing + footer + task overhead per
  * file. Compaction rewrites a directory to approximately
  * target-sized files.
  */
object Maintenance {

  /** Shared compaction skeleton: size `inputDir` recursively, rewrite
    * `frame` as ceil(bytes / target) files at `outputDir`, return the
    * output parquet file count. Recursive sizing covers partitioned
    * layouts (e.g. a CurateStream sink's batch_id=N dirs); marker-file
    * (_SUCCESS) bytes are noise. Filesystem sizes, not Spark
    * statistics, so the estimate holds for any table. */
  private def rewriteSized(spark: SparkSession, inputDir: String,
      outputDir: String, targetFileBytes: Long)(frame: DataFrame): Long = {
    val path = new org.apache.hadoop.fs.Path(inputDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    frame.repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outputDir)
    val out = new org.apache.hadoop.fs.Path(outputDir)
    fs.listStatus(out).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
  }

  /** Rewrite `inputDir`'s parquet as ~`targetFileBytes` files at
    * `outputDir` (atomicity by write-then-swap is the caller's choice —
    * writing in place would lose data on failure). Returns the output
    * file count. */
  def compactParquet(spark: SparkSession, inputDir: String, outputDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long =
    rewriteSized(spark, inputDir, outputDir, targetFileBytes)(
      spark.read.parquet(inputDir))

  /** Periodic cross-batch NEAR-dup compaction over a
    * [[graft.streaming.CurateStream]] sink: per-batch curation removes
    * near dups only WITHIN a batch (and its hash index blocks exact dups
    * forever), so near dups that straddle batches accumulate until this
    * job re-curates the landed corpus as one frame and rewrites it as
    * ~target-sized files at `outputDir`.
    *
    * The output is a FLAT compacted corpus snapshot — any `batch_id`
    * partition column of the sink becomes a plain data column — for
    * downstream consumers (training jobs, analytics). It is NOT a
    * drop-in replacement for the live sink directory: the stream's
    * replay guard reads the sink with a partitioned batch_id schema,
    * so swapping flat files underneath it would break partition
    * discovery. Retiring a sink generation means pointing the stream
    * at a fresh sink + checkpoint and serving readers the snapshot.
    * The stream's hash index is deliberately left alone either way: a
    * dropped near dup's exact hash stays indexed, so the same content
    * arriving again is still gated at ingest.
    *
    * @return output parquet file count.
    */
  def nearDupCompact(spark: SparkSession, sinkDir: String, outputDir: String,
      textCol: String, idCol: String, cfg: Curate.Config = Curate.Config(),
      targetFileBytes: Long = 128L * 1024 * 1024): Long =
    rewriteSized(spark, sinkDir, outputDir, targetFileBytes)(
      Curate(spark.read.parquet(sinkDir), textCol, idCol, cfg))
}
