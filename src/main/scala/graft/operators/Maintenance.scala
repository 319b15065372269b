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

  /** Rewrite `inputDir`'s parquet as ~`targetFileBytes` files at
    * `outputDir` (atomicity by write-then-swap is the caller's choice —
    * writing in place would lose data on failure). Returns the output
    * file count. Partition count = ceil(total bytes / target), at least
    * one; sizes come from the filesystem, not Spark statistics, so the
    * estimate holds for any table. */
  def compactParquet(spark: SparkSession, inputDir: String, outputDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val path = new org.apache.hadoop.fs.Path(inputDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: partitioned layouts (e.g. a CurateStream sink's
    // batch_id=N dirs) keep their data files below the root. The
    // summary includes marker files (_SUCCESS), whose bytes are noise.
    val totalBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inputDir)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outputDir)
    val out = new org.apache.hadoop.fs.Path(outputDir)
    fs.listStatus(out).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
  }

  /** Periodic cross-batch NEAR-dup compaction over a
    * [[graft.streaming.CurateStream]] sink: per-batch curation removes
    * near dups only WITHIN a batch (and its hash index blocks exact dups
    * forever), so near dups that straddle batches accumulate until this
    * job re-curates the landed corpus as one frame and rewrites it as
    * ~target-sized files at `outputDir` (write-then-swap, like
    * [[compactParquet]]). The stream's hash index is deliberately left
    * alone: a dropped near dup's exact hash stays indexed, so the same
    * content arriving again is still gated at ingest.
    *
    * @return output parquet file count.
    */
  def nearDupCompact(spark: SparkSession, sinkDir: String, outputDir: String,
      textCol: String, idCol: String, cfg: Curate.Config = Curate.Config(),
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val path = new org.apache.hadoop.fs.Path(sinkDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pre-compaction size bounds the output size (compaction only drops)
    val totalBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    Curate(spark.read.parquet(sinkDir), textCol, idCol, cfg)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outputDir)
    val out = new org.apache.hadoop.fs.Path(outputDir)
    fs.listStatus(out).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
  }
}
