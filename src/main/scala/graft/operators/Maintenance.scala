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
    val totalBytes = fs.listStatus(path).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inputDir)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outputDir)
    val out = new org.apache.hadoop.fs.Path(outputDir)
    fs.listStatus(out).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
  }
}
