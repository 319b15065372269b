package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Portable
import graft.operators.Curate

/** Streaming curation: the batch [[Curate]] pipeline applied per
  * micro-batch via foreachBatch — the production shape of continuous
  * corpus ingestion (new document files land, each batch is gated,
  * deduped and appended).
  *
  * Cross-batch semantics: each batch curates INTERNALLY with the full
  * pipeline, then drops documents whose content hash already exists in
  * the sink — so exact duplicates never land twice, across batches AND
  * across failure/replay (foreachBatch may re-deliver a batch; the
  * sink anti-join makes the append content-idempotent, which is the
  * exactly-once recipe foreachBatch requires of its sink). Near-dup
  * removal is within-batch only: cross-batch NEAR dups are a periodic
  * compaction job over the landed corpus ([[graft.operators.Dedup]] +
  * [[graft.operators.Maintenance]]), not a per-batch scan.
  *
  * The sink carries the two independently-salted content hashes as
  * columns (`content_hash`, `content_hash2`): the anti-join keys on
  * BOTH (the same ~2^-120 pair-collision bound as [[Dedup.exact]] —
  * one 60-bit hash starts merging distinct documents around 10^9 of
  * them) and reads ONLY those two columns from the landed parquet
  * (column pruning — 16 bytes/doc, no text rescan, no re-hashing).
  * At real corpus scale the hashes would live in a compacted index
  * table maintained by the same job; same join shape.
  */
object CurateStream {

  val HashCol = "content_hash"
  val HashCol2 = "content_hash2"

  def start(docs: DataFrame, textCol: String, idCol: String,
      outDir: String, checkpointDir: String,
      cfg: Curate.Config = Curate.Config(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = { (batch, _) =>
      val spark = batch.sparkSession
      val curated = Curate(batch.toDF(), textCol, idCol, cfg)
        .withColumn(HashCol, Portable.pmd5(col(textCol)))
        .withColumn(HashCol2, Portable.pmd5Salted(1, col(textCol)))
      val sinkHasData = {
        val p = new org.apache.hadoop.fs.Path(outDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
      }
      val fresh =
        if (!sinkHasData) curated
        else {
          val existing = spark.read.parquet(outDir)
            .select(col(HashCol), col(HashCol2)).distinct()
          curated.join(existing, Seq(HashCol, HashCol2), "left_anti")
        }
      fresh.write.mode("append").parquet(outDir)
      // Curate's dedup stages persist internal self-joined projections
      // under the documented clearCache-after-terminal-action contract;
      // a long-lived stream must free them per batch or cached blocks
      // accumulate for the lifetime of the query
      spark.catalog.clearCache()
    }
    docs.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
