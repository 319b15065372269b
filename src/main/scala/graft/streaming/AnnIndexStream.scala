package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming maintenance of a persistent IVF ANN index — the embedding
  * counterpart of [[CurateStream]]'s hash/band/sig indexes (round-7
  * gap: those stayed current per batch while the IVF index could only
  * be rebuilt offline).
  *
  * Division of labor: k-means TRAINING is an offline action
  * ([[Similarity.buildIvfIndex]] — it must scan a corpus sample and
  * iterate); the stream only APPENDS, assigning each arriving batch to
  * the FROZEN centroid table via [[Similarity.appendIvfIndex]]. That
  * keeps every micro-batch's work proportional to the batch: the
  * assignment job reads the batch plus the tiny centroid table and
  * nothing else (IvfIndexSpec pins the plan).
  *
  * Exactly-once: generation `batchId + 1` tags every appended row, and
  * a replay of batch N anti-joins the batch against the index slice
  * `gen >= N + 1` before appending. Each append writes whole files
  * with a CONSTANT gen, so parquet row-group stats skip every earlier
  * generation's files — outside a replay the guard's pruned file set
  * is empty, and even on replay it reads only the crashed attempt's
  * own rows, never the corpus index. (The same
  * stats-instead-of-partitions trick CurateStream plays with its
  * `batch_id >=` filter.)
  *
  * Staleness observability: after each append one row lands in
  * `<assignTable>_staleness` — (batch_id, n_total, n_appended,
  * staleness_bp), all integers per the registry convention. The
  * bookkeeping is INCREMENTAL: the previous row is the base and only
  * the generations it does not yet cover are counted (file-pruned to
  * the current batch, or to the crash window on recovery) — the
  * full-index aggregate of [[Similarity.ivfIndexStaleness]] runs at
  * most once, when no prior row exists. A deployment watches
  * staleness_bp and schedules the offline retrain
  * ([[Similarity.buildIvfIndex]], which resets gen to 0) past its
  * drift budget; retraining should also drop the staleness table so
  * its history restarts with the new model.
  */
object AnnIndexStream {

  def stalenessTable(assignTable: String): String = assignTable + "_staleness"

  def start(vectors: DataFrame, idCol: String, vecCol: String,
      centTable: String, assignTable: String, checkpointDir: String,
      nBuckets: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val spark = batch.sparkSession
      require(spark.catalog.tableExists(centTable),
        s"centroid table $centTable must be trained offline " +
          "(Similarity.buildIvfIndex) before the append stream starts")
      val gen = batchId + 1
      val fresh =
        if (!spark.catalog.tableExists(assignTable)) batch.toDF()
        else {
          val landed = spark.table(assignTable)
            .filter(col("gen") >= gen)
            .select(col("neighbor_id").as(idCol))
          batch.toDF().join(landed, Seq(idCol), "left_anti")
        }
      Similarity.appendIvfIndex(spark, centTable, assignTable, fresh,
        idCol, vecCol, gen, nBuckets)
      recordStaleness(spark, assignTable, batchId, gen)
    }
    vectors.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Append this batch's staleness row, incrementally and idempotently
    * (a replay that finds its own batch_id already recorded writes
    * nothing). */
  private def recordStaleness(spark: SparkSession, assignTable: String,
      batchId: Long, gen: Long): Unit = {
    val st = stalenessTable(assignTable)
    val prior: Option[Row] =
      if (!spark.catalog.tableExists(st)) None
      else spark.table(st).orderBy(col("batch_id").desc).limit(1)
        .collect().headOption
    if (prior.exists(_.getAs[Long]("batch_id") >= batchId)) return
    // base covers generations <= baseGen; count only what it misses.
    // baseGen = -1 (no prior row) counts everything once, including the
    // offline build's gen-0 rows.
    val (baseTotal, baseAppended, baseGen) = prior
      .map(r => (r.getAs[Long]("n_total"), r.getAs[Long]("n_appended"),
        r.getAs[Long]("batch_id") + 1))
      .getOrElse((0L, 0L, -1L))
    val delta = spark.table(assignTable)
      .filter(col("gen") > baseGen && col("gen") <= gen)
      .agg(count(lit(1)).as("n"),
        sum(when(col("gen") > 0, 1L).otherwise(0L)).as("app"))
      .head()
    val total = baseTotal + delta.getLong(0)
    val appended = baseAppended + (if (delta.isNullAt(1)) 0L else delta.getLong(1))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(batchId, total, appended,
        if (total > 0) appended * 10000L / total else 0L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_total",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_appended",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("staleness_bp",
          org.apache.spark.sql.types.LongType, nullable = false))))
      .write.mode("append").saveAsTable(st)
  }
}
