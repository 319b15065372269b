package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** INCREMENTAL SemDeDup — the 25th stream==batch twin: semantic-dup
  * resolution maintained as batches land, instead of
  * [[graft.operators.Maintenance.semDedupCompact]]'s full retrain +
  * rescan per periodic run (the round-15 VERDICT item). Division of
  * labor follows [[AnnIndexStream]]: k-means training is an OFFLINE
  * action ([[train]] — it must scan a corpus and iterate) that writes
  * a frozen centroid table per corpus generation; the stream only
  * ASSIGNS arriving batches to those frozen cells and resolves
  * dominance against the standing assignment log.
  *
  * WHY a log of pairwise facts is exact: semDedup's drop decision —
  * drop x iff SOME same-cell vector at cosine >= eps has strictly
  * better keep priority ([[Similarity.semDedupDominates]], the ONE
  * shared predicate) — is existential, so it is MONOTONE under corpus
  * growth: adding vectors can only drop more, never un-drop. Each
  * micro-batch therefore appends (a) its own assignments and (b) every
  * NEWLY DISCOVERED dominance fact — new vectors dominated by the
  * standing corpus or each other, AND standing vectors retroactively
  * dominated by new arrivals — and the read-time fold (assignments
  * minus distinct dropped ids) equals batch
  * [[Similarity.semDedupWithCentroids]] over the union with the same
  * frozen centroids, after every prefix. Every batch pair (i, j),
  * i <= j, is examined exactly once: at batch j, new x all.
  *
  * PER-BATCH WORK IS PHYSICALLY BOUNDED: both logs are PARTITIONED BY
  * `cell`, and a batch can touch at most min(batch size, nCells)
  * cells — the frozen model's own cardinality — so the standing-side
  * read prunes to exactly those partitions (one bounded `isin` over
  * the partition column; the touched-cell list is nCells-bounded
  * driver metadata). A batch therefore joins against its same-cell
  * slice of the corpus, never the whole assignment history; nothing
  * outside the touched cells is read, shuffled or compared.
  *
  * Idempotence under at-least-once: every appended row is a
  * deterministic function of (frozen centroids, batch rows, facts
  * already discovered), and both appends anti-join against the
  * standing log first — a replay (or a crash between the two appends)
  * re-derives the same rows and appends only what is missing; the
  * read's distinct collapses any torn remainder. [[compactLogs]]
  * folds the per-batch files back to distinct rows under a fresh
  * generation BEFORE deleting the files it supersedes (the
  * DedupIndexStream order — a crash mid-compaction leaves duplicates
  * the read-side distinct already absorbs, never data loss).
  *
  * The occupancy guard is [[Similarity.semDedupKeepCells]] — the SAME
  * statement the batch forms run — evaluated per batch against the
  * CURRENT population (standing + batch). Stream-grain deviation,
  * documented: facts discovered while a cell was still under the
  * bound REMAIN (drops are permanent), whereas the batch form over
  * the final corpus would keep the whole now-hot cell; the twin
  * equality is pinned under populations below the cap, and the cap
  * itself is the same no-silent-O(n²) safety in both forms.
  *
  * Staleness observability (the AnnIndexStream convention): [[train]]
  * records the training-corpus size in a sidecar; [[staleness]]
  * reports post-training corpus growth as bp of the streamed total. A
  * deployment watches it and schedules the offline retrain —
  * retraining writes a new centroid generation and the log rebuilds
  * through [[Maintenance.semDedupCompact]]'s batch pass (cells moved,
  * so every assignment is stale by definition; the rebuild IS the
  * increment, the SuffixIndex rule). */
object SemDedupStream {

  def asgDir(outDir: String): String = outDir + "_sdasg"
  def dropDir(outDir: String): String = outDir + "_sddrop"
  private def trainSidecar(centDir: String) =
    new Path(centDir, "_graft_train_n")

  private val CompactBytesPerFile = 64L * 1024 * 1024

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    fs(spark, p).exists(p)
  }

  /** Offline centroid training for one corpus generation: writes the
    * frozen centroid table and (data first, marker last) the
    * training-size sidecar [[staleness]] reads. */
  def train(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int, trainIters: Int, dim: Int,
      centDir: String): Unit = {
    Similarity.trainIvfCentroids(corpus, idCol, vecCol, nCells,
      trainIters, dim)
      .write.mode("overwrite").parquet(centDir)
    val n = corpus.count()
    val out = fs(spark, trainSidecar(centDir))
      .create(trainSidecar(centDir), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Start the maintainer. `centDir` must hold a [[train]]ed frozen
    * centroid table — the stream never trains (the AnnIndexStream
    * offline-training rule, and what makes one-shot and multi-epoch
    * ingest agree). */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
      centDir: String, outDir: String, checkpointDir: String,
      eps: Double, maxCell: Long = Similarity.SemDedupMaxCell,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    Seq(idCol, vecCol).foreach(c => require(vectors.columns.contains(c),
      s"SemDedupStream needs a '$c' column; stream has " +
        vectors.columns.mkString("[", ", ", "]")))
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val spark = batch.sparkSession
      require(exists(spark, centDir),
        s"centroid table $centDir must be trained offline " +
          "(SemDedupStream.train) before the stream starts")
      val cents = spark.read.parquet(centDir)
      val newAsg = Similarity.semDedupAssign(batch.toDF(), cents,
        idCol, vecCol).persist()
      // a zero-row epoch (the quiet-period shape) moves nothing — and
      // must not leave a schemaless partition-only footprint behind
      if (!newAsg.isEmpty) {
        // the cells this batch touches: <= min(batch, nCells) values —
        // driver metadata bounded by the frozen model's cardinality,
        // and the partition-pruning key for every standing-side read
        val touched = newAsg.select(col("cell")).distinct()
          .collect().map(_.getLong(0)).toSeq
        // partition-dir inference reads `cell` back as INT — cast to
        // the assignment's LONG so union/replay rows stay identical
        val standing =
          if (!exists(spark, asgDir(outDir)))
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              newAsg.schema)
          else spark.read.parquet(asgDir(outDir))
            .filter(col("cell").isin(touched.map(java.lang.Long.valueOf): _*))
            .withColumn("cell", col("cell").cast(LongType))
            .select(newAsg.columns.map(col): _*).distinct()
        // the touched-cell slice of the corpus so far — a crashed
        // attempt's own rows fold in through the distinct, so replays
        // see the same population
        val all = standing.unionByName(newAsg).distinct().persist()
        val keep = broadcast(Similarity.semDedupKeepCells(all, maxCell))
        val boundedAll = all.join(keep, Seq("cell"))
        val boundedNew = newAsg.join(keep, Seq("cell"))
        def dominators(df: DataFrame) = df.select(col(idCol).as("__oid"),
          col("v").as("__ov"), col("nv").as("__on"), col("cell"),
          col("cscore").as("__ocs"))
        // new dominates anything (incl. retroactively dropping standing
        // vectors); anything dominates new — every (i <= j) batch pair
        // is covered exactly once across the stream's lifetime
        val dropped = boundedAll.join(dominators(boundedNew), Seq("cell"))
          .filter(Similarity.semDedupDominates(idCol, eps))
          .select(col(idCol), col("cell"))
          .union(boundedNew.join(dominators(boundedAll), Seq("cell"))
            .filter(Similarity.semDedupDominates(idCol, eps))
            .select(col(idCol), col("cell")))
          .distinct()
        // append only what the log does not already hold (replay/torn-
        // write hygiene; correctness rests on the read-side distinct)
        val standingIds = standing.select(col(idCol))
        newAsg.join(standingIds, Seq(idCol), "left_anti")
          .withColumn("__batch", lit(batchId))
          .write.mode("append").partitionBy("cell")
          .parquet(asgDir(outDir))
        val priorDropIds =
          if (!exists(spark, dropDir(outDir))) standingIds.limit(0)
          else spark.read.parquet(dropDir(outDir))
            .filter(col("cell").isin(touched.map(java.lang.Long.valueOf): _*))
            .select(col(idCol))
        val freshDrops = dropped.join(priorDropIds, Seq(idCol), "left_anti")
          .withColumn("__batch", lit(batchId))
          .persist()
        // never create the drop log as a schemaless (rows-free) dir —
        // a fact-free epoch leaves no footprint at all
        if (!freshDrops.isEmpty)
          freshDrops.write.mode("append").partitionBy("cell")
            .parquet(dropDir(outDir))
        freshDrops.unpersist()
        all.unpersist()
      }
      newAsg.unpersist()
      ()
    }
    vectors.writeStream
      .foreachBatch(step)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The current resolution — batch [[Similarity.semDedup]]'s output
    * shape (idCol, cell, cscore, drop) over everything that has
    * arrived. Empty (correct schema) before the first commit. */
  def read(spark: SparkSession, outDir: String, idCol: String): DataFrame = {
    if (!exists(spark, asgDir(outDir)))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField(idCol, LongType),
          StructField("cell", LongType),
          StructField("cscore", DoubleType),
          StructField("drop", BooleanType))))
    val asg = spark.read.parquet(asgDir(outDir))
      .select(col(idCol), col("cell").cast(LongType).as("cell"),
        col("cscore")).distinct()
    val drops =
      if (!exists(spark, dropDir(outDir)))
        asg.select(col(idCol)).limit(0)
      else spark.read.parquet(dropDir(outDir)).select(col(idCol)).distinct()
    asg.join(drops.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .withColumn("drop", coalesce(col("__drop"), lit(false)))
      .drop("__drop")
  }

  /** Fold both logs' accreted per-batch files back to distinct rows —
    * sized to pre-compaction bytes, appended under a fresh generation
    * BEFORE the superseded files are deleted (the DedupIndexStream
    * order: a crash anywhere leaves duplicates the read-side distinct
    * absorbs, never data loss). Returns files collected. */
  def compactLogs(spark: SparkSession, outDir: String): Long = {
    def one(dir: String, dataCols: Seq[String]): Long = {
      if (!exists(spark, dir)) return 0L
      val root = new Path(dir)
      val f = fs(spark, root)
      val it = f.listFiles(root, true)
      val before = Iterator.continually(it)
        .takeWhile(_.hasNext).map(_.next())
        .filter(_.getPath.getName.endsWith(".parquet")).toSeq
      if (before.isEmpty) return 0L
      val log = spark.read.parquet(dir)
      val gen = log.agg(max(col("__batch"))).head() match {
        case r if r.isNullAt(0) => 1L
        case r => r.getLong(0) + 1L
      }
      val nFiles = math.max(1L,
        before.map(_.getLen).sum / CompactBytesPerFile).toInt
      log.select((dataCols :+ "cell").map(col): _*).distinct()
        .withColumn("__batch", lit(gen))
        .repartition(nFiles, col("cell"))
        .write.mode("append").partitionBy("cell").parquet(dir)
      before.foreach(s => f.delete(s.getPath, false))
      before.length.toLong
    }
    // the id column name is whatever the stream wrote — recover it
    // from the file schema (everything except the known columns)
    def idColOf(dir: String): Option[String] =
      if (!exists(spark, dir)) None
      else spark.read.parquet(dir).columns
        .find(c => c != "cell" && c != "cscore" && c != "v" &&
          c != "nv" && c != "__batch")
    val a = idColOf(asgDir(outDir)).map(id =>
      one(asgDir(outDir), Seq(id, "v", "nv", "cscore"))).getOrElse(0L)
    val d = idColOf(dropDir(outDir)).map(id =>
      one(dropDir(outDir), Seq(id))).getOrElse(0L)
    a + d
  }

  /** Corpus growth beyond the size the model was trained on, in bp of
    * the streamed total — the retrain trigger a deployment watches
    * (the AnnIndexStream staleness convention). Exact under the
    * bootstrap-ingest deployment (the trained seed corpus itself
    * streams through as the early batches); a seed corpus that never
    * streams makes this a conservative floor. One column-pruned count
    * of the log, never a vector read. */
  def staleness(spark: SparkSession, outDir: String,
      centDir: String): Long = {
    val side = trainSidecar(centDir)
    require(fs(spark, side).exists(side),
      s"no training sidecar under $centDir — train() writes it")
    val in = fs(spark, side).open(side)
    val nTrain =
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    val nAsg =
      if (!exists(spark, asgDir(outDir))) 0L
      else spark.read.parquet(asgDir(outDir)).select("__batch").count()
    if (nAsg == 0L) 0L else math.max(0L, nAsg - nTrain) * 10000L / nAsg
  }
}
