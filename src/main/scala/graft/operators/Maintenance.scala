package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Periodic SEMANTIC-dup compaction over a
    * [[graft.streaming.CurateStream]] sink whose rows carry an
    * embedding column — the maintenance-job complement of the ingest
    * gates, and of [[nearDupCompact]] one level up the abstraction
    * ladder: the hash index blocks exact re-arrivals forever and the
    * token near-dup machinery catches shingle overlap, but
    * PARAPHRASED duplicates share no shingles and accumulate across
    * batches until this job runs [[Similarity.semDedup]] (Abbas et
    * al. 2023: k-means cells, within-cell cosine, least-prototypical
    * keeper) over the landed corpus and rewrites the survivors as
    * ~target-sized files at `outputDir`.
    *
    * Same snapshot semantics as [[nearDupCompact]]: the output is a
    * FLAT compacted snapshot for downstream consumers, not a drop-in
    * replacement for the live sink; the hash index is deliberately
    * left alone (a dropped paraphrase's exact hash stays indexed, so
    * the same bytes arriving again are still gated at ingest). At
    * real corpus scale train the cells on a sample and raise `nCells`
    * with the corpus so the within-cell stage stays bounded — the
    * [[Similarity.semDedup]] contract.
    *
    * This full retrain-and-rescan is the CORPUS-GENERATION boundary:
    * between runs, [[graft.streaming.SemDedupStream]] maintains the
    * same resolution incrementally against the frozen centroids, and
    * its [[graft.streaming.SemDedupStream.staleness]] bp is the
    * trigger for scheduling this job (cells moved = every assignment
    * stale by definition; the rebuild IS the increment).
    *
    * @return output parquet file count. */
  def semDedupCompact(spark: SparkSession, sinkDir: String,
      outputDir: String, idCol: String, vecCol: String, nCells: Int,
      trainIters: Int, dim: Int, eps: Double,
      maxCell: Long = Similarity.SemDedupMaxCell,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val landed = spark.read.parquet(sinkDir)
    val (sd, release) = Similarity.semDedupReleasable(
      landed.select(col(idCol), col(vecCol)),
      idCol, vecCol, nCells, trainIters, dim, eps, maxCell)
    try
      rewriteSized(spark, sinkDir, outputDir, targetFileBytes)(
        landed.join(sd.filter(!col("drop")).select(col(idCol)),
          Seq(idCol), "left_semi"))
    // the rewrite materialized the snapshot — drop the assignment
    // cache so periodic runs do not accumulate blocks for the life of
    // the session (the semDedup caching contract)
    finally release()
  }

  /** Periodic C4 keep-one SPAN compaction over a landed corpus — the
    * maintenance complement of the ingest-time c4Gate: the gate is
    * ADMISSION-only (a span's winner is a corpus-level fact no
    * per-batch gate can know), so duplicated three-sentence spans
    * accumulate across batches until this job runs
    * [[C4Rules.spanDedup]] (Raffel et al. 2020 §2.2: line rules, then
    * all-but-first span occurrences cut) over the landed corpus and
    * rewrites the survivors — text REWRITTEN from the surviving
    * sentences, fully-consumed documents dropped — as ~target-sized
    * files at `outputDir`.
    *
    * Same snapshot semantics as [[nearDupCompact]]: a FLAT compacted
    * snapshot for downstream consumers, not a drop-in sink
    * replacement (the rewrite changes text, so sink content hashes
    * deliberately stay untouched in the live sink). The incremental
    * form of the same resolution is
    * [[graft.streaming.SpanDedupStream]] over the raw ingest; this is
    * the batch pass a corpus generation closes with.
    *
    * @return output parquet file count. */
  def c4SpanCompact(spark: SparkSession, sinkDir: String,
      outputDir: String, textCol: String, idCol: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long =
    rewriteSized(spark, sinkDir, outputDir, targetFileBytes)(
      C4Rules.spanDedup(spark.read.parquet(sinkDir), idCol, textCol))

  /** Retention over a [[graft.streaming.CurateStream]] sink: drop every
    * `batch_id=k` partition with k < `keepFrom` — a pure directory
    * delete (no rewrite), which is what partitioning the sink by batch
    * buys. The hash index is deliberately NOT trimmed: expired
    * content's hashes keep gating re-arrival of the same bytes (the
    * usual retention contract — data leaves, dedup memory stays). If
    * re-admission after expiry is wanted instead, delete the index and
    * let the stream's bootstrap rebuild it from the remaining sink.
    * Note `keepFrom = 0` also expires a migrated legacy generation
    * (`batch_id=-1`). Returns the number of partitions removed. */
  def expireBatches(spark: SparkSession, sinkDir: String, keepFrom: Long): Long = {
    val path = new org.apache.hadoop.fs.Path(sinkDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else fs.listStatus(path).toSeq
      .filter { s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id=") &&
          s.getPath.getName.stripPrefix("batch_id=").toLongOption.exists(_ < keepFrom)
      }
      .count(s => fs.delete(s.getPath, true)).toLong
  }

  /** In-place compaction of a CurateStream hash index, which grows one
    * small file per micro-batch: rewrite to a scratch dir, then swap.
    * Run between stream runs (the stream reads the index per batch).
    * Crash-safe by way of the stream's own bootstrap: if the swap dies
    * between delete and rename, the next batch finds a sink without an
    * index and rebuilds it from the sink's pruned hash columns
    * ([[graft.streaming.CurateStream]] `ensureMigrated`) — slower once,
    * never wrong. Returns the output file count. */
  def compactIndexInPlace(spark: SparkSession, idxDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val tmp = idxDir + "_compact.tmp"
    val n = compactParquet(spark, idxDir, tmp, targetFileBytes)
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxDir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(idxDir))
    n
  }

  /** Z-order (Morton-curve) layout rewrite over two numeric
    * dimensions: each dimension is min/max-scaled to 16 bits, the bits
    * interleaved into one z-value, and the frame written as `nFiles`
    * contiguous z-ranges (range partition + partition-local sort).
    *
    * Why this matters at 100 TB: a linear sort order serves predicates
    * on ITS leading column only — parquet min/max stats on any other
    * column span the full domain in every file, so nothing prunes. The
    * z-curve keeps both dimensions locally bounded per file, so a 2-D
    * box predicate (customer range x date range) skips the row groups
    * of every file whose z-range misses the box — turning a full-corpus
    * scan into ~sqrt-coverage I/O without any engine support beyond
    * ordinary stats pruning (ZorderSpec measures the scan-row drop vs
    * a linear layout on the same data and predicate).
    *
    * The scaling stats come from one 1-row aggregate that broadcasts.
    * Scaling runs in exact integer arithmetic: the (value - min) *
    * 65535 product is computed as DECIMAL(38,0) (exact for any pair
    * of longs — a double product is only exact while the dimension
    * range stays under ~2^37, which an epoch-micros dimension blows
    * past) and bucketed with integral `div`. The only precondition
    * left is (max - min) itself fitting in a long — i.e. a dimension
    * spanning more than 2^63 of its own unit, which no physical
    * column does. Constant dimensions scale to 0 (the degenerate
    * range guard), leaving the other dimension a plain sort. The
    * layout job's one range exchange is the cost any re-layout pays;
    * readers pay nothing.
    *
    * Stats caveat: pruning happens on the STORED column's parquet
    * min/max, and Spark 4.1 never builds row-group predicates for
    * TIMESTAMP_NTZ columns — store timestamp pruning dimensions as TZ
    * timestamps written TIMESTAMP_MICROS, or as epoch longs
    * (ZorderSpec measures both the win and this caveat).
    */
  def zorderWrite(df: DataFrame, dimA: org.apache.spark.sql.Column,
      dimB: org.apache.spark.sql.Column, outDir: String, nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val scaled = withScaled16(df, dimA, dimB)
    val z = (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(col("__z_a"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(col("__z_b"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
    writeCurveOrdered(scaled, z, outDir, nFiles)
  }

  /** Hilbert-curve clustered rewrite — [[zorderWrite]]'s layout with the
    * continuous curve: consecutive curve positions are always grid
    * NEIGHBORS, so a run of positions (= one output file) has a compact
    * bounding box, where the Z curve's power-of-two jumps stretch some
    * files' min/max boxes across the domain and those files survive
    * every manifest prune. Same exact-integer 16-bit scaling, same
    * range-partitioned write; the curve index is the engine's native
    * codegen expression ([[graft.expressions.HilbertIndex32]]), so the
    * rewrite stays whole-stage-codegen'd scan-to-exchange. HilbertSpec
    * measures the box-query file-skip win over the z-order layout; the
    * same parquet stats caveat as zorderWrite applies (store timestamp
    * dims as TZ micros or epoch longs). */
  def hilbertWrite(df: DataFrame, dimA: org.apache.spark.sql.Column,
      dimB: org.apache.spark.sql.Column, outDir: String, nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val scaled = withScaled16(df, dimA, dimB)
    val h = graft.expressions.HilbertIndex32(df.sparkSession,
      col("__z_a").cast("long"), col("__z_b").cast("long"))
    writeCurveOrdered(scaled, h, outDir, nFiles)
  }

  /** Scale two long-castable dims to [0, 65535] against their global
    * min/max: exact-integer bucket ((v - lo) * 65535) div max(1, hi-lo),
    * the product in DECIMAL(38,0) (never wraps; `div` on decimals is
    * exact integral division, no rounded-double floor). The stats frame
    * is ONE row, broadcast — planner metadata, not a data shuffle.
    * Appends __z_a / __z_b plus the raw/stat scratch columns that
    * [[writeCurveOrdered]] drops before writing. */
  private def withScaled16(df: DataFrame, dimA: org.apache.spark.sql.Column,
      dimB: org.apache.spark.sql.Column): DataFrame = {
    val stats = df.agg(
      min(dimA.cast("long")).as("__z_amin"), max(dimA.cast("long")).as("__z_amax"),
      min(dimB.cast("long")).as("__z_bmin"), max(dimB.cast("long")).as("__z_bmax"))
    def scale16(vCol: String, lo: String, hi: String) =
      expr(s"CAST(($vCol - $lo) AS DECIMAL(38,0)) * 65535" +
        s" div greatest(CAST(1 AS BIGINT), $hi - $lo)")
    df.crossJoin(broadcast(stats))
      .withColumn("__z_va", dimA.cast("long"))
      .withColumn("__z_vb", dimB.cast("long"))
      .withColumn("__z_a", scale16("__z_va", "__z_amin", "__z_amax"))
      .withColumn("__z_b", scale16("__z_vb", "__z_bmin", "__z_bmax"))
  }

  /** Range-partition on the curve index, sort within partitions, drop
    * the scratch columns, write. One shuffle sized by nFiles. */
  private def writeCurveOrdered(scaled: DataFrame,
      curve: org.apache.spark.sql.Column, outDir: String, nFiles: Int): Unit =
    scaled.withColumn("__z", curve)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__z_a", "__z_b", "__z_va", "__z_vb",
        "__z_amin", "__z_amax", "__z_bmin", "__z_bmax")
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** Per-file min/max manifest over long-valued columns — file-level
    * data skipping, the layer Spark itself does not provide: parquet
    * row-group stats prune WITHIN a file only after the reader has
    * listed it, opened it and read its footer, so at 100 TB the
    * per-file planning cost dominates selective queries. The manifest
    * is one small parquet table (file, min_c, max_c per column) built
    * from a single data scan; [[readWithManifest]] turns a conjunction
    * of column intervals into the file subset whose ranges intersect,
    * and reads only those. Composes with [[zorderWrite]]: the z-curve
    * is what makes BOTH columns' per-file ranges tight.
    *
    * Returns the number of data files manifested. */
  def writeManifest(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): Long = {
    require(cols.nonEmpty, "manifest needs at least one column")
    val df = spark.read.parquet(dataDir)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"min_$c"),
      max(col(c).cast("long")).as(s"max_$c")))
    val m = df.withColumn("__file", input_file_name())
      .groupBy(col("__file").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    m.coalesce(1).write.mode(SaveMode.Overwrite).parquet(manifestDir)
    spark.read.parquet(manifestDir).count()
  }

  /** Manifest-pruned read: keep every file whose [min, max] range
    * intersects the query interval in EVERY listed column, then read
    * only those files. The driver-side collect is a FILE LIST — the
    * same planning metadata any catalog ships — never data rows; its
    * size is the file count after pruning. An empty survivor set
    * returns an empty frame with the data schema. */
  def readWithManifest(spark: SparkSession, dataDir: String,
      manifestDir: String, intervals: Map[String, (Long, Long)]): DataFrame = {
    require(intervals.nonEmpty, "pruned read needs at least one interval")
    val m = spark.read.parquet(manifestDir)
    val pred = intervals.map { case (c, (lo, hi)) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo
    }.reduce(_ && _)
    val files = m.filter(pred).select(col("file")).collect().map(_.getString(0))
    readFiles(spark, dataDir, files)
  }

  /** Read exactly `files` (URI-encoded, as input_file_name() yields
    * them) from a data directory; an empty list short-circuits to an
    * empty frame with the data schema. Shared by both pruned-read
    * paths so the URI-decoding subtlety lives once. */
  private def readFiles(spark: SparkSession, dataDir: String,
      files: Array[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(dataDir).schema)
    else {
      // input_file_name() yields URI-ENCODED strings ("my%20dir");
      // Hadoop's Path(String) parser does not decode, so feed it the
      // decoded form via the Path(URI) constructor or a path with a
      // space never resolves again
      val decoded = files.map(f =>
        new org.apache.hadoop.fs.Path(new java.net.URI(f)).toString)
      spark.read.parquet(decoded.toIndexedSeq: _*)
    }

  /** Per-file Bloom manifest over a key column — the point-lookup
    * complement of [[writeManifest]]'s min/max ranges (the
    * Iceberg-bloom idea): each data file contributes one `mBits`-bit
    * bitmap of its key values, so an equality probe can prune to the
    * files whose bitmap MIGHT contain the key before any footer is
    * opened. Min/max ranges prune range predicates but are useless
    * for point lookups on a column the layout isn't sorted by; the
    * bloom prunes those at ~(1 - e^(-kn/m))^k false-positive cost,
    * never false negatives. `mBits`/`k` are recorded in the manifest
    * rows so the probe side cannot drift from the build. */
  def writeBloomManifest(spark: SparkSession, dataDir: String,
      manifestDir: String, keyCol: String, mBits: Int = 1024,
      k: Int = 4): Long = {
    val keys = spark.read.parquet(dataDir)
      .withColumn("__file", input_file_name())
      .select(col("__file").as("file"),
        col(keyCol).cast("string").as("__key"))
      .filter(col("__key").isNotNull)
    val m = Sketches.bloomBuildGrouped(keys, "file", "__key", mBits, k)
      .withColumn("m_bits", lit(mBits)).withColumn("k_hashes", lit(k))
    m.coalesce(1).write.mode(SaveMode.Overwrite).parquet(manifestDir)
    spark.read.parquet(manifestDir).count()
  }

  /** Bloom-manifest point lookup: open only the files whose bitmap
    * might contain `value`, then apply the EXACT equality filter —
    * bloom false positives cost wasted file reads, never wrong rows.
    * The collect is the pruned FILE LIST (planning metadata), as in
    * [[readWithManifest]]; an empty survivor set short-circuits to an
    * empty frame. */
  def readPointLookup(spark: SparkSession, dataDir: String,
      manifestDir: String, keyCol: String, value: String): DataFrame =
    readPointLookupMany(spark, dataDir, manifestDir, keyCol, Seq(value))

  /** [[readPointLookup]] for a BATCH of keys in one manifest pass: the
    * candidate file set is the union of each key's bloom survivors
    * (one manifest scan, one collect of planning metadata, one pruned
    * read) and the exact filter is `keyCol IN values` — identical rows
    * to unioning per-key lookups, at 1/N of the driver round-trips
    * (r16: q144's three lookups ran 3 manifest scans + 3 pruned reads
    * = ~12 extra jobs of pure scheduling at bench scale). */
  def readPointLookupMany(spark: SparkSession, dataDir: String,
      manifestDir: String, keyCol: String,
      values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "readPointLookupMany needs at least one key")
    val m = spark.read.parquet(manifestDir)
    // a manifest over an all-null or empty key column has zero rows —
    // nothing can match, mirror readWithManifest's empty short-circuit
    // rather than dying on head() of nothing
    val files = m.select(col("m_bits"), col("k_hashes")).limit(1)
      .collect().headOption match {
      case None => Array.empty[String]
      case Some(meta) =>
        m.filter(values.map(v =>
            Sketches.bloomMightContain(col("bloom"), lit(v),
              meta.getInt(0), meta.getInt(1))).reduce(_ || _))
          .select(col("file")).collect().map(_.getString(0))
    }
    val pruned = readFiles(spark, dataDir, files)
    // Exact filter: probe values arrive as strings (the manifest's
    // key form); typing the LITERALS to the key column's type keeps
    // the predicate a parquet-pushable `In(keyCol, ...)` — casting
    // the COLUMN to string instead (the r16 spelling) blocked
    // pushdown entirely, so every bloom-surviving file was scanned
    // in full (guide §6: PushedFilters must reach the scan). Only
    // safe when every value ROUND-TRIPS through the key type (a
    // typed cast would e.g. match '07' where string equality does
    // not); non-round-tripping probes keep the string-compare path.
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val typed: Option[Seq[Any]] = pruned.schema(keyCol).dataType match {
      case StringType => Some(values)
      case LongType => scala.util.Try {
        values.map { v => require(v.toLong.toString == v); v.toLong }
      }.toOption
      case IntegerType => scala.util.Try {
        values.map { v => require(v.toInt.toString == v); v.toInt }
      }.toOption
      case _ => None
    }
    typed match {
      case Some(vs) => pruned.filter(col(keyCol).isin(vs: _*))
      case None => pruned.filter(col(keyCol).cast("string").isin(values: _*))
    }
  }

  /** Algebraic per-key summary of a long-valued column: (cnt, sum,
    * min, max, sumsq). Every field merges by sum/min/max, so a summary
    * maintained incrementally batch-by-batch is EXACTLY the one
    * recomputed from the full corpus — exact state, no float drift,
    * no merge-order sensitivity. This is how a live corpus keeps its
    * datasheet current at 100 TB: each ingest batch contributes
    * keyedStats(batch) (O(batch) work, map-side combined), and
    * [[mergeKeyedStats]] folds it into the running summary (O(summary)
    * — key-cardinality rows, not corpus rows). Mean/variance/stddev
    * derive from (cnt, sum, sumsq) at read time.
    *
    * `vsumsq` accumulates as DECIMAL(38,0): the square is exact for
    * ANY long value (v*v in LongType wraps silently past |v| ~ 3e9)
    * and 38 digits absorb every physical corpus total. `vsum` stays
    * LongType — it only wraps past a 9.2e18 TOTAL, and keeping it a
    * long is what lets consumers (q102) read the summary without a
    * cast. Cast vsumsq back to long at read time when the total is
    * known to fit. */
  def keyedStats(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key)).agg(
      count(lit(1)).as("cnt"),
      sum(col(value)).as("vsum"),
      min(col(value)).as("vmin"),
      max(col(value)).as("vmax"),
      sum(col(value).cast("decimal(19,0)") * col(value).cast("decimal(19,0)"))
        .as("vsumsq"))

  /** Fold one batch summary into a running summary (both shaped by
    * [[keyedStats]] or prior merges): union + per-key re-aggregation.
    * Associative and commutative, so any fold tree gives the same
    * rows. */
  def mergeKeyedStats(running: DataFrame, batch: DataFrame, key: String): DataFrame =
    running.unionByName(batch).groupBy(col(key)).agg(
      sum(col("cnt")).as("cnt"),
      sum(col("vsum")).as("vsum"),
      min(col("vmin")).as("vmin"),
      max(col("vmax")).as("vmax"),
      sum(col("vsumsq")).as("vsumsq"))
}
