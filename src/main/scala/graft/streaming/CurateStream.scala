package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Portable
import graft.operators.{C4Rules, Curate, Dedup, GopherRules, Similarity}

/** Streaming curation: the batch [[Curate]] pipeline applied per
  * micro-batch via foreachBatch — the production shape of continuous
  * corpus ingestion (new document files land, each batch is gated,
  * deduped and appended).
  *
  * Cross-batch semantics: each batch curates INTERNALLY with the full
  * pipeline, then drops documents whose content hash already exists in
  * a compact HASH-INDEX table (`outDir`_hashidx) — so exact duplicates
  * never land twice, across batches AND across failure/replay. Near-dup
  * removal is within-batch by default, with cross-batch NEAR dups left
  * to a periodic compaction job over the landed corpus
  * ([[graft.operators.Dedup]] + [[graft.operators.Maintenance]]);
  * `nearDupAcrossBatches = true` additionally gates them at ingest
  * against persistent MinHash sketch indexes (see [[nearDupTainted]]).
  *
  * The index holds the two independently-salted 60-bit content hashes
  * plus the landing batch (`content_hash`, `content_hash2`, `batch_id`):
  * the anti-join keys on BOTH hashes (the same ~2^-120 pair-collision
  * bound as [[Dedup.exact]] — one 60-bit hash starts merging distinct
  * documents around 10^9 of them). Per-batch dedup cost is one scan of
  * the 16-byte-per-doc index — the corpus parquet itself is NEVER read
  * on the dedup path (CurateStreamSpec proves it by hiding the landed
  * data files), which is what keeps a long-lived stream viable: the old
  * shape (anti-join against the sink's own hash columns) touched every
  * corpus file's footer every batch. At real corpus scale the index
  * would additionally be bucketed on `content_hash` so the anti-join
  * co-locates without a shuffle; same join shape.
  *
  * Exactly-once across replays (foreachBatch may re-deliver the last
  * uncommitted batch): the sink is partitioned by `batch_id`, and the
  * anti-join unions the index with the hashes already landed under
  * `batch_id >= currentBatch` — a partition-PRUNED read that is empty
  * except during a replay, when it contains exactly the rows a failed
  * prior attempt appended. The index is then caught up with every
  * curated hash it is missing (not just this attempt's `fresh` rows),
  * so a crash between the sink append and the index append repairs
  * itself on the next attempt, and a crash after both appends makes the
  * replay a pure no-op (both writes append nothing).
  *
  * Sinks written by the pre-index flat format (no `batch_id=`
  * partitions, no index table) are migrated in place on first contact —
  * or failed fast when unmigratable — see [[ensureMigrated]].
  */
object CurateStream {

  val HashCol = "content_hash"
  val HashCol2 = "content_hash2"
  val BatchCol = "batch_id"

  /** The compact hash-index table that travels with a curated sink. */
  def indexDir(outDir: String): String = outDir + "_hashidx"

  /** LSH band index (exploded (band, key, content_hash) rows) for the
    * opt-in cross-batch NEAR-dup gate. */
  def bandIndexDir(outDir: String): String = outDir + "_bandidx"

  /** MinHash signature index (content_hash, m0..m{K-1}) — the sketch
    * the near-dup gate verifies candidates against. */
  def sigIndexDir(outDir: String): String = outDir + "_sigidx"

  /** Opt-in SEMANTIC decontamination gate — the embedding-space
    * complement of the token `evalDocs` gate (a paraphrased leak never
    * matches a hash probe but still lands next to its source in
    * embedding space). `assignTable` names a STANDING
    * [[Similarity.buildSrpIndex]] table holding the eval suite's
    * embeddings (static per release — the gate reads it, never grows
    * it; refresh the suite with `appendSrpIndex` between releases):
    * each arriving batch's `vecCol` vectors are scored with
    * [[Similarity.srpIndexMatchesAcross]] and rows with any match at
    * `threshold` are dropped before landing. The per-batch cost is the
    * batch broadcasting into one bucket equi-join — the landed corpus
    * and the index never shuffle, and the decision is deterministic
    * (replay re-derives the same drops, the [[nearDupTainted]] rule).
    * (bits, dim, tables) must equal the index's build parameters —
    * [[Similarity.requireSrpParams]] fails fast on a mismatch.
    *
    * Rows whose vector is null, zero-norm or NaN-poisoned are
    * UNSCOREABLE: they can never match any index entry, so the gate
    * drops them fail-closed (never admitted, never indexed) and
    * reports the count through the ObservedWarn channel — a decon
    * gate that silently waived itself for malformed rows would be the
    * worst failure mode.
    *
    * OPERATIONAL: refresh the suite (appendSrpIndex) only while the
    * stream is STOPPED — the maintenance-window convention every index
    * here follows. Appending between a crash and its epoch replay
    * changes the admissible set mid-epoch, and a row the failed
    * attempt landed could then be re-judged inadmissible: it stays in
    * the sink (the replay guard keeps it out of `fresh`) but never
    * enters the hash index, so an identical later arrival would land a
    * duplicate. With the index fixed across an epoch's attempts the
    * gate is deterministic and every catch-up repairs exactly. */
  final case class SemanticGate(assignTable: String, vecCol: String,
      threshold: Double, bits: Int, dim: Int, tables: Int,
      broadcastProbes: Boolean = true)

  /** Opt-in CCNet-bucket admission gate (Wenzek et al. 2020 deployed:
    * the q272/q274 recipe as an ingest stage): each arriving row's
    * text is scored against the FROZEN reference LM at `lmDir`
    * ([[LmStream.score]]'s float-free milli-bits) and bucketed
    * head/middle/tail against a FROZEN per-language boundary table
    * `boundaries` (lang, b1, b2) — computed once from a reference
    * scored population via [[CcnetStream.boundariesOf]] and fixed for
    * the release, under the same maintenance-window rule as the LM
    * and the SRP index (a model or boundary move between a crashed
    * epoch and its replay would re-judge the epoch and defeat the
    * exactly-once repair). Rows whose bucket is not in `keep` are
    * dropped — the recipe's keep-fraction decision.
    *
    * Rows the gate CANNOT judge are dropped FAIL-CLOSED and counted
    * (the [[SemanticGate]] rule): a document with fewer than 2 tokens
    * has no bigrams to score (q262's rule — batch CCNet drops it
    * too), and a language absent from the boundary table has no
    * terciles to bucket against. Both are deterministic, so replays
    * re-derive the same drops.
    *
    * The per-batch cost is the scoring joins (vocabulary-keyed, the
    * model side aggregates then broadcasts — q263's class) plus a
    * broadcast of the languages-cardinality boundary table; the
    * landed corpus is never read. */
  final case class BucketGate(lmDir: String, boundaries: DataFrame,
      langCol: String = "lang", keep: Set[String] = Set("head", "middle"))

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      s.getPath.getName.endsWith(".parquet") ||
        s.getPath.getName.startsWith(s"$BatchCol=")
    }
  }

  /** Root-level parquet files = a sink written by the pre-index flat
    * format (no `batch_id=` partitions, no hash-index table). */
  private def legacyFlatFiles(spark: SparkSession, dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => fs.getFileStatus(f).isFile && f.getName.endsWith(".parquet"))
  }

  /** One-time, idempotent migration of a pre-index sink. Without it the
    * new format SILENTLY forgets everything already landed: legacy files
    * carry no `batch_id` column (the replay-guard read would yield NULL
    * and drop every row) and no index exists (the anti-join set would be
    * empty), so previously-landed content re-lands as duplicates.
    *
    * Flat root files are rewritten under `batch_id=-1` (mode overwrite,
    * so a crashed prior attempt just redoes the partition) and then
    * deleted; the index, if missing, is rebuilt from the sink's own hash
    * columns — a column-pruned 16-byte-per-doc scan. A flat sink WITHOUT
    * the hash columns cannot be migrated in place (the text would need
    * re-hashing under this pipeline's salts) and fails fast instead of
    * proceeding with an empty anti-join set. The per-batch cost when no
    * migration is pending is one directory listing; at real corpus scale
    * the same steps run as a standalone maintenance job before the
    * stream starts — this in-stream path is the safety net, not the
    * plan.
    */
  private def ensureMigrated(spark: SparkSession, outDir: String,
      idxDir: String): Unit = {
    val flats = legacyFlatFiles(spark, outDir)
    if (flats.nonEmpty) {
      val legacy = spark.read.parquet(flats.map(_.toString): _*)
      val cols = legacy.columns.toSet
      if (!cols.contains(HashCol) || !cols.contains(HashCol2))
        throw new IllegalStateException(
          s"curated sink at $outDir is in the legacy flat format and lacks " +
            s"the ($HashCol, $HashCol2) columns; re-curate the corpus into " +
            "a fresh sink (or add the hashes with graft.functions.Portable." +
            "pmd5/pmd5Salted) before streaming into it — continuing would " +
            "silently re-land previously curated content")
      legacy.write.mode("overwrite").parquet(s"$outDir/$BatchCol=-1")
      val fs = new Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      flats.foreach(fs.delete(_, false))
    }
    if (hasData(spark, outDir) && !hasData(spark, idxDir))
      spark.read.parquet(outDir)
        .groupBy(HashCol, HashCol2)
        .agg(min(BatchCol).as(BatchCol))
        .write.mode("overwrite").parquet(idxDir)
  }

  /** Ingest-time cross-batch NEAR-dup gate: candidates come from an
    * equi-join of the batch's LSH band keys against the persistent band
    * index, and are adjudicated by MINHASH AGREEMENT against the
    * signature index — the sketch estimate of Jaccard (q84's
    * measurement), because storing what an exact verify would need (the
    * landed corpus's token sets) is O(corpus text), which is exactly
    * what the index design exists to avoid. Sketch state per landed doc
    * is bands (4 x 24 B) + signature (K x 8 B + hash): ~230 B against
    * ~1 KB of document — and the gate's decision is deterministic, so a
    * crash replay re-derives the same drops. Exact near-dup remains the
    * compaction job's business ([[graft.operators.Maintenance]]); at
    * real corpus scale the band index is a table BUCKETED on `key`, so
    * the per-batch join co-locates and prunes instead of shuffling the
    * index. */
  private def nearDupTainted(spark: SparkSession, cands: DataFrame,
      newSig: DataFrame, sigIdxDir: String, cfg: Curate.Config): DataFrame = {
    val k = cfg.minhashK
    val sigSchema = (HashCol +: (0 until k).map(i => s"m$i") :+ BatchCol)
      .map(c => s"$c BIGINT").mkString(", ")
    val oldSig = spark.read.schema(sigSchema).parquet(sigIdxDir)
      .select(col(HashCol).as("__oh") +: (0 until k).map(i => col(s"m$i").as(s"o$i")): _*)
    val newSigN = newSig
      .select(col(HashCol).as("__nh") +: (0 until k).map(i => col(s"m$i").as(s"n$i")): _*)
    val agree = (0 until k)
      .map(i => when(col(s"n$i") === col(s"o$i"), 1).otherwise(0))
      .reduce(_ + _)
    val minAgree = math.ceil(cfg.nearDupThreshold * k).toInt
    cands
      .join(newSigN, "__nh").join(oldSig, "__oh")
      .groupBy(col("__nh")).agg(max(agree).as("__agree"))
      .filter(col("__agree") >= minAgree)
      .select(col("__nh").as(HashCol))
  }

  /** @param evalDocs held-out eval suite for per-batch decontamination
    *                  (see [[Curate]]); a STATIC frame — it joins each
    *                  micro-batch inside foreachBatch.
    * @param nearDupAcrossBatches opt-in ingest-time near-dup gate
    *                  against the landed corpus's MinHash sketches (see
    *                  [[nearDupTainted]]); off = near-dup removal stays
    *                  within-batch + periodic compaction.
    * @param semanticGate opt-in embedding-space decon gate against a
    *                  standing eval-suite SRP index (see
    *                  [[SemanticGate]]); requires the stream's rows to
    *                  carry the configured vector column.
    * @param ruleGate opt-in Gopher-style structural rule gate
    *                  ([[GopherRules.passes]] — the SAME statement
    *                  q273 oracles): a pure per-row projection, run
    *                  FIRST because it is the cheapest stage (the
    *                  recipe's rules-before-models order).
    * @param bucketGate opt-in CCNet perplexity-bucket gate against a
    *                  frozen LM + frozen boundary table (see
    *                  [[BucketGate]]); requires the stream's rows to
    *                  carry the configured language column.
    * @param repetitionGate opt-in Gopher REPETITION gate
    *                  ([[GopherRules.repetitionFlags]] — the SAME
    *                  statement q277 oracles): top-{2,3,4}-gram
    *                  coverage caps and the zero-tolerance duplicate
    *                  3-gram rule. Content-only and deterministic
    *                  (replay-safe); runs after the structural rules
    *                  — it is the first gate that aggregates (its
    *                  gram counts are batch-local, no model, no
    *                  standing state).
    * @param termGate opt-in C4 page-TERM gate
    *                  ([[C4Rules.termPass]] — the SAME statement q91
    *                  audits and q275 scores): a page containing ANY
    *                  blocklisted term (badwords / 'lorem ipsum' /
    *                  braces in the paper) never lands. A pure
    *                  per-row projection grouped with the rule gate;
    *                  a production-sized list broadcasts instead of
    *                  inlining.
    * @param c4Gate opt-in C4 structural PAGE gate
    *                  ([[C4Rules.pagePass]] — the SAME statement q283
    *                  audits and q275 scores): at least
    *                  [[C4Rules.MinSentences]] content-defined
    *                  sentences survive the line rules. A pure per-row
    *                  projection, grouped with the rule gate
    *                  (admission only — the gate never rewrites text;
    *                  the keep-one SPAN dedup is cross-batch state and
    *                  lives in [[SpanDedupStream]] / the periodic
    *                  batch [[C4Rules.spanDedup]] over the landed
    *                  corpus, the cutRepeatedRuns convention below).
    * @note ALL row-dropping gates run BEFORE the curation pipeline
    *       picks exact/near-dup representatives — a gated min-id
    *       representative must not silently take its admissible
    *       duplicates down with it (the semantic-gate invariant,
    *       spec-pinned); gate order among themselves is cost order
    *       (rules -> bucket -> semantic), correctness-neutral because
    *       each is an independent row predicate.
    * @note `cfg.cutRepeatedRuns` applies WITHIN each micro-batch only —
    *       a run duplicated across batches is not cut here (that would
    *       need a persistent gram index); run the batch
    *       [[graft.operators.Dedup.cutRepeatedRuns]] over the landed
    *       corpus during maintenance for the global mask. */
  def start(docs: DataFrame, textCol: String, idCol: String,
      outDir: String, checkpointDir: String,
      cfg: Curate.Config = Curate.Config(),
      trigger: Trigger = Trigger.AvailableNow(),
      evalDocs: Option[DataFrame] = None,
      nearDupAcrossBatches: Boolean = false,
      semanticGate: Option[SemanticGate] = None,
      ruleGate: Boolean = false,
      bucketGate: Option[BucketGate] = None,
      repetitionGate: Boolean = false,
      c4Gate: Boolean = false,
      termGate: Option[Seq[String]] = None): StreamingQuery = {
    semanticGate.foreach { g =>
      require(docs.columns.contains(g.vecCol),
        s"semanticGate requires the stream to carry '${g.vecCol}'; " +
          s"columns: ${docs.columns.mkString(", ")}")
    }
    bucketGate.foreach { g =>
      require(docs.columns.contains(g.langCol),
        s"bucketGate requires the stream to carry '${g.langCol}'; " +
          s"columns: ${docs.columns.mkString(", ")}")
      require(g.keep.nonEmpty && g.keep.subsetOf(Set("head", "middle", "tail")),
        s"bucketGate.keep must name buckets, got ${g.keep}")
    }
    val step: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val spark = batch.sparkSession
      val idxDir = indexDir(outDir)
      ensureMigrated(spark, outDir, idxDir)
      // opt-in RULE gate first: one per-row integer projection (no
      // join, no shuffle) — the recipe's rules-before-models order.
      // Deterministic, so replays re-derive the same admissible set.
      val afterStructural0 =
        if (!ruleGate) batch.toDF()
        else batch.toDF().filter(GopherRules.passes(col(textCol)))
      // opt-in C4 PAGE gate: the q283/q275 statement — another pure
      // per-row integer projection, same cost class as the rule gate
      val afterStructural1 =
        if (!c4Gate) afterStructural0
        else afterStructural0.filter(C4Rules.pagePass(col(textCol)))
      // opt-in C4 page-TERM gate: the q91/q275 statement — one
      // arrays_overlap per row, still the pure-projection cost class
      val afterStructural = termGate match {
        case None => afterStructural1
        case Some(terms) =>
          require(terms.nonEmpty, "termGate needs a non-empty blocklist")
          afterStructural1.filter(C4Rules.termPass(col(textCol), terms))
      }
      // opt-in REPETITION gate: the q277 flags over this batch (the
      // shared GopherRules statement), batch-local and deterministic
      val afterRules =
        if (!repetitionGate) afterStructural
        else afterStructural.join(
          GopherRules.repetitionFlags(
              afterStructural.select(col(idCol), col(textCol)),
              idCol, textCol)
            .filter(col("rep_pass")).select(col(idCol)),
          Seq(idCol), "left_semi")
      // opt-in CCNet BUCKET gate: score against the frozen LM, bucket
      // against the frozen boundaries, keep only the configured
      // buckets. Unjudgeable rows (no bigrams / unknown language)
      // drop fail-closed AND counted.
      val afterBucket = bucketGate match {
        case None => afterRules
        case Some(g) =>
          val scored = LmStream.score(spark, g.lmDir,
              afterRules.select(col(idCol).as("doc_id"),
                col(textCol).as("text")))
            .select(col("doc_id").as(idCol),
              col("milli_bits_per_bigram").as("__mbits"))
          val joined = afterRules
            .join(scored, Seq(idCol), "left")
            .join(broadcast(g.boundaries.select(
                col("lang").as("__blang"), col("b1").as("__b1"),
                col("b2").as("__b2"))),
              col(g.langCol) === col("__blang"), "left")
          val unjudgeable = col("__mbits").isNull || col("__b1").isNull
          // the SAME tie-to-lower arithmetic as CcnetStream.bucketsOf
          val bucket = when(col("__mbits") <= col("__b1"), "head")
            .when(col("__mbits") <= col("__b2"), "middle")
            .otherwise("tail")
          graft.operators.ObservedWarn(joined, "curate_bucket_unjudgeable",
              sum(when(unjudgeable, 1L).otherwise(0L)),
              n => s"bucket gate: $n row(s) dropped fail-closed — a " +
                "document with no bigrams cannot be scored and a " +
                "language absent from the frozen boundary table " +
                "cannot be bucketed; unjudgeable rows are never admitted")
            .filter(!unjudgeable && bucket.isin(g.keep.toSeq: _*))
            .drop("__mbits", "__blang", "__b1", "__b2")
      }
      // opt-in SEMANTIC decon gate: score the RAW batch against the
      // standing eval-suite SRP index and drop every row with a match
      // BEFORE the curation pipeline and before any index sees it —
      // contaminated content must neither land nor enter the
      // hash/sketch indexes (a leak must not become the landed doc a
      // later paraphrase deduplicates against). Gating ahead of Curate
      // matters for correctness, not just hygiene: Curate's exact/
      // near-dup stages pick ONE representative per duplicate group,
      // and a tainted representative would silently take its
      // admissible duplicates down with it — gate first and the group
      // re-resolves to an admissible survivor, matching the
      // batch-composed reference the spec pins. The gate is
      // deterministic, so a crash replay recomputes the same
      // admissible set and every index catch-up below repairs exactly.
      val admitted = semanticGate match {
        case Some(g) =>
          // fail CLOSED on unscoreable vectors: a null or zero-norm
          // (or NaN-poisoned) embedding can never match any index
          // entry, so letting it through would silently waive the gate
          // for exactly the rows most likely to be malformed. They are
          // dropped AND counted (the no-silent-caps rule, via the lazy
          // ObservedWarn metric the landing action reports).
          val sumSq = aggregate(col(g.vecCol), lit(0.0),
            (a, x) => a + x.cast("double") * x.cast("double"))
          // null-safed ONCE and shared by the count and the filter: a
          // vector with a NULL ELEMENT makes `aggregate` return NULL,
          // so the raw predicate evaluates to NULL — the filter would
          // still drop the row (null is not true) but the counter
          // would score it 0, a SILENT drop contradicting the
          // dropped-AND-counted invariant. coalesce(_, true) folds
          // every unknown into unscoreable = fail closed.
          val unscoreable = coalesce(
            col(g.vecCol).isNull || sumSq === 0.0 || isnan(sumSq),
            lit(true))
          val raw = graft.operators.ObservedWarn(afterBucket,
            "curate_semantic_unscoreable",
            sum(when(unscoreable, 1L).otherwise(0L)),
            n => s"semantic gate: $n row(s) with a null/zero-norm/NaN " +
              s"'${g.vecCol}' vector dropped fail-closed — unscoreable " +
              "rows cannot be decontaminated and are never admitted")
          val scoreable = raw.filter(!unscoreable)
          val tainted = Similarity.srpIndexMatchesAcross(spark,
              g.assignTable, scoreable.select(col(idCol), col(g.vecCol)),
              idCol, g.vecCol, g.threshold, g.bits, g.dim, g.tables,
              g.broadcastProbes)
            .filter(col("n_matches") > 0)
            .select(col("eval_id").as(idCol))
          scoreable.join(tainted, Seq(idCol), "left_anti")
        case None => afterBucket
      }
      // persisted: the curated frame feeds the landing write, the
      // hash-index catch-up and (opt-in) the sketch signing — without
      // it the whole Curate pipeline plus the semantic probe join
      // re-executes per consumer. Freed by the per-batch clearCache.
      val curated = Curate(admitted, textCol, idCol, cfg, evalDocs)
        .withColumn(HashCol, Portable.pmd5(col(textCol)))
        .withColumn(HashCol2, Portable.pmd5Salted(1, col(textCol)))
        .persist()

      val hashSchema = s"$HashCol BIGINT, $HashCol2 BIGINT, $BatchCol BIGINT"
      val idxHashes =
        if (!hasData(spark, idxDir)) None
        else Some(spark.read.schema(hashSchema).parquet(idxDir)
          .select(HashCol, HashCol2))
      // replay guard: hashes a failed prior attempt of THIS batch already
      // landed. The explicit pruned schema + partition filter mean no
      // corpus data file (and no prior-batch footer) is ever opened —
      // outside a replay the pruned file set is empty.
      val replayed =
        if (!hasData(spark, outDir)) None
        else Some(spark.read.schema(hashSchema).parquet(outDir)
          .filter(col(BatchCol) >= batchId)
          .select(HashCol, HashCol2))

      val anti = (idxHashes ++ replayed).reduceOption(_ union _)
      val fresh = anti
        .map(a => curated.join(a, Seq(HashCol, HashCol2), "left_anti"))
        .getOrElse(curated)

      // opt-in ingest-time near-dup gate against the landed corpus's
      // MinHash sketches; the batch is signed ONCE (sigBanded) for the
      // gate decision and the index catch-up below
      val k = cfg.minhashK
      val nb = k / cfg.bandsRows
      val bidDir = bandIndexDir(outDir)
      val sidDir = sigIndexDir(outDir)
      val sketch =
        if (!nearDupAcrossBatches) None
        else {
          val sigBanded = Dedup.bandKeys(
            Dedup.minhashSignature(
              curated.select(col(HashCol), col(textCol)),
              textCol, k, cfg.shingleLen),
            k, cfg.bandsRows).drop(textCol).persist()
          val tainted =
            if (!hasData(spark, bidDir)) sigBanded.select(col(HashCol)).limit(0)
            else {
              val bandSchema = s"band INT, key BIGINT, $HashCol BIGINT, $BatchCol BIGINT"
              val oldBands = spark.read.schema(bandSchema).parquet(bidDir)
                .select(col("band"), col("key"), col(HashCol).as("__oh"))
              val cands = Dedup.bandRows(sigBanded, HashCol, "__nh", nb)
                .join(oldBands, Seq("band", "key"))
                .filter(col("__nh") =!= col("__oh"))
                .select(col("__nh"), col("__oh")).distinct()
              nearDupTainted(spark, cands, sigBanded, sidDir, cfg)
            }
          Some((sigBanded, tainted))
        }
      val landing = sketch
        .map { case (_, tainted) => fresh.join(tainted, Seq(HashCol), "left_anti") }
        .getOrElse(fresh)
      landing.withColumn(BatchCol, lit(batchId))
        .write.mode("append").partitionBy(BatchCol).parquet(outDir)

      // sketch-index catch-up, one anti-join PER index so each repairs
      // its own crash window independently (appending sigs then dying
      // before the band append must not strand unbanded signatures)
      sketch.foreach { case (sigBanded, tainted) =>
        val survivors = sigBanded.join(tainted, Seq(HashCol), "left_anti")
        val sigSchema = (HashCol +: (0 until k).map(i => s"m$i") :+ BatchCol)
          .map(c => s"$c BIGINT").mkString(", ")
        val toSig =
          if (!hasData(spark, sidDir)) survivors
          else survivors.join(
            spark.read.schema(sigSchema).parquet(sidDir).select(HashCol),
            Seq(HashCol), "left_anti")
        toSig.select(
          (col(HashCol) +: (0 until k).map(i => col(s"m$i"))) :+
            lit(batchId).as(BatchCol): _*)
          .write.mode("append").parquet(sidDir)
        val bandSchema = s"band INT, key BIGINT, $HashCol BIGINT, $BatchCol BIGINT"
        val toBand =
          if (!hasData(spark, bidDir)) survivors
          else survivors.join(
            spark.read.schema(bandSchema).parquet(bidDir)
              .select(HashCol).distinct(),
            Seq(HashCol), "left_anti")
        Dedup.bandRows(toBand, HashCol, HashCol, nb)
          .withColumn(BatchCol, lit(batchId))
          .write.mode("append").parquet(bidDir)
      }

      // catch the index up with every curated hash it is missing — NOT
      // just `fresh`: after a crash between the two appends, the sink
      // holds rows the index has never seen, and this is where they're
      // repaired. Appends nothing on a clean replay.
      val newIdx = curated.select(HashCol, HashCol2).distinct()
      idxHashes.map(idx => newIdx.join(idx, Seq(HashCol, HashCol2), "left_anti"))
        .getOrElse(newIdx)
        .withColumn(BatchCol, lit(batchId))
        .write.mode("append").parquet(idxDir)
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
