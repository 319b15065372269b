package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Curate, Maintenance}

/** Streaming curation over arriving document files: per-batch gating +
  * dedup, cross-batch/cross-restart content idempotence via the hash
  * index, and the periodic near-dup compaction job over the sink. */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on a warm mat near the door of the house"
  private val other =
    "a completely different long document describing how the spark engine shuffles data between partitions during a wide transformation of the corpus"
  private val third =
    "yet another unique piece of text that talks at length about how a streaming query lands curated batches into the corpus sink over time"

  private val cfg = Curate.Config(minQuality = 0.4, nearDupThreshold = 0.7)

  /** Drop one parquet of `rows` into the stream's input dir. */
  private def stage(root: Path, name: String, rows: Seq[(Long, String)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve("in").resolve(s"$name.parquet"))
  }

  /** One AvailableNow run of the curation stream (a restart each call). */
  private def runOnce(root: Path, out: String, cp: String): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(root.resolve("in").toString)
    val q = CurateStream.start(stream, "text", "doc_id", out, cp, cfg)
    assert(q.awaitTermination(120000), "curation stream did not finish")
  }

  private def mkRoot(tag: String): (Path, String, String) = {
    val root = Files.createTempDirectory(tag)
    Files.createDirectories(root.resolve("in"))
    (root, root.resolve("out").toString, root.resolve("cp").toString)
  }

  test("per-batch curation + cross-batch exact dedup across a restart") {
    val (root, out, cp) = mkRoot("curate-stream")

    // batch 1: exact dup pair, a near-dup, a junk doc, one clean doc
    stage(root, "a", Seq(
      (0L, good), (1L, good),                    // exact dup inside the batch
      (2L, good.replace("warm", "cold")),        // near dup inside the batch
      (3L, "the a the a the a"),                 // quality-gated
      (4L, other)))
    runOnce(root, out, cp)
    val afterA = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(afterA == Set(0L, 4L), s"batch A curation wrong: $afterA")

    // batch 2 (separate stream run = restart): a cross-batch exact dup
    // of doc 0, an in-batch dup pair, and a fresh doc
    stage(root, "b", Seq(
      (7L, good),                                // exact dup of landed doc 0
      (8L, third), (9L, third),                  // in-batch exact dup pair
      (10L, other)))                             // exact dup of landed doc 4
    runOnce(root, out, cp)

    val landed = spark.read.parquet(out)
    val ids = landed.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 4L, 8L), s"cross-batch dedup wrong: $ids")
    // content idempotence: no text hash lands twice
    val dupHashes = landed
      .groupBy(graft.functions.Portable.pmd5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupHashes == 0, "duplicate content in the sink")
    // and the landed set equals batch curation of all distinct content
    val batchAll = Curate(
      Seq((0L, good), (2L, good.replace("warm", "cold")),
        (3L, "the a the a the a"), (4L, other), (8L, third))
        .toDF("doc_id", "text"),
      "text", "doc_id", cfg)
      .select("text").as[String].collect().toSet
    assert(landed.select("text").as[String].collect().toSet == batchAll)
  }

  test("semantic gate: contaminated rows neither land nor poison the " +
      "hash index; stream-curated output == the batch-composed gates") {
    import graft.operators.Similarity
    val (root, out, cp) = mkRoot("curate-sem")
    val (bits, dim, tables) = (5, 64, 4)
    val thr = 0.9 // corpus cross-cosines top out ~0.45: only a vector
                  // equal to an eval-suite vector can taint
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val evalSuite = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    Similarity.buildSrpIndex(evalSuite, "doc_id", "embedding",
      bits, dim, tables, "curate_sem_idx")
    def vecOf(id: Long): Array[Float] = emb.filter(col("vec_id") === id)
      .select("embedding").as[Array[Float]].head()
    val leakVec = vecOf(0L)   // IS an eval-suite vector: cosine 1
    val cleanVec = vecOf(40L) // ordinary corpus vector: below thr

    def stageEmb(name: String,
        rows: Seq[(Long, String, Array[Float])]): Unit = {
      val scratch = root.resolve(s"scratch_$name")
      rows.toDF("doc_id", "text", "embedding").coalesce(1)
        .write.parquet(scratch.toString)
      val part = Files.list(scratch).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, root.resolve("in").resolve(s"$name.parquet"))
    }
    def runGated(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, embedding ARRAY<FLOAT>")
        .parquet(root.resolve("in").toString)
      val q = CurateStream.start(stream, "text", "doc_id", out, cp, cfg,
        semanticGate = Some(CurateStream.SemanticGate(
          "curate_sem_idx", "embedding", thr, bits, dim, tables)))
      assert(q.awaitTermination(120000), "curation stream did not finish")
    }

    // batch 1: d0 is a PARAPHRASED leak (clean text, eval-suite
    // vector) -> semantic gate drops it; d1 is clean -> lands
    stageEmb("a", Seq((0L, good, leakVec), (1L, other, cleanVec)))
    runGated()
    val afterA = spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSet
    assert(afterA == Set(1L), s"batch A semantic gate wrong: $afterA")

    // batch 2 (restart): d2 leaks again (new text, leak vector) ->
    // dropped; d3 carries the SAME TEXT as dropped d0 with a clean
    // vector -> must LAND (the tainted row left no trace in the hash
    // index); d4 duplicates landed d1's content -> exact gate drops
    stageEmb("b", Seq((2L, third, leakVec), (3L, good, cleanVec),
      (4L, other, cleanVec)))
    runGated()
    val landed = spark.read.parquet(out)
    val ids = landed.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L), s"cross-batch semantic gating wrong: $ids")

    // the hash index holds admissible content ONLY: d2's text was
    // dropped semantically, so its hash must be absent
    val thirdHash = Seq(third).toDF("t")
      .select(graft.functions.Portable.pmd5(col("t"))).head().getLong(0)
    val idxHashes = spark.read
      .parquet(CurateStream.indexDir(out))
      .select(CurateStream.HashCol).as[Long].collect().toSet
    assert(!idxHashes.contains(thirdHash),
      "a semantically dropped row leaked into the hash index")

    // batch 3: an in-batch EXACT-DUP pair whose min-id REPRESENTATIVE
    // is the tainted row — the gate must run before the curation
    // pipeline picks representatives, or d5 (tainted, min id) would
    // silently take its admissible duplicate d6 down with it
    val fourth = "an entirely separate report counting how many curated " +
      "documents survive each gate of the admission pipeline every day"
    stageEmb("c", Seq((5L, fourth, leakVec), (6L, fourth, cleanVec)))
    runGated()
    val afterC = spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSet
    assert(afterC == Set(1L, 3L, 6L),
      s"a tainted representative must not drop its admissible " +
        s"duplicate: $afterC")

    // stream == the batch-composed gate matrix: semantic taint over
    // ALL arrived rows (the batch operator the index read is pinned
    // bit-identical to), then the batch curation pipeline over the
    // survivors
    val all = Seq((0L, good, leakVec), (1L, other, cleanVec),
      (2L, third, leakVec), (3L, good, cleanVec), (4L, other, cleanVec),
      (5L, fourth, leakVec), (6L, fourth, cleanVec))
      .toDF("doc_id", "text", "embedding")
    val semTaint = Similarity.srpCosineMatchesAcross(evalSuite, all,
        "doc_id", "embedding", thr, bits, dim, tables)
      .filter(col("n_matches") > 0)
      .select(col("eval_id").as("doc_id"))
    val composed = Curate(
      all.join(semTaint, Seq("doc_id"), "left_anti"),
      "text", "doc_id", cfg)
    // fresh read: the earlier `landed` frame listed files before batch 3
    val landedAll = spark.read.parquet(out)
    assert(landedAll.select("doc_id").as[Long].collect().toSet ==
      composed.select("doc_id").as[Long].collect().toSet,
      "stream-curated output diverged from the batch-composed gates")
    assert(landedAll.select("text").as[String].collect().toSet ==
      composed.select("text").as[String].collect().toSet)

    // fail-closed: an UNSCOREABLE vector (null / zero-norm) can never
    // match the index, so the gate must drop it — never admit it —
    // and report the count through the ObservedWarn channel
    graft.operators.ObservedWarn.clearFired("curate_semantic_unscoreable")
    val fifth = "one more clean and sufficiently long document whose " +
      "only defect is that its embedding vector never materialized"
    val sixth = "a final healthy document riding along so the batch " +
      "lands rows and the observed metric reports the partial drop"
    // a scoreable row rides along: ObservedWarn's documented AQE
    // caveat is that an ALL-empty result prunes the metric node —
    // the warning's purpose is the PARTIAL silent truncation
    stageEmb("d", Seq((7L, fifth, null),
      (8L, fifth + " v2", Array.fill(64)(0.0f)),
      (9L, sixth, cleanVec)))
    // a NaN-poisoning case the typed Seq cannot spell: a vector with a
    // NULL ELEMENT makes the sum-of-squares aggregate NULL — the
    // predicate must coalesce to unscoreable (dropped AND counted),
    // not evaluate to NULL (dropped but counted 0)
    val nullElem = Seq((10L, fifth + " v3")).toDF("doc_id", "text")
      .withColumn("embedding", expr("transform(sequence(1, 64), " +
        "i -> IF(i = 3, CAST(NULL AS FLOAT), CAST(0.1 AS FLOAT)))"))
    val scratchNE = root.resolve("scratch_ne")
    nullElem.coalesce(1).write.parquet(scratchNE.toString)
    Files.move(
      Files.list(scratchNE).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get,
      root.resolve("in").resolve("d2.parquet"))
    runGated()
    val afterD = spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSet
    assert(afterD == Set(1L, 3L, 6L, 9L),
      s"unscoreable rows must be dropped fail-closed: $afterD")
    val fifthHash = Seq(fifth).toDF("t")
      .select(graft.functions.Portable.pmd5(col("t"))).head().getLong(0)
    assert(!spark.read.parquet(CurateStream.indexDir(out))
      .select(CurateStream.HashCol).as[Long].collect().toSet
      .contains(fifthHash),
      "an unscoreable row leaked into the hash index")
    // async listener delivery: poll under a deadline (the
    // DedupIndexStream idiom) so a loaded host cannot lose the race
    var firedUnscoreable = graft.operators.ObservedWarn
      .lastFired("curate_semantic_unscoreable")
    val dlA = System.nanoTime() + 10_000_000_000L
    while (firedUnscoreable.isEmpty && System.nanoTime() < dlA) {
      Thread.sleep(50)
      firedUnscoreable = graft.operators.ObservedWarn
        .lastFired("curate_semantic_unscoreable")
    }
    assert(firedUnscoreable.contains(3L),
      "the fail-closed drop must be observed, not silent — the " +
        "null-element row counts too (coalesced predicate)")
    spark.catalog.clearCache()
    spark.sql("DROP TABLE IF EXISTS curate_sem_idx")
  }

  test("rule + bucket gates: the full public curation recipe as ONE " +
      "stream — landed output == the batch-composed q273∘q272 gates, " +
      "unjudgeable rows counted, tainted representatives powerless") {
    import graft.operators.GopherRules
    val (root, out, cp) = mkRoot("curate-recipe")

    // texts that pass the Gopher rules by construction: 2 stop words
    // + 32 distinct 8-char words -> nw=34, mean word length ~7.7,
    // diversity ~100% (and Curate's quality gate passes on length+TTR)
    def ruled(prefix: String): String =
      "the of " + (1 to 32).map(i => f"${prefix}wrd$i%02d").mkString(" ")
    val memorizedA = ruled("alpha")
    val memorizedB = ruled("beta")
    val memorizedC = ruled("cappa") // the exact-dup pair's text: its
    // token set overlaps the others only on the 2 stop words, so the
    // pair cannot NEAR-dup an earlier landed doc inside Curate
    val memorizedD = ruled("delta")
    // passes every STRUCTURAL rule but repeats a 3-gram: the
    // repetition gate (q277's shared statement) must drop it
    val repText = memorizedD +
      " deltawrd01 deltawrd02 deltawrd03 deltawrd01 deltawrd02 deltawrd03"
    val midC = "the of " + (1 to 16).map(i => f"alphawrd$i%02d")
      .mkString(" ") + " " + (17 to 32).map(i => f"gamma$i%02d").mkString(" ")
    val gibber = ruled("zzqxv")
    val shortDoc = "the of only ten words live inside this tiny text"

    // frozen reference LM: trained ONCE on the memorized texts,
    // repeated so seen bigrams score well below unseen ones
    val lmIn = root.resolve("lmtrain"); Files.createDirectories(lmIn)
    val lm = root.resolve("lm").toString
    locally {
      val rows = (1 to 20).flatMap(r => Seq(
        (1000L + r, memorizedA), (2000L + r, memorizedB),
        (3000L + r, memorizedC), (4000L + r, memorizedD)))
      val scratch = root.resolve("scratch_lm")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(scratch.toString)
      Files.move(Files.list(scratch).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get,
        lmIn.resolve("ref.parquet"))
      val q = LmStream.start(
        spark.readStream.schema("doc_id LONG, text STRING")
          .parquet(lmIn.toString).select("doc_id", "text"),
        lm, root.resolve("lmcp").toString)
      assert(q.awaitTermination(120000), "LM training did not finish")
    }

    // frozen boundaries: terciles of a 6-doc reference population
    // (2 memorized / 2 half-seen / 2 unseen), per the shared fold —
    // plus a synthetic all-tail language for the representative test
    val pop = Seq((1L, memorizedA), (2L, memorizedB), (3L, midC),
      (4L, midC + " extra"), (5L, gibber), (6L, ruled("qqvvk")))
      .toDF("doc_id", "text")
    val popScored = LmStream.score(spark, lm, pop)
      .select(col("doc_id"), lit("en").as("lang"), lit(10L).as("n_chars"),
        col("milli_bits_per_bigram").as("mbits"))
    val enBounds = CcnetStream.boundariesOf(popScored)
    // fixture sanity: the population must actually spread (memorized
    // strictly under b1's tercile, unseen strictly over b2's)
    locally {
      val b = enBounds.collect().head
      val (b1, b2) = (b.getLong(1), b.getLong(2))
      val scores = popScored.select("doc_id", "mbits").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(scores(1L) <= b1 && scores(5L) > b2,
        s"fixture vacuous: scores=$scores b1=$b1 b2=$b2")
    }
    val boundaries = enBounds
      .union(Seq(("lo", -1L, -1L)).toDF("lang", "b1", "b2"))

    def stageLang(name: String,
        rows: Seq[(Long, String, String)]): Unit = {
      val scratch = root.resolve(s"scratch_$name")
      rows.toDF("doc_id", "text", "lang").coalesce(1)
        .write.parquet(scratch.toString)
      Files.move(Files.list(scratch).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get,
        root.resolve("in").resolve(s"$name.parquet"))
    }
    def runRecipe(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, lang STRING")
        .parquet(root.resolve("in").toString)
      val q = CurateStream.start(stream, "text", "doc_id", out, cp, cfg,
        ruleGate = true,
        bucketGate = Some(CurateStream.BucketGate(lm, boundaries,
          "lang", Set("head", "middle"))),
        repetitionGate = true)
      assert(q.awaitTermination(120000), "recipe stream did not finish")
    }

    graft.operators.ObservedWarn.clearFired("curate_bucket_unjudgeable")
    // batch a: memorized en doc (head -> lands), gibberish en doc
    // (tail -> bucket-dropped), a 10-word doc (rule-dropped before
    // any scoring), an unknown-language doc (unjudgeable -> dropped
    // fail-closed AND counted)
    stageLang("a", Seq(
      (0L, memorizedA, "en"),
      (1L, gibber, "en"),
      (2L, shortDoc, "en"),
      (3L, ruled("unkn"), "zz")))
    runRecipe()
    val afterA = spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSet
    assert(afterA == Set(0L), s"batch A recipe gating wrong: $afterA")
    var firedUnjudgeable = graft.operators.ObservedWarn
      .lastFired("curate_bucket_unjudgeable")
    val dlB = System.nanoTime() + 10_000_000_000L
    while (firedUnjudgeable.isEmpty && System.nanoTime() < dlB) {
      Thread.sleep(50)
      firedUnjudgeable = graft.operators.ObservedWarn
        .lastFired("curate_bucket_unjudgeable")
    }
    assert(firedUnjudgeable.contains(1L),
      "the unknown-language drop must be observed, not silent")

    // batch b (restart): a cross-batch exact dup of landed d0; a
    // fresh memorized doc (lands); an exact-dup PAIR whose min-id
    // representative sits in the all-tail language — the gate runs
    // before representative pick, so d7 must land even though
    // bucket-dropped d6 is the group's min id (the q160/semantic-gate
    // invariant restated for the bucket gate)
    stageLang("b", Seq(
      (4L, memorizedA, "en"),
      (5L, memorizedB, "en"),
      (6L, memorizedC, "lo"),
      (7L, memorizedC, "en"),
      (8L, repText, "en")))   // structural-clean, repetition-tainted
    runRecipe()
    val landed = spark.read.parquet(out)
    val ids = landed.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 5L, 7L),
      s"composed recipe gating wrong across batches: $ids")

    // stream == the batch-composed q273 ∘ q272 gates over EVERYTHING
    // that ever arrived: GopherRules.passes, then score-and-bucket
    // with the same frozen LM + boundaries, then the batch curation
    // pipeline over the survivors
    val all = Seq(
      (0L, memorizedA, "en"), (1L, gibber, "en"), (2L, shortDoc, "en"),
      (3L, ruled("unkn"), "zz"), (4L, memorizedA, "en"),
      (5L, memorizedB, "en"), (6L, memorizedC, "lo"),
      (7L, memorizedC, "en"), (8L, repText, "en"))
      .toDF("doc_id", "text", "lang")
    val structPassed = all.filter(GopherRules.passes(col("text")))
    // fixture sanity: d8 passes the structural rules — only the
    // repetition gate may remove it
    assert(structPassed.filter(col("doc_id") === 8L).count() == 1,
      "fixture: the repetition doc must pass the structural rules")
    val rulesPassed = structPassed.join(
      GopherRules.repetitionFlags(
          structPassed.select(col("doc_id"), col("text")),
          "doc_id", "text")
        .filter(col("rep_pass")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val judged = rulesPassed
      .join(LmStream.score(spark, lm, rulesPassed.select("doc_id", "text"))
        .select(col("doc_id"), col("milli_bits_per_bigram").as("mbits")),
        Seq("doc_id"), "left")
      .join(boundaries, Seq("lang"), "left")
    val keptBatch = judged.filter(col("mbits").isNotNull &&
      col("b1").isNotNull &&
      when(col("mbits") <= col("b1"), "head")
        .when(col("mbits") <= col("b2"), "middle").otherwise("tail")
        .isin("head", "middle"))
    val composed = Curate(keptBatch.select(col("doc_id"), col("text")),
      "text", "doc_id", cfg)
    assert(landed.select("doc_id").as[Long].collect().toSet ==
      composed.select("doc_id").as[Long].collect().toSet,
      "stream recipe output diverged from the batch-composed gates")
    assert(landed.select("text").as[String].collect().toSet ==
      composed.select("text").as[String].collect().toSet)

    // gate-dropped content left no trace in the hash index: the same
    // text arriving later under an admissible language must land
    val gibberHash = Seq(gibber).toDF("t")
      .select(graft.functions.Portable.pmd5(col("t"))).head().getLong(0)
    assert(!spark.read.parquet(CurateStream.indexDir(out))
      .select(CurateStream.HashCol).as[Long].collect().toSet
      .contains(gibberHash),
      "a bucket-dropped row leaked into the hash index")
    spark.catalog.clearCache()
  }

  test("c4 + term gates: admission tracks C4Rules.pagePass AND " +
      "termPass exactly and never rewrites landed text " +
      "(admission-only contract)") {
    import graft.operators.C4Rules
    val (root, out, cp) = mkRoot("curate-c4")
    // the C4RulesSpec sentence fixture: each 5-word sentence ends in
    // exactly one content-defined boundary word
    val A = "the fast big data sort"
    val B = "key table window row join"
    val C = "slow small agg value filter"
    val E = "spark hash line part vector"
    val D = "batch stream merge dup group" // contains the blocked term
    val rows = Seq(
      (10L, Seq(A, B, C, E).mkString(" ")), // 4 kept sentences: passes
      (11L, Seq(A, B).mkString(" ")),       // 2 kept: thin page, gated
      (12L, "the fast big data"),           // no boundary word: gated
      (13L, Seq(A, B, C, D).mkString(" "))) // structurally fine, but
                                            // 'dup' is term-gated
    stage(root, "a", rows)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(root.resolve("in").toString)
    val q = CurateStream.start(stream, "text", "doc_id", out, cp,
      Curate.Config(minQuality = 0.0), c4Gate = true,
      termGate = Some(Seq("dup")))
    assert(q.awaitTermination(120000), "c4-gated stream did not finish")
    val landed = spark.read.parquet(out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // admission == the shared pagePass AND termPass statements, on
    // the ORIGINAL text
    val expected = rows.toDF("doc_id", "text")
      .filter(C4Rules.pagePass(col("text")) &&
        C4Rules.termPass(col("text"), Seq("dup")))
      .as[(Long, String)].collect().toMap
    assert(landed == expected, s"landed=$landed expected=$expected")
    assert(!landed.contains(13L) && landed.contains(10L))
    assert(landed(10L) == Seq(A, B, C, E).mkString(" "),
      "the gate must admit the document VERBATIM — line-rule rewrite " +
        "is SpanDedupStream/batch spanDedup territory, not the gate's")
  }

  test("batch N>1 dedup reads the hash index, never the corpus files") {
    val (root, out, cp) = mkRoot("curate-idx")

    stage(root, "a", Seq((0L, good), (4L, other)))
    runOnce(root, out, cp)

    // hide every landed DATA file — only the compact hash index stays
    // readable. If anything on the batch-2 dedup path touched the
    // corpus parquet, the cross-batch dup below would land again (the
    // pruned sink read would see an empty corpus).
    val hidden = root.resolve("hidden")
    Files.move(Paths.get(out, "batch_id=0"), hidden)

    stage(root, "b", Seq(
      (7L, good),                                // cross-batch exact dup
      (8L, third)))                              // fresh
    runOnce(root, out, cp)
    Files.move(hidden, Paths.get(out, "batch_id=0"))

    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 4L, 8L),
      s"dedup did not come from the hash index: $ids")
    // the index carries exactly the landed hashes, one row each
    val idx = spark.read.parquet(CurateStream.indexDir(out))
    assert(idx.select(CurateStream.HashCol).distinct().count() == 3)
    assert(idx.count() == 3, "index accumulated duplicate hash rows")
  }

  test("legacy flat sink: migrated in place, landed content never re-lands") {
    val (root, out, cp) = mkRoot("curate-legacy")

    // a sink written by the pre-index flat format: root-level parquet,
    // hash columns present, no batch_id partitions, no index table
    Seq((0L, good), (4L, other)).toDF("doc_id", "text")
      .withColumn(CurateStream.HashCol,
        graft.functions.Portable.pmd5(col("text")))
      .withColumn(CurateStream.HashCol2,
        graft.functions.Portable.pmd5Salted(1, col("text")))
      .coalesce(1).write.parquet(out)

    // first stream batch re-delivers legacy content plus one fresh doc
    stage(root, "a", Seq((7L, good), (8L, third)))
    runOnce(root, out, cp)

    val landed = spark.read.parquet(out)
    val ids = landed.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 4L, 8L), s"legacy content re-landed: $ids")
    val dupHashes = landed
      .groupBy(graft.functions.Portable.pmd5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupHashes == 0, "duplicate content after migration")
    // flat files are gone — the sink is uniformly batch_id-partitioned
    // (a mixed layout would poison every later partition-discovery read)
    val flats = Files.list(Paths.get(out)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(flats == 0, "legacy flat files must be rewritten, not mixed in")
    assert(Files.exists(Paths.get(out, s"${CurateStream.BatchCol}=-1")))
    // the bootstrapped index covers legacy AND new content, one row each
    val idx = spark.read.parquet(CurateStream.indexDir(out))
    assert(idx.count() == 3, "index must cover migrated + fresh hashes")
  }

  test("legacy flat sink without hash columns fails fast") {
    val (root, out, cp) = mkRoot("curate-legacy-bad")
    Seq((0L, good)).toDF("doc_id", "text").coalesce(1).write.parquet(out)
    stage(root, "a", Seq((8L, third)))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(root.resolve("in").toString)
    val q = CurateStream.start(stream, "text", "doc_id", out, cp, cfg)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("legacy flat format")),
      s"expected a migration message, got: ${messages(err)}")
    // and nothing landed — the batch must not proceed on an empty
    // anti-join set
    val landedIds = spark.read.parquet(out).columns.toSet
    assert(!landedIds.contains(CurateStream.BatchCol),
      "no batch may land into an unmigratable legacy sink")
  }

  test("ingest near-dup gate: cross-batch near dups drop via the sketch indexes") {
    val (root, out, cp) = mkRoot("curate-ndgate")
    def runGated(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(root.resolve("in").toString)
      val q = CurateStream.start(stream, "text", "doc_id", out, cp, cfg,
        nearDupAcrossBatches = true)
      assert(q.awaitTermination(120000), "gated stream did not finish")
    }

    stage(root, "a", Seq((0L, good), (4L, other)))
    runGated()
    // batch 2: a near dup of landed doc 0 (word appended -> shingle-set
    // Jaccard ~0.95, signature agreement far above the 0.7 gate) plus a
    // genuinely fresh doc. The compaction test proves the SAME near dup
    // lands when the flag is off.
    stage(root, "b", Seq((7L, good + " tonight"), (8L, third)))
    runGated()
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 4L, 8L), s"cross-batch near dup must drop at ingest: $ids")

    // sketch indexes carry exactly the landed docs: one signature row
    // and 4 band rows per doc, nothing for the gated arrival
    val sigN = spark.read.parquet(CurateStream.sigIndexDir(out)).count()
    val bandN = spark.read.parquet(CurateStream.bandIndexDir(out)).count()
    assert(sigN == 3, s"signature index rows: $sigN")
    assert(bandN == 12, s"band index rows: $bandN")

    // a later near dup of the OTHER landed doc is gated too (restart)
    stage(root, "c", Seq((9L, other + " indeed")))
    runGated()
    val after = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(after == Set(0L, 4L, 8L), s"later near dup must also drop: $after")
  }

  test("retention expires old batches; dedup memory survives; index compacts in place") {
    val (root, out, cp) = mkRoot("curate-retain")

    stage(root, "a", Seq((0L, good)))
    runOnce(root, out, cp)
    stage(root, "b", Seq((4L, other)))
    runOnce(root, out, cp)

    // index has accumulated one file per batch; compact it to one
    val idxDir = CurateStream.indexDir(out)
    val idxFilesBefore = Files.list(Paths.get(idxDir)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(idxFilesBefore >= 2, s"expected per-batch index files: $idxFilesBefore")
    val nOut = Maintenance.compactIndexInPlace(spark, idxDir)
    assert(nOut == 1, s"tiny index should compact to one file: $nOut")

    // expire batch 0: its content leaves the sink...
    assert(Maintenance.expireBatches(spark, out, keepFrom = 1L) == 1L)
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(4L), s"batch 0 should be expired: $ids")

    // ...but its hash still gates re-arrival (dedup memory stays), and
    // the stream keeps working against the compacted index
    stage(root, "c", Seq((7L, good), (8L, third)))
    runOnce(root, out, cp)
    val after = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(after == Set(4L, 8L), s"expired content must not re-land: $after")
  }

  test("hash, band and signature indexes all compact in place; the near-dup gate survives") {
    val (root, out, cp) = mkRoot("curate-3idx")
    def runGated(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(root.resolve("in").toString)
      val q = CurateStream.start(stream, "text", "doc_id", out, cp, cfg,
        nearDupAcrossBatches = true)
      assert(q.awaitTermination(120000), "gated stream did not finish")
    }
    def parquetFiles(dir: String): Int =
      Files.list(Paths.get(dir)).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))

    // two gated runs -> every index holds one file per batch
    stage(root, "a", Seq((0L, good), (4L, other)))
    runGated()
    stage(root, "b", Seq((5L, third)))
    runGated()
    val idxDirs = Seq(CurateStream.indexDir(out),
      CurateStream.bandIndexDir(out), CurateStream.sigIndexDir(out))
    idxDirs.foreach { d =>
      assert(parquetFiles(d) >= 2, s"expected per-batch files in $d")
    }
    val rowsBefore = idxDirs.map(d => spark.read.parquet(d).count())

    // the maintenance pass between stream runs compacts ALL THREE
    // one-file-per-batch indexes (they grow the same way the hash
    // index does), preserving every row
    idxDirs.foreach { d =>
      assert(Maintenance.compactIndexInPlace(spark, d) == 1L,
        s"tiny index should compact to one file: $d")
    }
    assert(idxDirs.map(d => spark.read.parquet(d).count()) == rowsBefore,
      "compaction must preserve index rows")

    // planted arrivals after compaction: a near dup of batch-a content
    // (band/sig indexes), an exact dup of batch-b content (hash
    // index), and one genuinely fresh doc — the gates must still hold
    stage(root, "c", Seq(
      (7L, good + " tonight"),   // near dup of landed doc 0
      (8L, third),               // exact dup of landed doc 5
      (9L, "a genuinely novel document about compacted sketch indexes surviving a rewrite of their file layout")))
    runGated()
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 4L, 5L, 9L),
      s"gates must survive three-index compaction: $ids")
  }

  test("periodic compaction collapses cross-batch NEAR dups in the sink") {
    val (root, out, cp) = mkRoot("curate-compact")

    // batch 1 lands two clean docs; batch 2 lands a NEAR dup of doc 0
    // (one word differs — below the exact-hash gate, above the
    // near-dup threshold) plus a fresh doc. Per-batch curation keeps
    // it: near-dup removal is within-batch only.
    stage(root, "a", Seq((0L, good), (4L, other)))
    runOnce(root, out, cp)
    stage(root, "b", Seq((7L, good.replace("warm", "cold")), (8L, third)))
    runOnce(root, out, cp)
    val landedIds = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(landedIds == Set(0L, 4L, 7L, 8L),
      s"cross-batch near dup should land before compaction: $landedIds")

    // the maintenance job re-curates the landed corpus as one frame
    val compacted = root.resolve("compacted").toString
    val nFiles = Maintenance.nearDupCompact(
      spark, out, compacted, "text", "doc_id", cfg)
    assert(nFiles == 1, s"tiny corpus should compact to one file: $nFiles")
    val ids = spark.read.parquet(compacted).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 4L, 8L), s"near dup survived compaction: $ids")

    // the hash index is untouched: the dropped near dup's exact hash
    // still gates a re-arrival of the same content at ingest
    val idx = spark.read.parquet(CurateStream.indexDir(out))
    assert(idx.count() == 4, "compaction must not rewrite the hash index")
  }
}
