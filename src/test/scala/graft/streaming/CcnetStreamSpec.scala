package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 23rd stream==batch twin: arriving documents scored against a
  * FROZEN reference LM and bucketed head/middle/tail at read time
  * must equal the batch fold over the union of everything that
  * arrived — with replayed epochs collapsing and short docs dropping
  * by the q262 rule. */
class CcnetStreamSpec extends SparkSpec {
  import spark.implicits._

  // the frozen reference corpus (CCNet trains on Wikipedia, not on
  // the stream): repeated phrases so trained bigrams score low bits
  private val reference = Seq(
    (1000L, "the quick brown fox jumps over the lazy dog again and again"),
    (1001L, "the quick brown fox naps while the lazy dog jumps around"),
    (1002L, "a slow green turtle walks under the old wooden bridge today"))

  // arriving docs: memorized-ish (head), mixed, gibberish (tail),
  // across two langs, plus a 1-token doc that must drop
  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", 44L),
    (2L, "zq xv qq zz vv kk pp ww", "en", 23L),
    (3L, "the lazy dog jumps while the fox naps", "en", 37L),
    (4L, "a slow green turtle walks today", "de", 31L),
    (5L, "solo", "en", 4L))
  private val batch2 = Seq(
    (6L, "under the old wooden bridge the turtle walks", "de", 44L),
    (7L, "xx yy zz aa bb cc dd", "de", 20L),
    (8L, "the quick brown fox naps again and again", "en", 40L))

  private def stage(root: Path, dir: String, name: String,
      rows: Seq[(Long, String, String, Long)]): Unit = {
    val scratch = root.resolve(s"scratch_$dir$name")
    rows.toDF("doc_id", "text", "lang", "n_chars").coalesce(1)
      .write.parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve(dir).resolve(s"$name.parquet"))
  }

  private def key(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    .toMap

  test("streamed scores + read-time terciles == the batch fold over " +
      "the union; replays collapse; short docs drop") {
    val root = Files.createTempDirectory("ccnet-stream")
    Seq("lmtrain", "in").foreach(d => Files.createDirectories(root.resolve(d)))
    val lm = root.resolve("lm").toString
    val out = root.resolve("out").toString

    // nothing committed yet -> empty read, correct schema
    assert(CcnetStream.scores(spark, out).columns.toSeq ==
      Seq("doc_id", "lang", "n_chars", "mbits"))
    assert(CcnetStream.scores(spark, out).count() == 0)

    // train the reference LM ONCE, then freeze it
    stage(root, "lmtrain", "ref",
      reference.map(r => (r._1, r._2, "xx", 0L)))
    val trainQ = LmStream.start(
      spark.readStream.schema("doc_id LONG, text STRING, lang STRING, n_chars LONG")
        .parquet(root.resolve("lmtrain").toString)
        .select("doc_id", "text"),
      lm, root.resolve("lmcp").toString)
    assert(trainQ.awaitTermination(120000), "LM training did not finish")

    def runOnce(): Unit = {
      val q = CcnetStream.start(
        spark.readStream
          .schema("doc_id LONG, text STRING, lang STRING, n_chars LONG")
          .parquet(root.resolve("in").toString),
        lm, out, root.resolve("cp").toString)
      assert(q.awaitTermination(120000), "ccnet stream did not finish")
    }

    stage(root, "in", "a", batch1)
    runOnce()
    stage(root, "in", "b", batch2) // restart between batches
    runOnce()

    // batch reference: score the UNION against the same frozen model,
    // bucket with the same shared fold
    val union = (batch1 ++ batch2).toDF("doc_id", "text", "lang", "n_chars")
    val batchForm = CcnetStream.bucketsOf(
      LmStream.score(spark, lm, union.select("doc_id", "text"))
        .select(col("doc_id"), col("milli_bits_per_bigram").as("mbits"))
        .join(union.select("doc_id", "lang", "n_chars"), Seq("doc_id")))
    CcnetStream.clearBoundsMemo()
    val hits0 = CcnetStream.boundsMemoHits
    val streamed = CcnetStream.buckets(spark, out)
    assert(key(streamed) == key(batchForm),
      "streamed buckets diverged from the batch fold over the union")
    assert(CcnetStream.boundsMemoHits == hits0,
      "the first read after a new batch must recompute boundaries")

    // a second read with no new batches replays the boundary fold
    // from the memo — and returns the identical table
    val reread = CcnetStream.buckets(spark, out)
    assert(CcnetStream.boundsMemoHits == hits0 + 1,
      "a re-read with an unchanged log must hit the boundary memo")
    assert(key(reread) == key(streamed),
      "the memoized boundary path diverged from the computed one")

    // the 1-token doc dropped (q262: no bigrams)
    val ids = CcnetStream.scores(spark, out)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == (batch1 ++ batch2).map(_._1).toSet - 5L,
      s"short doc must drop, others score: $ids")

    // an at-least-once replay of a committed epoch changes nothing —
    // and because it lands FILES, it must invalidate the memo (the
    // max batch id alone would not: a replay completing a partial
    // epoch keeps the id while changing the rows), then recompute to
    // the same boundaries
    val before = key(streamed)
    val hitsBeforeReplay = CcnetStream.boundsMemoHits
    CcnetStream.applyBatch(spark,
      batch2.toDF("doc_id", "text", "lang", "n_chars"), 1L, lm, out)
    assert(key(CcnetStream.buckets(spark, out)) == before,
      "a replayed epoch must change nothing")
    assert(CcnetStream.boundsMemoHits == hitsBeforeReplay,
      "a replay lands files: the memo must invalidate, not serve stale")
    CcnetStream.buckets(spark, out).collect()
    assert(CcnetStream.boundsMemoHits == hitsBeforeReplay + 1,
      "the post-replay recompute must re-arm the memo")

    // non-vacuity: two languages, and the en split actually spreads
    // across head and tail (gibberish scores high bits)
    val langs = streamed.select("lang").collect().map(_.getString(0)).toSet
    assert(langs == Set("en", "de"))
    val enBuckets = streamed.filter(col("lang") === "en")
      .select("bucket").collect().map(_.getString(0)).toSet
    assert(enBuckets.contains("head") && enBuckets.contains("tail"),
      s"fixture vacuous: en buckets = $enBuckets")
  }

  test("the histogram-support bound is ENFORCED: a milli-bits cell " +
      "outside the derived [0, 62000] range fails the fold fast " +
      "instead of running an unbounded window") {
    // an over-support fixture can only exist via out-of-range scores
    // (inside the range the support is provably <= 62001 cells/lang):
    // a caller feeding a different score scale must fail, not widen
    // the window partition silently
    val bad = Seq((1L, "en", 10L, CcnetStream.MaxMilliBits + 1),
      (2L, "en", 12L, 500L)).toDF("doc_id", "lang", "n_chars", "mbits")
    val ex = intercept[Throwable] {
      CcnetStream.bucketsOf(bad).collect()
    }
    val messages = Iterator.iterate(ex)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("histogram-support bound"),
      s"expected the support guard to fire, got: $messages")
    // negative cells fail the same way
    val neg = Seq((3L, "en", 10L, -1L))
      .toDF("doc_id", "lang", "n_chars", "mbits")
    val ex2 = intercept[Throwable] { CcnetStream.bucketsOf(neg).collect() }
    assert(Iterator.iterate(ex2)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      .contains("histogram-support bound"))
    // in-range cells pass untouched
    assert(CcnetStream.bucketsOf(
      Seq((4L, "en", 10L, 0L), (5L, "en", 9L, CcnetStream.MaxMilliBits))
        .toDF("doc_id", "lang", "n_chars", "mbits")).count() > 0)
  }
}
