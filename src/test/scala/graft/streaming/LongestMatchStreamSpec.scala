package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{LongestMatch, SuffixIndex}

/** The 22nd stream==batch twin: arriving eval batches scored against
  * the standing suffix index must equal the batch operator over the
  * union of everything that arrived — with the index built ONCE and
  * never rebuilt per batch, and replayed epochs collapsing under the
  * result log's full-row distinct. */
class LongestMatchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs"),
    (102L, "aaaaaaaaaaaaaaaaaaaa"))
  private val batch1 = Seq(
    (1L, "a quick brown fox leaps over dogs"),
    (2L, "dozen boxes of liquor"),
    (3L, "&&&&"))
  private val batch2 = Seq(
    (4L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
    (5L, "my box with five"),
    (6L, "zzz unseen zzz"))
  private val cap = 13
  private val tag = "lmstream_spec"

  private def corpusDf = corpus.toDF("doc_id", "text")

  private def stage(root: Path, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    rows.toDF("eval_id", "text").coalesce(1).write.parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve("in").resolve(s"$name.parquet"))
  }

  private def runOnce(root: Path, out: String, cp: String): Unit = {
    val stream = spark.readStream
      .schema("eval_id LONG, text STRING")
      .parquet(root.resolve("in").toString)
    val q = LongestMatchStream.start(stream, "eval_id", "text",
      tag, corpusDf, "doc_id", "text", out, cp, cap)
    assert(q.awaitTermination(120000), "longest-match stream did not finish")
  }

  private def readSpans(out: String): Map[Long, (Long, Option[String])] =
    LongestMatchStream.read(spark, out, "eval_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2))))
      .toMap

  private def batchReference(
      evals: Seq[(Long, String)]): Map[Long, (Long, Option[String])] = {
    val got = LongestMatch.longestMatchFromRanks(
        SuffixIndex.ranks(spark, tag, corpusDf, "doc_id", "text"),
        corpusDf, "doc_id", "text",
        evals.toDF("eval_id", "text"), "eval_id", "text", cap)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2))))
      .toMap
    spark.catalog.clearCache()
    got
  }

  test("streamed per-batch spans == batch q266 over the union; the " +
      "index builds once; replays collapse") {
    val root = Files.createTempDirectory("lm-stream")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString

    // nothing committed yet -> empty read, correct schema
    val empty = LongestMatchStream.read(spark, out, "eval_id")
    assert(empty.columns.toSeq == Seq("eval_id", "match_len", "witness"))
    assert(empty.count() == 0)

    stage(root, "a", batch1)
    runOnce(root, out, cp)
    assert(readSpans(out) == batchReference(batch1),
      "batch-1 spans diverged from the batch operator")

    // the standing index's data files after run 1 ...
    def indexFiles(): Set[String] = {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED graft_sufidx_$tag")
        .collect().find(_.getString(0) == "Location").map(_.getString(1)).get
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith("part-"))
        .toSet
    }
    val builtOnce = indexFiles()

    // batch 2 in a fresh stream run (a restart): the union must now
    // equal the batch operator over everything that arrived
    stage(root, "b", batch2)
    runOnce(root, out, cp)
    assert(readSpans(out) == batchReference(batch1 ++ batch2),
      "union spans diverged from the batch operator after batch 2")

    // ... are byte-identical after run 2: scored, never rebuilt
    assert(indexFiles() == builtOnce,
      "the standing index must not rebuild per batch")

    // an at-least-once replay of a committed epoch appends
    // byte-identical rows that read()'s distinct collapses
    val before = readSpans(out)
    LongestMatchStream.applyBatch(spark, batch2.toDF("eval_id", "text"),
      1L, tag, corpusDf, "doc_id", "text", "eval_id", "text", out, cap)
    assert(readSpans(out) == before, "a replayed epoch must change nothing")

    // the fixture is not vacuous: hits, a cap saturation and a miss
    val spans = readSpans(out)
    assert(spans(3L) == (0L, None), "&&&& must miss")
    assert(spans(4L)._1 == cap.toLong, "the aaaa... doc must saturate the cap")
    assert(spans(1L)._1 > 0L, "batch-1 overlap must hit")
    spark.sql(s"DROP TABLE IF EXISTS graft_sufidx_$tag")
  }
}
