package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 24th stream==batch twin: the per-source Gopher rule audit
  * maintained incrementally must equal q273's structural arithmetic
  * AND q277's repetition arithmetic over every document seen — same
  * GopherRules statements, merged counts, read-derived pass_bp and
  * rep_pass_bp — across restarts, replays and compaction. (The
  * three operational properties are ALSO inherited uniformly in
  * TwinConformanceSpec — this spec pins the batch equality and the
  * compaction invariant the harness does not state.) */
class QualityAuditStreamSpec extends SparkSpec {
  import spark.implicits._

  // mixed fixture: rule-passing docs (34 words, 2 stops, long words),
  // a short doc (word-count violation), a stop-free doc, and a
  // low-diversity doc — every audit column non-vacuous
  private def passing(src: String, id: Long) = (id, src,
    // 9-char words keep the mean word length inside [4.4, 10]
    "the of " + (1 to 32).map(i => f"${src}w$id%02d$i%02d").mkString(" "))
  private def rows(ids: Range): Seq[(Long, String, String)] =
    ids.map { i =>
      val src = s"src${i % 2}"
      i % 5 match {
        case 0 => (i.toLong, src, "just seven small words here now ok")
        case 1 => (i.toLong, src,
          (1 to 34).map(j => f"stopless$i%02dw$j%02d").mkString(" "))
        case 2 => (i.toLong, src,
          "the of " + Seq.fill(32)("again").mkString(" "))
        case _ => passing(src, i.toLong)
      }
    }

  private def toDf(rs: Seq[(Long, String, String)]): DataFrame =
    rs.toDF("doc_id", "source", "text")

  private def stage(root: Path, name: String,
      rs: Seq[(Long, String, String)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    toDf(rs).coalesce(1).write.parquet(scratch.toString)
    Files.move(Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get,
      root.resolve("in").resolve(s"$name.parquet"))
  }

  private def runOnce(root: Path, out: String, cp: String): Unit = {
    val q = QualityAuditStream.start(
      spark.readStream.schema("doc_id LONG, source STRING, text STRING")
        .parquet(root.resolve("in").toString), out, cp)
    assert(q.awaitTermination(120000), "quality audit stream did not finish")
  }

  /** q273's + q277's + q283's arithmetic computed batch-side over a
    * frame — the shared summary plus the read-derived pass rates. */
  private def batchForm(rs: Seq[(Long, String, String)]) =
    QualityAuditStream.summary(toDf(rs))
      .withColumn("pass_bp", expr("n_pass * 10000 div n_docs"))
      .withColumn("rep_pass_bp", expr("n_rep_pass * 10000 div n_docs"))
      .withColumn("c4_pass_bp", expr("c4_pages * 10000 div n_docs"))

  private def key(df: DataFrame) = {
    val got = df.collect().map(_.toString).toSeq.sorted
    spark.catalog.clearCache()
    got
  }

  test("audit == batch q273+q277 arithmetic after every prefix; " +
      "compaction and post-compaction appends preserve it; empty " +
      "before commit") {
    val root = Files.createTempDirectory("qaudit-stream")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString

    // pre-commit: empty with the audit schema
    val empty = QualityAuditStream.audit(spark, out)
    assert(empty.columns.toSeq == Seq("source", "n_docs", "v_wordcount",
      "v_meanlen", "v_stopword", "v_diversity", "n_pass",
      "v_top2", "v_top3", "v_top4", "v_dup3", "n_rep_pass",
      "c4_sent", "c4_short_sent", "c4_unterminated", "c4_few_sent",
      "c4_pages", "c4_kept_sent",
      "pass_bp", "rep_pass_bp", "c4_pass_bp"))
    assert(empty.count() == 0)

    val b1 = rows(0 until 30)
    val b2 = rows(30 until 60)
    stage(root, "a", b1)
    runOnce(root, out, cp)
    assert(key(QualityAuditStream.audit(spark, out)) == key(batchForm(b1)),
      "prefix 1 diverged from the batch audit")

    stage(root, "b", b2)
    runOnce(root, out, cp) // restart
    val full = key(batchForm(b1 ++ b2))
    assert(key(QualityAuditStream.audit(spark, out)) == full,
      "full stream diverged from the batch audit")

    // every audit column non-vacuous on the fixture — structural,
    // repetition (the 'again'-flood doc violates all four repetition
    // rules; the stopless/short docs keep n_rep_pass below n_docs)
    // AND the C4 counts (synthetic words segment content-defined:
    // some sentences short, some docs unterminated or thin)
    val row = batchForm(b1 ++ b2).agg(sum("v_wordcount"), sum("v_meanlen"),
      sum("v_stopword"), sum("v_diversity"), sum("n_pass"),
      sum("v_top2"), sum("v_top3"), sum("v_top4"), sum("v_dup3"),
      sum("n_rep_pass"), sum("c4_sent"), sum("c4_short_sent"),
      sum("c4_unterminated"), sum("c4_few_sent")).head()
    (0 until 14).foreach(i => assert(row.getLong(i) > 0,
      s"fixture vacuous at audit column $i"))

    // compaction folds the log; the audit must not move, and later
    // batches still land on top of the snapshot
    assert(QualityAuditStream.compactLog(spark, out) >= 1L)
    assert(key(QualityAuditStream.audit(spark, out)) == full,
      "compaction moved the audit")
    val b3 = rows(60 until 75)
    stage(root, "c", b3)
    runOnce(root, out, cp)
    assert(key(QualityAuditStream.audit(spark, out)) ==
      key(batchForm(b1 ++ b2 ++ b3)),
      "post-compaction append diverged")
  }

  test("start() validates doc_id/source/text up front — a mis-wired " +
      "stream fails at wiring time, not inside foreachBatch") {
    val root = Files.createTempDirectory("qaudit-req")
    Files.createDirectories(root.resolve("in"))
    val miswired = spark.readStream.schema("doc_id LONG, body STRING")
      .parquet(root.resolve("in").toString)
    val e = intercept[IllegalArgumentException] {
      QualityAuditStream.start(miswired, root.resolve("out").toString,
        root.resolve("cp").toString)
    }
    assert(e.getMessage.contains("source"),
      s"the error must name the missing column: ${e.getMessage}")
  }
}
