package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dsir, DsirIndex}

/** The 26th stream==batch twin: the per-source mixture table under a
  * frozen DSIR model, maintained incrementally, must equal q280's
  * batch arithmetic over every prefix — same scoreFromModel +
  * resampleKeep + mixtureWeights statements. The three operational
  * properties are ALSO inherited uniformly in TwinConformanceSpec;
  * this spec pins the batch equality, compaction invariance and the
  * zero-kept-source semantics. */
class MixtureStreamSpec extends SparkSpec {
  import spark.implicits._

  // seed generation the frozen model trains on: target slice = docs
  // built from the 'en' vocabulary
  private def seed = (0 until 60).map { i =>
    val tgt = i % 3 == 0
    val text =
      if (tgt) (0 until 10).map(w => s"en$w common the of").mkString(" ")
      else (0 until 10).map(w => s"seedraw${i}w$w").mkString(" ")
    (900L + i, text, tgt)
  }.toDF("doc_id", "text", "is_target")

  // streamed docs: half target-vocabulary (high importance — kept),
  // half junk (low importance — mostly resampled away)
  private def rows(ids: Range): Seq[(Long, String, String, Long)] =
    ids.map { i =>
      val src = s"src${i % 3}"
      val text =
        if (i % 2 == 0) (0 until 10).map(w => s"en$w common the of").mkString(" ")
        else (0 until 10).map(w => s"junk${i}w$w").mkString(" ")
      (i.toLong, text, src, text.length.toLong)
    }

  private def toDf(rs: Seq[(Long, String, String, Long)]): DataFrame =
    rs.toDF("doc_id", "text", "source", "n_chars")

  private def stage(root: Path, name: String,
      rs: Seq[(Long, String, String, Long)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    toDf(rs).coalesce(1).write.parquet(scratch.toString)
    Files.move(Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get,
      root.resolve("in").resolve(s"$name.parquet"))
  }

  private def runOnce(root: Path, modelTable: String, out: String,
      cp: String): Unit = {
    val q = MixtureStream.start(
      spark.readStream
        .schema("doc_id LONG, text STRING, source STRING, n_chars LONG")
        .parquet(root.resolve("in").toString), modelTable, out, cp)
    assert(q.awaitTermination(120000), "mixture stream did not finish")
  }

  /** q280's batch statement with the same frozen model. */
  private def batchForm(modelTable: String,
      rs: Seq[(Long, String, String, Long)]): Seq[String] = {
    val docs = toDf(rs)
    val kept = Dsir.resampleKeep(
      DsirIndex.scoreFromModel(docs, "doc_id", "text",
        spark.table(modelTable)), "doc_id")
      .filter(col("keep"))
      .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
        Seq("doc_id"))
    val got = Dsir.mixtureWeights(kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars")))
      .collect().map(_.toString).toSeq.sorted
    spark.catalog.clearCache()
    got
  }

  private def streamed(out: String): Seq[String] =
    MixtureStream.mixture(spark, out)
      .collect().map(_.toString).toSeq.sorted

  test("mixture == batch q280 arithmetic under the frozen model after " +
      "every prefix; compaction preserves it; admission tracks drops; " +
      "empty before commit") {
    val root = Files.createTempDirectory("mixture-stream")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    DsirIndex.model(spark, "mixspec", seed, "doc_id", "text",
      col("is_target"))
    val modelTable = DsirIndex.tableName("mixspec")

    assert(MixtureStream.mixture(spark, out).count() == 0)

    val b1 = rows(0 until 30)
    val b2 = rows(30 until 60)
    stage(root, "a", b1)
    runOnce(root, modelTable, out, cp)
    assert(streamed(out) == batchForm(modelTable, b1),
      "prefix 1 diverged from the batch mixture")

    stage(root, "b", b2)
    runOnce(root, modelTable, out, cp) // restart
    val full = batchForm(modelTable, b1 ++ b2)
    assert(streamed(out) == full,
      "full stream diverged from the batch mixture")

    // the resampler actually dropped something (non-vacuous), and the
    // admission view reports it next to the kept mass
    val adm = MixtureStream.admission(spark, out)
      .agg(sum("n_docs"), sum("n_kept")).head()
    assert(adm.getLong(0) == 60L)
    assert(adm.getLong(1) < adm.getLong(0),
      "fixture vacuous — nothing was resampled away")
    assert(adm.getLong(1) > 0L, "fixture vacuous — nothing kept")

    assert(MixtureStream.compactLog(spark, out) >= 1L)
    assert(streamed(out) == full, "compaction moved the mixture")
    spark.catalog.clearCache()
  }
}
