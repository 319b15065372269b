package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

/** Streaming KMV sketch vs its batch twin: after any prefix of the
  * stream, the k-th smallest distinct shingle hash (and the estimate
  * derived from it) must equal q69's batch computation over every
  * document seen — the order-statistic merge law (k-min of a union ==
  * k-min of unioned per-part k-mins), plus the usual replay and
  * compaction invariants. */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  /** Docs with per-source vocabularies: srcA ingests many distinct
    * shingles across batches (well past k), srcB stays BELOW k distinct
    * shingles forever (h_k must read NULL). */
  private def rows(ids: Range): Seq[(String, Long, String)] =
    ids.map { i =>
      if (i % 5 == 4) ("srcB", i.toLong, "tiny shared vocab here")
      else ("srcA", i.toLong, (0 until 10).map(w => s"w${i}t$w").mkString(" "))
    }

  private def toDf(rs: Seq[(String, Long, String)]): DataFrame =
    rs.toDF("source", "doc_id", "text")

  private def stage(root: Path, name: String,
      rs: Seq[(String, Long, String)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    toDf(rs).coalesce(1).write.parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve("in").resolve(s"$name.parquet"))
  }

  private def runOnce(root: Path, out: String, cp: String): Unit = {
    val stream = spark.readStream
      .schema("source STRING, doc_id LONG, text STRING")
      .parquet(root.resolve("in").toString)
    val q = KmvStream.start(stream, out, cp, K)
    assert(q.awaitTermination(120000), "kmv stream did not finish")
  }

  /** q69's sketch columns computed batch-side from first principles. */
  private def batchTwin(rs: Seq[(String, Long, String)])
      : Map[String, (Option[Long], Option[Double])] = {
    val hs = toDf(rs)
      .select(col("source"),
        explode(Portable.wordShingles(col("text"), 3)).as("sgl"))
      .select(col("source"),
        Portable.pmd5(concat(lit("kmv:"), col("sgl"))).as("h"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    hs.groupBy(_._1).map { case (src, rows) =>
      val sorted = rows.map(_._2).distinct.sorted
      val hk = if (sorted.length >= K) Some(sorted(K - 1)) else None
      src -> (hk, hk.map(h => (K - 1).toDouble * 1152921504606846976.0 / h))
    }
  }

  private def streamed(out: String): Map[String, (Option[Long], Option[Double])] = {
    val got = KmvStream.estimate(spark, out, K)
      .collect().map { r =>
        r.getString(0) -> (
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      }.toMap
    spark.catalog.clearCache()
    got
  }

  test("sketch == batch twin after each prefix; sub-k source reads NULL; replay and compaction preserve it") {
    val root = Files.createTempDirectory("kmv-stream")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString

    // before the first commit: empty sketch, 0-file compaction
    assert(KmvStream.estimate(spark, out, K).collect().isEmpty)
    assert(KmvStream.compactLog(spark, out, K) == 0L)

    val b1 = rows(0 until 40)
    val b2 = rows(40 until 80)

    stage(root, "a", b1)
    runOnce(root, out, cp)
    val t1 = batchTwin(b1)
    assert(streamed(out) == t1, "prefix 1 diverged")
    assert(t1("srcA")._1.isDefined, "fixture: srcA must exceed k distinct")
    assert(t1("srcB")._1.isEmpty, "fixture: srcB must stay below k distinct")

    stage(root, "b", b2)
    runOnce(root, out, cp)
    val t2 = batchTwin(b1 ++ b2)
    assert(streamed(out) == t2, "full stream diverged")
    // the estimate MOVED with new distinct mass (h_k strictly shrinks
    // or holds; with 36 fresh docs it must have shrunk)
    assert(t2("srcA")._1.get <= t1("srcA")._1.get,
      "k-th smallest cannot grow")

    // at-least-once replay: re-append batch 1's summary rows verbatim
    KmvStream.batchSummary(toDf(b1), K)
      .withColumn("__batch", lit(0L))
      .write.mode("append").parquet(KmvStream.logDir(out))
    assert(streamed(out) == t2, "replayed epoch changed the sketch")

    // compaction folds to one bounded generation; sketch unchanged;
    // post-compaction batches still land
    val removed = KmvStream.compactLog(spark, out, K)
    assert(removed >= 2, s"expected multiple log files compacted, got $removed")
    assert(streamed(out) == t2, "compaction changed the sketch")

    val b3 = rows(80 until 100)
    stage(root, "c", b3)
    runOnce(root, out, cp)
    assert(streamed(out) == batchTwin(b1 ++ b2 ++ b3),
      "post-compaction append diverged")
  }
}
