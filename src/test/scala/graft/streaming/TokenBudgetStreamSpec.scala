package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Bpe

/** The 28th stream==batch twin: the streaming token-budget monitor
  * under a frozen BPE merge table must equal q286's batch arithmetic
  * (the SAME Bpe.tokenStats statement) over the union, after EVERY
  * prefix and across compaction. The three operational properties are
  * inherited uniformly in TwinConformanceSpec. */
class TokenBudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  // frozen model: trained on a seed corpus whose learned merges
  // actually compress the streamed words (shared 'aa'/'ab' subwords)
  private val seed = Seq((900L, "aaab aaab aaab ab ab ba"))
  private val b1 = Seq((1L, "aaab ba", "s0"), (2L, "ab ab aaab", "s1"))
  private val b2 = Seq((3L, "ba ba aaab ab", "s0"))

  private def toStream(rs: Seq[(Long, String, String)]): DataFrame =
    rs.toDF("doc_id", "text", "source")

  private def stage(root: Path, name: String,
      rs: Seq[(Long, String, String)]): Unit = {
    val scratch = root.resolve(s"scratch_$name")
    toStream(rs).coalesce(1).write.parquet(scratch.toString)
    Files.move(Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get,
      root.resolve("in").resolve(s"$name.parquet"))
  }

  private def batchForm(merges: Seq[(String, String)],
      rs: Seq[(Long, String, String)]): Seq[String] = {
    val got = TokenBudgetStream.summary(merges)(toStream(rs))
      .withColumn("tokens_per_word_bp",
        expr("n_tokens * 10000 div nullif(n_words, 0)"))
      .collect().map(_.toString).toSeq.sorted
    spark.catalog.clearCache()
    got
  }

  test("budget == batch tokenStats arithmetic after every prefix, " +
      "across compaction; the frozen table gates the start") {
    val root = Files.createTempDirectory("tokbudget-twin")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    val table = "tokbudget_twin_merges"

    val learned = Bpe.trainMerges(seed.toDF("doc_id", "text"), "text", 4)
    assert(learned.nonEmpty, "fixture: the seed corpus must learn merges")
    Bpe.saveMerges(spark, learned, table)
    val merges = Bpe.loadMerges(spark, table)
    // fixture non-vacuity: at least one streamed word must compress
    assert(merges.contains(("a", "a")) || merges.exists(_._1.length > 1),
      s"fixture vacuous: $merges")

    def runOnce(): Unit = {
      val q = TokenBudgetStream.start(
        spark.readStream.schema("doc_id LONG, text STRING, source STRING")
          .parquet(root.resolve("in").toString), table, out, cp)
      assert(q.awaitTermination(120000), "token-budget stream did not finish")
    }
    def streamed(): Seq[String] = {
      val got = TokenBudgetStream.budget(spark, out)
        .collect().map(_.toString).toSeq.sorted
      spark.catalog.clearCache()
      got
    }

    stage(root, "b1", b1)
    runOnce()
    assert(streamed() == batchForm(merges, b1), "prefix 1 diverged")

    stage(root, "b2", b2)
    runOnce()
    val afterB2 = streamed()
    assert(afterB2 == batchForm(merges, b1 ++ b2), "prefix 2 diverged")
    // the model is non-vacuous end to end: the seed's four merges
    // ((a,a),(a,b),(aa,ab),(b,a)) collapse every streamed s0 word
    // (aaab, ba, ab) to ONE token — tokens-per-word lands at 10000 bp
    val row = TokenBudgetStream.budget(spark, out)
      .filter(col("source") === "s0").collect().head
    assert(row.getAs[Long]("tokens_per_word_bp") == 10000L,
      s"expected full compression, got $row")

    assert(TokenBudgetStream.compactLog(spark, out) > 0)
    assert(streamed() == afterB2, "compaction moved the read")
  }

  test("a missing merge table fails at WIRING time (the model is " +
      "frozen per monitor, loaded once — never per batch)") {
    val root = Files.createTempDirectory("tokbudget-nomodel")
    Files.createDirectories(root.resolve("in"))
    stage(root, "b1", b1)
    val e = intercept[IllegalArgumentException] {
      TokenBudgetStream.start(
        spark.readStream.schema("doc_id LONG, text STRING, source STRING")
          .parquet(root.resolve("in").toString),
        "tokbudget_never_trained",
        root.resolve("out").toString, root.resolve("cp").toString)
    }
    assert(e.getMessage.contains("must be trained"),
      s"the error must name the contract: ${e.getMessage}")
  }

  test("a source whose only documents carry NULL text reads as an " +
      "UNKNOWN rate, never a divide-by-zero that bricks the monitor") {
    val root = Files.createTempDirectory("tokbudget-nulltext")
    Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    val table = "tokbudget_null_merges"
    Bpe.saveMerges(spark,
      Bpe.trainMerges(seed.toDF("doc_id", "text"), "text", 4), table)
    stage(root, "b1", Seq((1L, "aaab ba", "s0"),
      (2L, null.asInstanceOf[String], "snull")))
    val q = TokenBudgetStream.start(
      spark.readStream.schema("doc_id LONG, text STRING, source STRING")
        .parquet(root.resolve("in").toString), table, out, cp)
    assert(q.awaitTermination(120000))
    val rows = TokenBudgetStream.budget(spark, out).collect()
      .map(r => r.getString(0) -> r).toMap
    spark.catalog.clearCache()
    assert(rows("snull").getAs[Long]("n_docs") == 1L)
    assert(rows("snull").getAs[Long]("n_words") == 0L)
    assert(rows("snull").isNullAt(
      rows("snull").fieldIndex("tokens_per_word_bp")),
      "an unpriceable source must read NULL, not throw")
    assert(rows("s0").getAs[Long]("tokens_per_word_bp") == 10000L)
  }
}
