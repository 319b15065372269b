package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurateSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on a warm mat near the door of the house"

  test("curate chains quality gate, exact dedup, and near-dup removal") {
    val docs = Seq(
      (0L, good),
      (1L, good),                                   // exact dup -> dropped
      (2L, good.replace("warm", "cold")),           // near dup  -> dropped
      (3L, "the a the a the a"),                    // low quality (tiny, repetitive)
      (4L, "a completely different long document describing how the spark engine shuffles data between partitions during a wide transformation of the corpus")
    ).toDF("doc_id", "text")

    val out = Curate(docs, "text", "doc_id",
      Curate.Config(minQuality = 0.4, nearDupThreshold = 0.7))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L), "representative survives")
    assert(!kept.contains(1L), "exact duplicate removed")
    assert(!kept.contains(2L), "near duplicate removed")
    assert(!kept.contains(3L), "low-quality doc gated out")
    assert(kept.contains(4L), "distinct quality doc survives")
    assert(out.columns.toSeq == docs.columns.toSeq, "schema preserved")
  }

  test("decontamination stage drops eval near-dups, keeps clean docs") {
    val evalSuite = Seq(
      (9000L, "what year did the treaty of westphalia end the thirty years war in central europe and reshape the continent"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (0L, good),
      // near-dups the eval doc (one word differs) -> tainted
      (1L, "what year did the treaty of westphalia end the thirty years war in central europe and reshape the region"),
      (4L, "a completely different long document describing how the spark engine shuffles data between partitions during a wide transformation of the corpus")
    ).toDF("doc_id", "text")
    val cfg = Curate.Config(minQuality = 0.4, nearDupThreshold = 0.7)

    val without = Curate(docs, "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(without == Set(0L, 1L, 4L),
      s"without an eval suite the leaky doc survives: $without")

    val withEval = Curate(docs, "text", "doc_id", cfg, Some(evalSuite))
      .select("doc_id").as[Long].collect().toSet
    assert(withEval == Set(0L, 4L),
      s"decontamination must drop exactly the tainted doc: $withEval")
  }

  test("curate on the real corpus keeps a sane fraction") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = Curate(docs, "text", "doc_id", Curate.Config(minQuality = 0.4))
    val n = out.count()
    assert(n > 0 && n <= 500)
  }
}
