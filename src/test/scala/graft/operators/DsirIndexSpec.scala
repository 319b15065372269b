package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The standing DSIR model table: built once per corpus fingerprint,
  * reused while the stamp matches, rebuilt when the corpus moves —
  * and scoring from it must equal [[Dsir.scoreSelf]]'s inline
  * training bit-for-bit (the q280 contract, pinned here at operator
  * grain so a drift shows up without the oracle round-trip). */
class DsirIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, salt: String) = (0 until n).map { i =>
    val tgt = i % 3 == 0
    val words =
      if (tgt) (0 until 10).map(w => s"en$w common the of").mkString(" ")
      else (0 until 10).map(w => s"${salt}raw${i}w$w").mkString(" ")
    (i.toLong, words, tgt)
  }.toDF("doc_id", "text", "is_target")

  test("build once, reuse on matching stamp, rebuild when the corpus " +
      "moves; scoring from the model == inline scoreSelf") {
    val docs = corpus(60, "a")
    val before = DsirIndex.buildCount
    val model = DsirIndex.model(spark, "dsirspec", docs, "doc_id",
      "text", col("is_target"))
    assert(DsirIndex.buildCount == before + 1, "first call must build")
    assert(model.count() > 0 && model.columns.toSeq ==
      Seq("bucket", "cr", "ct"))

    // same corpus -> reuse, no rebuild
    DsirIndex.model(spark, "dsirspec", docs, "doc_id", "text",
      col("is_target"))
    assert(DsirIndex.buildCount == before + 1,
      "matching stamp must reuse the standing table")

    // standing-model scoring == inline training, every column
    val fromModel = DsirIndex.scoreFromModel(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inline = Dsir.scoreSelf(docs, "doc_id", "text", col("is_target"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromModel == inline,
      "scoreFromModel must equal scoreSelf on the training corpus")
    spark.catalog.clearCache()

    // moved corpus -> stamp misses -> rebuild
    DsirIndex.model(spark, "dsirspec", corpus(61, "b"), "doc_id",
      "text", col("is_target"))
    assert(DsirIndex.buildCount == before + 2,
      "a moved corpus must rebuild the model")
    spark.catalog.clearCache()
  }

  test("a model bucket never seen in the target slice stores ct NULL " +
      "and scoring smooths it (never drops the bucket row)") {
    val docs = corpus(30, "c")
    val model = DsirIndex.model(spark, "dsirspec2", docs, "doc_id",
      "text", col("is_target"))
    assert(model.filter(col("ct").isNull).count() > 0,
      "raw-only buckets must keep their row with ct NULL")
    // every document scores — no inner-join row loss on null ct
    assert(DsirIndex.scoreFromModel(docs, "doc_id", "text", model)
      .count() == 30)
    spark.catalog.clearCache()
  }
}
